"""Deterministic byte→str decode policy.

The reference base64-encodes bytes into data-URLs and utf-8-decodes
downloads (/root/reference/src/mistral_ocr/simple_client.py:713-718,500).
Here the policy is explicit and pinned, because byte-identical extracted
text per url (north rule) requires a total, deterministic decode order:

1. UTF-8 strict.
2. A ``charset=`` declaration found in the first 2048 bytes (whitelisted
   codecs only, tried strict).
3. cp1252 with ``errors="replace"`` (total function — never fails; cp1252
   is the conventional web fallback superset of latin-1).
"""

from __future__ import annotations

import re

_CHARSET_RE = re.compile(
    rb"""charset\s*=\s*["']?\s*([A-Za-z0-9_.:\-]+)""", re.IGNORECASE
)

# Whitelist keeps the policy closed under version upgrades: an unknown
# declared charset falls through to the cp1252 fallback instead of
# depending on the Python codec registry of the running interpreter.
_CODEC_WHITELIST = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "ascii": "ascii",
    "us-ascii": "ascii",
    "iso-8859-1": "latin-1",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}


def decode_html(raw: bytes) -> tuple[str, str]:
    """Decode page bytes. Returns ``(text, encoding_used)``.

    Total and deterministic: identical bytes always yield identical text.
    """
    try:
        return raw.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        pass

    m = _CHARSET_RE.search(raw[:2048])
    if m:
        declared = m.group(1).decode("ascii", "replace").lower()
        codec = _CODEC_WHITELIST.get(declared)
        if codec and codec != "utf-8":
            try:
                return raw.decode(codec), codec
            except (UnicodeDecodeError, LookupError):
                pass

    return raw.decode("cp1252", errors="replace"), "cp1252:replace"
