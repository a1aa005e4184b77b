"""Minimal PDF text-object extractor (magic-byte dispatched).

The reference routes PDFs to the remote OCR endpoint by mime sniffing on
extension (/root/reference/src/mistral_ocr/simple_client.py:712-718). In
this engine the dispatch is on content (``%PDF-`` magic bytes). There are
no PDF libraries in the sandbox, so this implements the narrow, layout-lite
subset the synthetic fixtures exercise: uncompressed text showing operators
``(string) Tj`` and ``[(s1) (s2)] TJ`` inside ``BT … ET`` text objects.
Anything without extractable text objects is surfaced as
``error_class='unsupported_pdf'`` (per-row error capture, the analog of the
reference's error_files side channel, simple_client.py:630-664).
"""

from __future__ import annotations

import re
import zlib

PDF_MAGIC = b"%PDF-"

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)

_BT_ET_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
_TJ_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)\s*Tj|\[(?:[^\]\\]|\\.)*\]\s*TJ", re.DOTALL)
_STR_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)", re.DOTALL)

_ESCAPES = {
    b"\\n": b"\n",
    b"\\r": b"\r",
    b"\\t": b"\t",
    b"\\b": b"\b",
    b"\\f": b"\f",
    b"\\(": b"(",
    b"\\)": b")",
    b"\\\\": b"\\",
}
_ESC_RE = re.compile(rb"\\[nrtbf()\\]|\\[0-7]{1,3}")


def _unescape(s: bytes) -> bytes:
    def sub(m: re.Match[bytes]) -> bytes:
        g = m.group(0)
        if g in _ESCAPES:
            return _ESCAPES[g]
        return bytes([int(g[1:], 8) & 0xFF])  # octal escape

    return _ESC_RE.sub(sub, s)


def _inflate_streams(raw: bytes) -> bytes:
    """Append zlib-inflated content streams (FlateDecode — the standard
    PDF content-stream filter) so BT/ET extraction sees compressed text
    objects too. Non-zlib streams (images, other filters) are skipped.
    Deterministic: streams are concatenated in document order."""
    inflated: list[bytes] = []
    for m in _STREAM_RE.finditer(raw):
        body = m.group(1)
        if body[:1] != b"\x78":  # zlib magic (0x78 = deflate, 32K window)
            continue
        try:
            # decompressobj tolerates trailing \r\n before `endstream`
            inflated.append(zlib.decompressobj().decompress(body))
        except zlib.error:
            continue
    return raw + b"\n" + b"\n".join(inflated) if inflated else raw


def extract_pdf_text(raw: bytes) -> list[str] | None:
    """Extract text-object strings; one output string per BT/ET object.

    Handles plain and FlateDecode-compressed content streams. Returns None
    when no text objects are found (→ unsupported_pdf).
    """
    raw = _inflate_streams(raw)
    paragraphs: list[str] = []
    for obj in _BT_ET_RE.finditer(raw):
        pieces: list[str] = []
        for show in _TJ_RE.finditer(obj.group(1)):
            for lit in _STR_RE.finditer(show.group(0)):
                body = _unescape(lit.group(0)[1:-1])
                pieces.append(body.decode("latin-1"))
        if pieces:
            paragraphs.append("".join(pieces))
    return paragraphs or None
