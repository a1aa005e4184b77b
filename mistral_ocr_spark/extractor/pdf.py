"""From-scratch PDF text extractor (magic-byte dispatched).

The reference routes PDFs to the remote OCR endpoint by mime sniffing on
extension (/root/reference/src/mistral_ocr/simple_client.py:712-718). In
this engine the dispatch is on content (``%PDF-`` magic bytes). There are
no PDF libraries in the sandbox, so the content-stream text model is
implemented directly (PDF 32000-1 §9.4 text objects):

- ``BT … ET`` text objects, one output paragraph per object;
- show operators ``Tj``, ``' ``, ``" `` and array form ``[…] TJ`` with
  kerning: a TJ number ≤ -180 (thousandths of an em) renders as a space —
  the standard gap-to-space heuristic;
- line positioning ``Td``/``TD``/``T*``/``Tm`` start a new line within the
  object (newline-joined in the output);
- literal strings with all escape forms (named, octal, line continuation)
  and ``<hex>`` strings;
- ``FlateDecode``-compressed content streams (inflated before scanning).

Anything without extractable text objects is surfaced as
``error_class='unsupported_pdf'`` (per-row error capture, the analog of the
reference's error_files side channel, simple_client.py:630-664). Out of
scope (documented, not silently wrong): nested unescaped parens in literal
strings, non-Flate filters, CID/Type0 font decoding (bytes decode latin-1).
"""

from __future__ import annotations

import re
import zlib

PDF_MAGIC = b"%PDF-"

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)

_BT_ET_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)

# Content-stream tokens we interpret inside a text object, in source order.
# Text-state operators (Tc Tw Tz TL Ts Tr) are tokenized even though their
# values are ignored: their numeric operands must be consumed, or a
# following `[...] TJ` would read them as kern gaps (ADVICE r2 — e.g.
# `-250 Tw [(a)(b)] TJ` injected a spurious leading space). `[` is also
# tokenized so TJ only ever treats numbers lexically inside its array as
# kern values, which defends against ANY unhandled numeric-operand
# operator, not just the enumerated ones.
_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"  # literal string
    rb"|<[0-9A-Fa-f\s]*>"  # hex string
    rb"|-?\d+(?:\.\d+)?"  # numeric operand
    rb"|T\*|Td|TD|Tj|TJ|Tm|Tf"  # operators of interest
    rb"|Tc|Tw|Tz|TL|Ts|Tr"  # text-state operators (operand sinks)
    rb"|\["  # TJ array open — kern-number scope marker
    rb"|'|\"",
    re.DOTALL,
)

# TJ kern gap (thousandths of em) at/below which a space is rendered.
_KERN_SPACE = -180.0

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
_ESC_RE = re.compile(rb"\\\r?\n|\\[nrtbf()\\]|\\[0-7]{1,3}")


def _unescape(s: bytes) -> bytes:
    def sub(m: re.Match[bytes]) -> bytes:
        g = m.group(0)
        if g in _ESCAPES:
            return _ESCAPES[g]
        if g[:1] == b"\\" and g[1:2] in (b"\r", b"\n"):
            return b""  # escaped line continuation
        return bytes([int(g[1:], 8) & 0xFF])  # octal escape

    return _ESC_RE.sub(sub, s)


def _decode_hex(tok: bytes) -> bytes:
    hx = re.sub(rb"\s", b"", tok[1:-1])
    if len(hx) % 2:
        hx += b"0"  # PDF: odd final digit implies trailing 0
    return bytes.fromhex(hx.decode("ascii"))


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


def _render_text_object(body: bytes) -> str:
    """Interpret one BT…ET body: show operators append to the current line,
    positioning operators start new lines, TJ kern gaps become spaces."""
    lines: list[str] = []
    cur: list[str] = []
    pending: list[tuple[str, object]] = []  # operand stack since last operator

    def newline() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

    for m in _TOKEN_RE.finditer(body):
        tok = m.group(0)
        if tok[:1] == b"(":
            pending.append(("str", _unescape(tok[1:-1]).decode("latin-1")))
        elif tok[:1] == b"<":
            pending.append(("str", _decode_hex(tok).decode("latin-1")))
        elif tok in (b"Td", b"TD", b"T*", b"Tm"):
            newline()
            pending.clear()
        elif tok in (b"Tf", b"Tc", b"Tw", b"Tz", b"TL", b"Ts", b"Tr"):
            pending.clear()  # font / text-state operands — values ignored
        elif tok == b"[":
            # TJ array opens: anything pending is operands of some earlier
            # operator we don't render — never kern values for this TJ
            pending.clear()
        elif tok == b"Tj":
            if pending and pending[-1][0] == "str":
                cur.append(pending[-1][1])  # type: ignore[arg-type]
            pending.clear()
        elif tok in (b"'", b'"'):
            # move-to-next-line-and-show (operands before the string for ")
            newline()
            strs = [v for k, v in pending if k == "str"]
            if strs:
                cur.append(strs[-1])  # type: ignore[arg-type]
            pending.clear()
        elif tok == b"TJ":
            for kind, v in pending:
                if kind == "str":
                    cur.append(v)  # type: ignore[arg-type]
                elif kind == "num" and float(v) <= _KERN_SPACE:  # type: ignore[arg-type]
                    cur.append(" ")
            pending.clear()
        else:  # numeric operand
            pending.append(("num", float(tok)))
    newline()
    return "\n".join(lines)


def extract_pdf_text(raw: bytes) -> list[str] | None:
    """Extract text-object content; one output string per BT/ET object
    (lines within an object newline-joined).

    Handles plain and FlateDecode-compressed content streams. Returns None
    when no text objects are found (→ unsupported_pdf).
    """
    raw = _inflate_streams(raw)
    paragraphs: list[str] = []
    for obj in _BT_ET_RE.finditer(raw):
        text = _render_text_object(obj.group(1))
        if text:
            paragraphs.append(text)
    return paragraphs or None
