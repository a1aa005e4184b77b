"""Property-based extractor tests (hypothesis): the extractor is total,
deterministic, and structurally consistent on arbitrary byte soup — the
robustness the graceful-error tests of the reference assert
(/root/reference/tests/integration/test_cli_integration.py:271-286:
errors handled gracefully, no tracebacks)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mistral_ocr_spark.extractor import extract

_tagish = st.sampled_from(
    [
        "<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>", "<li>",
        "<article>", "</article>", "<nav>", "</nav>", "<h1>", "</h1>",
        "<!-- c -->", "<script>", "</script>", "&amp;", "&#65;", "<", ">", "&",
    ]
)
_html_soup = st.lists(_tagish | st.text(max_size=40), max_size=60).map("".join)


@given(_html_soup)
@settings(max_examples=300, deadline=None)
def test_never_raises_and_deterministic(soup):
    raw = soup.encode("utf-8")
    r1 = extract(raw)
    r2 = extract(raw)
    assert r1 == r2  # pure function
    assert (r1.text is None) == (r1.error_class is not None) or r1.text is not None


@given(st.binary(max_size=2000))
@settings(max_examples=300, deadline=None)
def test_total_on_arbitrary_bytes(raw):
    r = extract(raw)
    # spans always index into text correctly
    if r.text is not None:
        for s, e, kind in r.spans:
            assert 0 <= s <= e <= len(r.text)
            assert kind in {"heading", "paragraph", "list_item", "table"}
        # block separator invariant: spans cover text minus "\n\n" gaps
        joined = "\n\n".join(r.text[s:e] for s, e, _ in r.spans)
        assert joined == r.text
    else:
        assert r.error_class in {"empty", "no_content", "unsupported_pdf", "decode_error"}


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_whitespace_policy_idempotent(text):
    raw = f"<article><p>{text.replace('<','').replace('&','')}</p></article>".encode()
    r = extract(raw)
    if r.text is not None:
        # normalized text contains no whitespace runs and no edge whitespace
        assert "  " not in r.text.replace("\n\n", " ")
        assert r.text == r.text.strip()


# --- ToUnicode CMap parser properties (extractor 1.4.0) ---------------------

_codes_1b = st.integers(min_value=0, max_value=0xFF)
_codes_2b = st.integers(min_value=0, max_value=0xFFFF)
_uni = st.integers(min_value=0x20, max_value=0xD700)  # BMP, skip surrogates


@st.composite
def _cmap_spec(draw):
    """(width, mapping, cmap_bytes): random bfchar entries + bfranges with
    both destination forms, plus the Python-dict reference they imply."""
    width = draw(st.sampled_from([1, 2]))
    codes = _codes_1b if width == 1 else _codes_2b
    hexw = width * 2
    mapping: dict[int, str] = {}
    parts = [f"1 begincodespacerange\n<{'0'*hexw}> <{'f'*hexw}>\nendcodespacerange\n".encode()]

    ranges = draw(st.lists(st.tuples(codes, st.integers(1, 20), _uni), max_size=3))
    if ranges:
        body = []
        for lo, span, dst in ranges:
            hi = min(lo + span - 1, (1 << (8 * width)) - 1)
            body.append(f"<{lo:0{hexw}x}> <{hi:0{hexw}x}> <{dst:04x}>")
            for i in range(hi - lo + 1):
                mapping[lo + i] = chr(dst + i)
        parts.append(
            (f"{len(body)} beginbfrange\n" + "\n".join(body) + "\nendbfrange\n").encode()
        )
    chars = draw(st.lists(st.tuples(codes, _uni), max_size=8))
    if chars:
        body = [f"<{c:0{hexw}x}> <{u:04x}>" for c, u in chars]
        parts.append(
            (f"{len(body)} beginbfchar\n" + "\n".join(body) + "\nendbfchar\n").encode()
        )
        for c, u in chars:
            mapping[c] = chr(u)  # bfchar parsed after bfrange -> wins ties
    return width, mapping, b"".join(parts)


@given(_cmap_spec(), st.lists(st.integers(0, 0xFFFF), max_size=30))
@settings(max_examples=120, deadline=None)
def test_tounicode_decode_matches_reference(spec, raw_codes):
    """parse_tounicode + _decode_string must agree with a plain Python dict
    interpretation of the same CMap on arbitrary code sequences, including
    the unmapped-code fallbacks."""
    from mistral_ocr_spark.extractor.pdf import _decode_string, parse_tounicode

    width, mapping, cmap = spec
    parsed = parse_tounicode(cmap)
    assert parsed[0] == width
    codes = [c & ((1 << (8 * width)) - 1) for c in raw_codes]
    raw = b"".join(c.to_bytes(width, "big") for c in codes)
    got = _decode_string(raw, parsed)
    want = "".join(
        mapping.get(
            c,
            c.to_bytes(1, "big").decode("latin-1") if width == 1 else chr(c),
        )
        for c in codes
    )
    assert got == want


@given(st.binary(max_size=400))
@settings(max_examples=80, deadline=None)
def test_tounicode_parser_total_on_garbage(junk):
    """Arbitrary bytes as a CMap stream must never raise — damaged PDFs are
    routine in crawl data; the parser yields a (width, partial-map) pair."""
    from mistral_ocr_spark.extractor.pdf import parse_tounicode

    width, cmap = parse_tounicode(junk)
    assert width in (1, 2) or width >= 0
    assert isinstance(cmap, dict)
