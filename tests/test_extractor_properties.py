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
