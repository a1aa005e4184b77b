"""Dual-engine verification: the fast regex tokenizer (production path)
must produce blocks identical to the stdlib html.parser engine over the
full fixture corpus (edge rows included) and adversarial snippets."""

from __future__ import annotations

import pytest

from mistral_ocr_spark.extractor.decode import decode_html
from mistral_ocr_spark.extractor.parser import parse_blocks
from mistral_ocr_spark.sources.fixtures import _make_page


def _sig(blocks):
    return [
        (b.kind, b.level, b.text, b.link_chars, b.chars, b.in_article, b.in_chrome)
        for b in blocks
    ]


def test_engines_agree_on_corpus():
    mismatches = []
    for i in range(4000):
        _url, html, _text, _lang = _make_page(i)
        if html is None or html[:5] == b"%PDF-":
            continue
        txt, _enc = decode_html(html)
        if _sig(parse_blocks(txt, "fast")) != _sig(parse_blocks(txt, "stdlib")):
            mismatches.append(i)
    assert not mismatches, f"engines disagree on rows {mismatches[:10]}"


@pytest.mark.parametrize(
    "snippet",
    [
        "<p>a < b and c > d</p>",
        "<!-- <p>hidden</p> --><p>after comment content</p>",
        '<script>var x = "<p>not text</p>";</script><p>real</p>',
        '<a href="/x" title="a > b">link</a><p>content</p>',
        "<P>UPPER</P><ARTICLE><P>mixed case</P></ARTICLE>",
        "<![CDATA[ junk ]]><p>after cdata</p>",
        "<?php echo '<p>x</p>'; ?><p>after pi</p>",
        "<div><p>unclosed everywhere",
        "<style>p:before{content:'<fake>'}</style><p>styled</p>",
        "&amp; &lt;tag&gt; &#65; &#x42; stand-alone & ampersand",
    ],
)
def test_engines_agree_on_adversarial(snippet):
    assert _sig(parse_blocks(snippet, "fast")) == _sig(parse_blocks(snippet, "stdlib"))
