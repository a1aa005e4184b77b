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
        # round 2: nested templates / deeper malformation / entity storms
        "<div><div><div><p>deeply <b>nested</b> content</p></div></div></div>",
        "<table><tr><td><p>cell para</p></td><td><ul><li>item</li></ul></td></tr></table>",
        "<p>one</p><p>two<p>three</p>",  # implicit-close chain
        "</p></div></article><p>starts with stray closers</p>",
        '<a href=/unquoted class=x>unquoted attrs</a><p>after</p>',
        "<p>&amp;&amp;&amp; &lt;&lt;&gt;&gt; &#8212;&#x2014; entity storm &quot;quoted&quot;</p>",
        "<p>emoji \U0001f600 and combining é accents</p>",
        "<P CLASS='X'><SPAN>upper attrs</SPAN> tail</P>",
        "<template><p>template content</p></template><p>real content</p>",
        "<noscript><p>noscript body</p></noscript><p>visible</p>",
        "<p>a<br>b<br/>c</p><hr><p>after rule</p>",
        "<article><header><h1>inner chrome in article</h1></header><p>body</p></article>",
        "<div title='<p>tag soup in attr</p>'>attr soup</div><p>next</p>",
        "<p>trailing unterminated entity &am",
    ],
)
def test_engines_agree_on_adversarial(snippet):
    assert _sig(parse_blocks(snippet, "fast")) == _sig(parse_blocks(snippet, "stdlib"))


def test_engines_agree_on_hard_quality_corpus():
    """The round-2 hard fixture (long link-dense boilerplate, short leads)
    must also tokenize identically under both engines."""
    from test_quality_eval import _hard_page

    for i in range(500):
        html, _c, _b = _hard_page(i)
        txt, _enc = decode_html(html)
        assert _sig(parse_blocks(txt, "fast")) == _sig(parse_blocks(txt, "stdlib")), i
