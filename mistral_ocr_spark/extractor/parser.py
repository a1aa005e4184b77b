"""HTML → flat block sequence, via stdlib ``html.parser`` only.

This sandbox has no lxml/bs4 — and the north rule asks for a from-scratch
DOM-heuristic extractor anyway. The tokenizer segments the page into
*text blocks* at block-level tag boundaries and annotates each block with
the features Boilerpipe/Readability-style classification needs:

- ``words``       — whitespace-token count of the normalized text
- ``link_chars``  — characters contributed from inside ``<a>`` elements
- ``chars``       — total text characters
- ``kind``        — heading / paragraph / list_item / table / title / pre
- ``in_article``  — inside <article>/<main> (structural content hint)
- ``in_chrome``   — inside <nav>/<header>/<footer>/<aside> (chrome hint)

Whitespace policy (part of the byte-identity contract): within a block all
whitespace runs collapse to a single ASCII space and the block is stripped.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

_WS_RE = re.compile(r"\s+")

# Tags whose open OR close ends the current block.
_BLOCK_TAGS = frozenset(
    "address article aside blockquote body br caption dd div dl dt fieldset "
    "figcaption figure footer form h1 h2 h3 h4 h5 h6 head header hr html li "
    "main nav ol option p pre section select table tbody td tfoot th thead "
    "title tr ul".split()
)

# Content inside these is dropped entirely.
_IGNORE_TAGS = frozenset("script style noscript svg template iframe".split())

# Chrome containers: structural boilerplate hint.
_CHROME_TAGS = frozenset("nav header footer aside".split())

_ARTICLE_TAGS = frozenset(("article", "main"))

_HEADING_LEVEL = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}

# Self-closing/void elements that must not be pushed on the tag stack.
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


@dataclass
class Block:
    """One contiguous text block with classification features."""

    kind: str = "paragraph"  # heading|paragraph|list_item|table|title|pre
    level: int = 0  # heading level (1-6) when kind == heading
    parts: list[str] = field(default_factory=list)
    link_chars: int = 0
    chars: int = 0
    in_article: bool = False
    in_chrome: bool = False
    is_content: bool = False  # set by the classifier

    _text: str | None = None

    @property
    def text(self) -> str:
        if self._text is None:
            self._text = _WS_RE.sub(" ", "".join(self.parts)).strip()
        return self._text

    @property
    def words(self) -> int:
        return len(self.text.split()) if self.text else 0

    @property
    def link_density(self) -> float:
        return self.link_chars / self.chars if self.chars else 0.0


class _BlockParser(HTMLParser):
    """Streaming tokenizer: emits Blocks at block-tag boundaries."""

    def __init__(self) -> None:
        # convert_charrefs=True resolves &amp; &#x27; … inside data —
        # required so escaped fixture text round-trips byte-identically.
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._cur = Block()
        self._ignore_depth = 0
        self._a_depth = 0
        self._chrome_depth = 0
        self._article_depth = 0
        # Kind context stacks — nearest enclosing semantic wins.
        self._kind_stack: list[tuple[str, int]] = []

    # -- block lifecycle ---------------------------------------------------

    def _flush(self) -> None:
        if self._cur.text:
            self.blocks.append(self._cur)
        self._cur = self._fresh_block()

    def _fresh_block(self) -> Block:
        b = Block()
        if self._kind_stack:
            b.kind, b.level = self._kind_stack[-1]
        b.in_article = self._article_depth > 0
        b.in_chrome = self._chrome_depth > 0
        return b

    # -- parser callbacks ----------------------------------------------------

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _IGNORE_TAGS:
            self._ignore_depth += 1
            return
        if self._ignore_depth:
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _CHROME_TAGS:
            self._chrome_depth += 1
        elif tag in _ARTICLE_TAGS:
            self._article_depth += 1
        elif tag == "a":
            self._a_depth += 1

        kind = None
        if tag in _HEADING_LEVEL:
            kind = ("heading", _HEADING_LEVEL[tag])
        elif tag == "li":
            kind = ("list_item", 0)
        elif tag in ("td", "th", "tr", "table", "caption"):
            kind = ("table", 0)
        elif tag == "title":
            kind = ("title", 0)
        elif tag == "pre":
            kind = ("pre", 0)
        elif tag in ("p", "blockquote"):
            kind = ("paragraph", 0)
        if kind is not None and tag not in _VOID_TAGS:
            self._kind_stack.append(kind)
            self._cur = self._fresh_block()

    def handle_endtag(self, tag: str) -> None:
        if tag in _IGNORE_TAGS:
            self._ignore_depth = max(0, self._ignore_depth - 1)
            return
        if self._ignore_depth:
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _CHROME_TAGS:
            self._chrome_depth = max(0, self._chrome_depth - 1)
        elif tag in _ARTICLE_TAGS:
            self._article_depth = max(0, self._article_depth - 1)
        elif tag == "a":
            self._a_depth = max(0, self._a_depth - 1)

        if tag in _HEADING_LEVEL or tag in (
            "li",
            "td",
            "th",
            "tr",
            "table",
            "caption",
            "title",
            "pre",
            "p",
            "blockquote",
        ):
            # Pop the innermost matching kind frame (malformed nesting safe).
            for i in range(len(self._kind_stack) - 1, -1, -1):
                self._kind_stack.pop()
                break
            self._cur = self._fresh_block()

    def handle_data(self, data: str) -> None:
        if self._ignore_depth or not data:
            return
        self._cur.parts.append(data)
        n = len(data)
        self._cur.chars += n
        if self._a_depth:
            self._cur.link_chars += n

    def close(self) -> None:  # flush trailing text
        super().close()
        self._flush()


def parse_blocks(html_text: str) -> list[Block]:
    """Segment an HTML document into annotated text blocks.

    Tolerant of malformed nesting — ``html.parser`` never raises on bad
    markup, and the kind-stack pops defensively.
    """
    p = _BlockParser()
    p.feed(html_text)
    p.close()
    return p.blocks
