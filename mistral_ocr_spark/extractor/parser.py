"""HTML → flat block sequence, from scratch (no lxml/bs4 in this sandbox —
and the north rule asks for a from-scratch DOM-heuristic extractor anyway).

The tokenizer segments the page into *text blocks* at block-level tag
boundaries and annotates each block with the features Boilerpipe/
Readability-style classification needs:

- ``words``       — whitespace-token count of the normalized text
- ``link_chars``  — characters contributed from inside ``<a>`` elements
- ``chars``       — total text characters
- ``kind``        — heading / paragraph / list_item / table / title / pre
- ``in_article``  — inside <article>/<main> (structural content hint)
- ``in_chrome``   — inside <nav>/<header>/<footer>/<aside> (chrome hint)

Two tokenizer engines feed the same block builder:

- ``fast`` (default, the production path): a single compiled-regex scan.
  ~4× the stdlib engine — this sits in the innermost loop of the whole
  pipeline, so the constant matters at 10^12 documents.
- ``stdlib``: ``html.parser.HTMLParser`` — the battle-tested cross-check;
  the dual-verification test asserts both engines produce identical blocks
  over the full fixture corpus (edge rows included).

Whitespace policy (part of the byte-identity contract): within a block all
whitespace runs collapse to a single ASCII space and the block is stripped.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import unescape
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

# Raw-text elements: the fast tokenizer skips straight to the close tag
# (matches HTMLParser's CDATA handling of script/style).
_RAWTEXT_TAGS = ("script", "style")

# Chrome containers: structural boilerplate hint.
_CHROME_TAGS = frozenset("nav header footer aside".split())

_ARTICLE_TAGS = frozenset(("article", "main"))

_HEADING_LEVEL = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}

_KIND_TAGS = frozenset(
    ("li", "td", "th", "tr", "table", "caption", "title", "pre", "p", "blockquote")
)

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
    images: list[str] = field(default_factory=list)  # <img src> in order

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


_SRC_RE = re.compile(
    r"""(?<![\w-])src\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
)

# Precomputed per-tag dispatch info — one dict lookup replaces six
# frozenset membership tests in the hottest loop.
# (is_ignore, is_block, chrome_delta, article_delta, kind_or_None, pops_kind)
_TAG_INFO: dict[str, tuple[bool, bool, int, int, tuple[str, int] | None, bool]] = {}
for _t in _IGNORE_TAGS:
    _TAG_INFO[_t] = (True, False, 0, 0, None, False)
for _t in _BLOCK_TAGS:
    _TAG_INFO[_t] = (False, True, 0, 0, None, False)
for _t in _CHROME_TAGS:
    _TAG_INFO[_t] = (False, _t in _BLOCK_TAGS, 1, 0, None, False)
for _t in _ARTICLE_TAGS:
    _TAG_INFO[_t] = (False, _t in _BLOCK_TAGS, 0, 1, None, False)
for _t, _lvl in _HEADING_LEVEL.items():
    _TAG_INFO[_t] = (False, True, 0, 0, ("heading", _lvl), True)
for _t, _kind in (
    ("li", "list_item"),
    ("td", "table"),
    ("th", "table"),
    ("tr", "table"),
    ("table", "table"),
    ("caption", "table"),
    ("title", "title"),
    ("pre", "pre"),
    ("p", "paragraph"),
    ("blockquote", "paragraph"),
):
    _TAG_INFO[_t] = (False, _t in _BLOCK_TAGS, 0, 0, (_kind, 0), True)
# 'a' and 'img' carry their own handling flags via sentinel kinds
_TAG_INFO["a"] = (False, False, 0, 0, None, False)
_TAG_INFO["img"] = (False, False, 0, 0, None, False)


class _BlockBuilder:
    """Shared state machine: tag/data events in, annotated Blocks out."""

    __slots__ = (
        "blocks",
        "images",
        "_cur",
        "_ignore_depth",
        "_a_depth",
        "_chrome_depth",
        "_article_depth",
        "_kind_stack",
    )

    def __init__(self) -> None:
        self.blocks: list[Block] = []
        # Document-order <img src> values outside chrome/ignored regions —
        # the reference's "extract non-text images and return them along
        # with the extracted text" (specs/01_REQUIREMENTS.md:3).
        self.images: list[str] = []
        self._cur = Block()
        self._ignore_depth = 0
        self._a_depth = 0
        self._chrome_depth = 0
        self._article_depth = 0
        self._kind_stack: list[tuple[str, int]] = []

    def _sync_cur(self) -> None:
        """Point the current (reused-if-empty) block at the present context."""
        c = self._cur
        if c.parts:
            # Whitespace-only accumulation that didn't survive _flush —
            # drop it and reset the cached text.
            c.parts.clear()
            c.chars = 0
            c.link_chars = 0
        c._text = None
        if self._kind_stack:
            c.kind, c.level = self._kind_stack[-1]
        else:
            c.kind, c.level = "paragraph", 0
        c.in_article = self._article_depth > 0
        c.in_chrome = self._chrome_depth > 0

    def _flush(self) -> None:
        c = self._cur
        p = c.parts
        if not p:
            return
        # Fast path: the inter-tag "\n"/indent data event accumulates as one
        # whitespace-only part at EVERY block boundary — skip the join +
        # whitespace-collapse regex for it (c.text would be "" and the block
        # dropped; _sync_cur clears the parts either way). Byte-identical:
        # str.strip() and \s agree on every character _WS_RE collapses.
        if len(p) == 1 and not p[0].strip():
            return
        if c.text:
            self.blocks.append(c)
            self._cur = Block()

    def start(self, tag: str, src: str | None = None) -> None:
        info = _TAG_INFO.get(tag)
        if info is None:
            return  # inline/unknown tag: no block effect
        if info[0]:  # ignore region
            self._ignore_depth += 1
            return
        if self._ignore_depth:
            return
        if tag == "a":
            self._a_depth += 1
            return
        if tag == "img":
            if src and not self._chrome_depth:
                self.images.append(src)
            return
        _ig, is_block, chrome_d, article_d, kind, _pops = info
        if is_block:
            self._flush()
        if chrome_d:
            self._chrome_depth += 1
        elif article_d:
            self._article_depth += 1
        if kind is not None:
            self._kind_stack.append(kind)
        self._sync_cur()

    def end(self, tag: str) -> None:
        info = _TAG_INFO.get(tag)
        if info is None:
            return
        if info[0]:
            self._ignore_depth = max(0, self._ignore_depth - 1)
            return
        if self._ignore_depth:
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
            return
        if tag == "img":
            return
        _ig, is_block, chrome_d, article_d, _kind, pops = info
        if is_block:
            self._flush()
        if chrome_d:
            self._chrome_depth = max(0, self._chrome_depth - 1)
        elif article_d:
            self._article_depth = max(0, self._article_depth - 1)
        if pops and self._kind_stack:  # malformed-nesting safe
            self._kind_stack.pop()
        self._sync_cur()

    def data(self, text: str) -> None:
        if self._ignore_depth or not text:
            return
        self._cur.parts.append(text)
        n = len(text)
        self._cur.chars += n
        if self._a_depth:
            self._cur.link_chars += n

    def finish(self) -> list[Block]:
        self._flush()
        return self.blocks


# ---------------------------------------------------------------------------
# fast engine: single-regex scan
# ---------------------------------------------------------------------------

# One token per match: comment / declaration / processing instr. / tag.
# Attribute values may contain '>' inside quotes — the attr part consumes
# quoted strings atomically before any unquoted byte.
_TOKEN_RE = re.compile(
    r"""<(?:
        !--.*?(?:-->|$)            # comment (unterminated: to EOF)
      | !\[CDATA\[.*?(?:\]\]>|$)   # cdata
      | ![^>]*>?                   # doctype/declaration
      | \?[^>]*>?                  # processing instruction
      | (/?)                       # 1: end-tag slash
        ([a-zA-Z][a-zA-Z0-9:_-]*)  # 2: tag name
        ((?:"[^"]*"|'[^']*'|[^"'>])*)  # 3: attributes (quote-aware)
        >?
    )""",
    re.DOTALL | re.VERBOSE,
)


def _fast_tokenize(html_text: str, b: _BlockBuilder) -> None:
    pos = 0
    n = len(html_text)
    find = _TOKEN_RE.search
    lower_text = None  # lazily lowered copy for rawtext close-tag search
    while pos < n:
        m = find(html_text, pos)
        if m is None:
            b.data(_maybe_unescape(html_text[pos:]))
            break
        if m.start() > pos:
            b.data(_maybe_unescape(html_text[pos : m.start()]))
        pos = m.end()
        name = m.group(2)
        if name is None:  # comment/doctype/PI — no event
            continue
        tag = name.lower()
        if m.group(1):  # end tag
            b.end(tag)
        else:
            src = None
            if tag == "img":
                sm = _SRC_RE.search(m.group(3) or "")
                if sm:
                    src = unescape(sm.group(2) or sm.group(3) or sm.group(4) or "")
            b.start(tag, src)
            if tag in _RAWTEXT_TAGS:
                # Raw-text element: skip to its close tag unparsed
                # (HTMLParser CDATA-mode equivalent).
                if lower_text is None:
                    lower_text = html_text.lower()
                close = lower_text.find("</" + tag, pos)
                if close == -1:
                    break
                gt = html_text.find(">", close)
                b.end(tag)
                pos = n if gt == -1 else gt + 1


def _maybe_unescape(s: str) -> str:
    # html.unescape is comparatively expensive; only pay it when an
    # entity can exist (matches HTMLParser convert_charrefs semantics).
    return unescape(s) if "&" in s else s


# ---------------------------------------------------------------------------
# stdlib engine: html.parser cross-check
# ---------------------------------------------------------------------------


class _StdlibParser(HTMLParser):
    def __init__(self, builder: _BlockBuilder) -> None:
        # convert_charrefs=True resolves &amp; &#x27; … inside data —
        # required so escaped fixture text round-trips byte-identically.
        super().__init__(convert_charrefs=True)
        self._b = builder

    def handle_starttag(self, tag: str, attrs) -> None:
        src = None
        if tag == "img":
            src = next((v for k, v in attrs if k == "src"), None)
        self._b.start(tag, src)

    def handle_endtag(self, tag: str) -> None:
        self._b.end(tag)

    def handle_data(self, data: str) -> None:
        self._b.data(data)


def parse_document(html_text: str, engine: str = "fast") -> tuple[list[Block], list[str]]:
    """Segment an HTML document into annotated text blocks + image srcs.

    Tolerant of malformed markup — neither engine raises, and the
    kind-stack pops defensively.
    """
    b = _BlockBuilder()
    if engine == "fast":
        _fast_tokenize(html_text, b)
    else:
        p = _StdlibParser(b)
        p.feed(html_text)
        p.close()
    return b.finish(), b.images


def parse_blocks(html_text: str, engine: str = "fast") -> list[Block]:
    """Blocks-only view of :func:`parse_document`."""
    return parse_document(html_text, engine)[0]
