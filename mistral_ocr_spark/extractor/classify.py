"""Boilerpipe/Readability-style block classification.

Decides per block: main content vs boilerplate. Rules (deterministic,
ordered; derived from the published Boilerpipe NumWordsRules classifier —
Kohlschütter et al., WSDM 2010 — plus structural hints):

1. Chrome override: blocks inside <nav>/<header>/<footer>/<aside> are
   boilerplate, always.
2. Article override: blocks inside <article>/<main> with link density
   ≤ 1/3 are content regardless of length (Readability-style container
   trust; also what makes short fixture documents round-trip exactly).
3. Title blocks (<title>) are metadata, not content.
4. Density rules on the (prev, curr, next) word counts — the classic
   shallow-text-features decision list.
5. Heading promotion: a boilerplate heading immediately before a content
   block is promoted to content (section headers are short by nature).
"""

from __future__ import annotations

from mistral_ocr_spark.extractor.parser import Block

_MAX_LINK_DENSITY = 1.0 / 3.0


def _density_rule(prev_w: int, prev_ld: float, curr: Block, next_w: int) -> bool:
    """NumWordsRules decision list on shallow text features."""
    if curr.link_density > _MAX_LINK_DENSITY:
        return False
    if curr.words > 25:
        # Absolute override: a long low-link-density block is content no
        # matter the neighborhood (guards trailing paragraphs after nav).
        return True
    if prev_ld <= 0.555556:
        return curr.words > 16 or next_w > 15 or prev_w > 4
    return curr.words > 40 or next_w > 17


def classify(blocks: list[Block]) -> list[Block]:
    """Set ``is_content`` on every block, in place. Returns the list."""
    n = len(blocks)
    for i, b in enumerate(blocks):
        if b.in_chrome or b.kind == "title":
            b.is_content = False
            continue
        if b.in_article and b.link_density <= _MAX_LINK_DENSITY:
            b.is_content = True
            continue
        prev_b = blocks[i - 1] if i > 0 else None
        next_b = blocks[i + 1] if i < n - 1 else None
        b.is_content = _density_rule(
            prev_b.words if prev_b else 0,
            prev_b.link_density if prev_b else 0.0,
            b,
            next_b.words if next_b else 0,
        )

    # Terminal demotion (Boilerpipe's terminating-blocks heuristic): short
    # trailing plain blocks that end the document ("thanks for reading",
    # share prompts, sign-offs) are boilerplate even when a wordy block
    # precedes them — the prev_w>4 branch of the density rule would
    # otherwise accept any short tail after a long paragraph. Blocks inside
    # <article>/<main> and headings are exempt; the walk stops at the first
    # solid content block.
    for i in range(n - 1, -1, -1):
        b = blocks[i]
        if not b.is_content:
            continue
        if b.words < 8 and b.kind != "heading" and not b.in_article:
            b.is_content = False
            continue
        break

    # Heading promotion (one backward pass so chains of headings work).
    for i in range(n - 2, -1, -1):
        b = blocks[i]
        if (
            b.kind == "heading"
            and not b.is_content
            and not b.in_chrome
            and b.link_density <= _MAX_LINK_DENSITY
            and blocks[i + 1].is_content
        ):
            b.is_content = True
    return blocks
