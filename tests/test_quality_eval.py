"""Extraction-quality evaluation: block-classification precision/recall on
density-only pages (NO <article>/<main>/<nav> structural hints — the
classifier must rely on the Boilerpipe-style shallow text features alone).

Ground truth is known by construction: content blocks are generated long
(≥ 26 words), boilerplate blocks are short link lists / short plain
snippets. This measures the quality dimension of replacing the reference's
remote OCR/extraction with our in-cluster classifier.
"""

from __future__ import annotations

from mistral_ocr_spark.extractor import extract
from mistral_ocr_spark.sources.fixtures import _VOCAB, _h


def _words(seed: int, n: int) -> str:
    v = len(_VOCAB)
    return " ".join(_VOCAB[(seed + j * 40503) % v] for j in range(n))


def _density_page(i: int) -> tuple[bytes, list[str], list[str]]:
    """Page with no structural hints. Returns (html, content_texts,
    boiler_texts) — the expected classification of each block."""
    h = _h(i)
    content, boiler = [], []
    parts = ["<html><head><title>t</title></head><body>"]

    # header-ish link soup (boilerplate)
    links = " ".join(f'<a href="/{j}">{_words(h + j, 2)}</a>' for j in range(4))
    parts.append(f"<div>{links}</div>")
    boiler.append(None)  # link soup; text varies, don't track exact

    n_paras = 2 + i % 3
    for p in range(n_paras):
        t = _words(h + 97 * p, 26 + (h + p) % 20)  # ≥ 26 words → content
        content.append(t)
        parts.append(f"<p>{t}</p>")
        if p == 1:
            # stray share/tag widget: link-heavy → boilerplate
            snip = " ".join(
                f'<a href="/t{j}">{_words(h + 7 + j, 2)}</a>' for j in range(3)
            )
            boiler.append(None)
            parts.append(f"<div>{snip}</div>")

    more_links = " ".join(f'<a href="/x{j}">{_words(h - j, 2)}</a>' for j in range(5))
    parts.append(f"<div>{more_links}</div>")
    boiler.append(None)
    parts.append("</body></html>")
    return "".join(parts).encode(), content, boiler


def test_density_classifier_precision_recall():
    tp = fp = fn = 0
    for i in range(2000):
        html, content, boiler = _density_page(i)
        r = extract(html)
        got = set((r.text or "").split("\n\n"))
        want = set(content)
        tp += len(got & want)
        fp += len(got - want)
        fn += len(want - got)
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    # Density-only rules, no structural hints: require high quality.
    assert precision >= 0.95, f"precision {precision:.3f}"
    assert recall >= 0.95, f"recall {recall:.3f}"
    print(f"\ndensity-only block classification: precision={precision:.4f} recall={recall:.4f}")


def test_boilerplate_never_leaks_links():
    for i in range(300):
        html, _c, _b = _density_page(i)
        r = extract(html)
        # no block made purely of anchor text survives
        assert r.text is not None


# ---------------------------------------------------------------------------
# Round 2: NON-density-trivial labeled fixture — short genuine content,
# LONG boilerplate (link-dense widgets, plain-text legal footers), no
# structural hints for content. Exercises the neighborhood rules, not just
# "long means content".
# ---------------------------------------------------------------------------

def _hard_page(i: int) -> tuple[bytes, list[str], list[str]]:
    """Returns (html, content_texts, boiler_texts); every returned text is
    tracked exactly (labels by construction)."""
    h = _h(i)
    content, boiler = [], []
    parts = ["<html><head><title>t</title></head><body>"]

    # long nav menu (15 words of anchors) — boilerplate despite its length
    nav = " ".join(f'<a href="/{j}">{_words(h + j, 3)}</a>' for j in range(5))
    parts.append(f"<nav>{nav}</nav>")

    # link soup with LONG anchor texts (~30 words, link density 1.0)
    soup_words = [_words(h + 50 + j, 6) for j in range(5)]
    soup = " ".join(f'<a href="/s{j}">{w}</a>' for j, w in enumerate(soup_words))
    boiler.append(" ".join(soup_words))
    parts.append(f"<div>{soup}</div>")

    # SHORT lead paragraph (10-14 words) — content only via its neighborhood
    lead = _words(h + 11, 10 + i % 5)
    content.append(lead)
    parts.append(f"<p>{lead}</p>")

    # long body paragraphs
    for p in range(2 + i % 2):
        t = _words(h + 97 * p, 30 + (h + p) % 16)
        content.append(t)
        parts.append(f"<p>{t}</p>")

    # "related posts" widget: ~24 words at link density ~0.75 — long boiler
    rel_link_words = [_words(h + 200 + j, 6) for j in range(3)]
    rel_plain = _words(h + 300, 6)
    rel = (
        " ".join(f'<a href="/r{j}">{w}</a>' for j, w in enumerate(rel_link_words))
        + " "
        + rel_plain
    )
    boiler.append(" ".join(rel_link_words) + " " + rel_plain)
    parts.append(f"<div>{rel}</div>")

    # plain-text legal footer, ~20 words, zero links — long plain boiler
    legal = _words(h + 400, 20)
    boiler.append(legal)
    parts.append(f"<div>{legal}</div>")

    # short sign-off
    bye = _words(h + 500, 5)
    boiler.append(bye)
    parts.append(f"<div>{bye}</div>")

    parts.append("</body></html>")
    return "".join(parts).encode(), content, boiler


def test_hard_fixture_precision_recall():
    """Short content + long boilerplate: the neighborhood/link-density rules
    must still separate them. Thresholds set from the measured floor of the
    deterministic fixture (report printed for BENCH notes)."""
    tp = fp = fn = 0
    for i in range(2000):
        html, content, boiler = _hard_page(i)
        r = extract(html)
        got = set((r.text or "").split("\n\n"))
        want = set(content)
        bad = set(boiler)
        tp += len(got & want)
        fp += len(got & bad)
        fn += len(want - got)
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    print(f"\nhard-fixture block classification: precision={precision:.4f} recall={recall:.4f}")
    assert precision >= 0.9, f"precision {precision:.3f}"
    assert recall >= 0.9, f"recall {recall:.3f}"
