"""The composed training-corpus pipeline — the end-to-end job the
individual operator families exist for, chained in the order production
web-corpus pipelines (C4, Gopher, FineWeb) run them:

    extract → exact dedup → boilerplate-line dedup → quality filters
            → eval-set decontamination → deterministic split

Ordering note (caught by the composition test, not theory): exact dedup
MUST precede cross-document line dedup — an exact-duplicate pair feeds
every one of its lines into the frequency count at df ≥ 2, so line dedup
at ``min_df=2`` annihilates BOTH copies entirely instead of leaving one
survivor. Collapsing exact duplicates first keeps the line-frequency
counts meaningful (one vote per distinct document).

Every stage is one of this engine's tested operators; this module only
sequences them, so the composition inherits each stage's oracle/ground-
truth coverage and adds a composition test on planted fixtures
(tests/test_corpus_pipeline.py). Each stage is also individually
skippable, because real pipelines tune the recipe per corpus.

Scale shape: the chain is a linear DataFrame pipeline — extraction's
salted mapInArrow, the line-dedup frequency shuffle, the quality signal
exchange, the dedup hash-aggregate, the broadcast decontamination join,
and the shuffle-free hash split each keep the plan shapes asserted in
their own test suites; composing them adds no driver-side collect and no
new shuffle beyond the stages' own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mistral_ocr_spark.operators import dedup as D
from mistral_ocr_spark.operators import sampling as SM
from mistral_ocr_spark.operators import textstats as X
from mistral_ocr_spark.operators.extract import extract_pages


def build_training_corpus(
    pages: DataFrame,
    benchmark: DataFrame | None = None,
    min_quality: float = 0.0,
    require_gopher: bool = False,
    require_rep: bool = True,
    line_min_df: int | None = 2,
    decontaminate_n: int = 13,
    train_frac: float = 0.9,
    split_salt: str = "corpus-v1",
    stats: dict | None = None,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → training corpus
    ``(doc_id, url, text, quality, n_words, split)``.

    Stages (each optional where a production recipe would make it so):

    1. EXTRACT — in-cluster main-content extraction; rows with an
       ``error_class`` (undecodable, empty, unsupported PDF) drop here.
       ``doc_id`` is the deterministic xxhash64 of the url — stable
       across cluster sizes and reruns (the O5 contract).
    2. EXACT DEDUP — one survivor per normalized-text fingerprint
       (min doc_id wins, deterministic). Runs BEFORE line dedup — see the
       module docstring's ordering note.
    3. LINE DEDUP — ``cross_doc_line_dedup``: boilerplate lines appearing
       in ≥ ``line_min_df`` DISTINCT documents vanish from every document
       (skipped when ``line_min_df`` is None); documents left empty drop.
    4. QUALITY — ``web_quality_signals`` over the cleaned text; keep rows
       with ``quality ≥ min_quality`` and the requested Gopher /
       repetition flags (C4's line flags are available in the signals for
       recipes that want them).
    5. DECONTAMINATE — drop any document sharing a ``decontaminate_n``-gram
       with the ``benchmark`` DataFrame (id_col ``bench_id``, text column
       ``text``); skipped when no benchmark is given.
    6. SPLIT — sampling's hash-bucket assignment: shuffle-free,
       cluster-size-stable train/holdout labeling.

    ``stats``, when given, is filled with per-stage surviving-row counts —
    each count is an extra job, so leave it None in production.
    """
    ext = extract_pages(pages)
    docs = (
        ext.filter(F.col("error_class").isNull())
        .select(
            F.xxhash64("url").alias("doc_id"),
            "url",
            "text",
        )
    )
    if stats is not None:
        stats["extracted"] = docs.count()

    keepers = D.exact_dedup(docs, key_col="doc_id").select(
        F.col("keeper_id").alias("doc_id")
    )
    docs = docs.join(keepers, "doc_id")
    if stats is not None:
        stats["after_exact_dedup"] = docs.count()

    if line_min_df is not None:
        cleaned = D.cross_doc_line_dedup(
            docs.select("doc_id", "text"), min_df=line_min_df
        ).select("doc_id", "text")
        docs = docs.drop("text").join(cleaned, "doc_id")
        docs = docs.filter(F.length(F.trim("text")) > 0)
        if stats is not None:
            stats["after_line_dedup"] = docs.count()

    sig = X.web_quality_signals(docs, carry_cols=["url"])
    quality = X.with_quality_score(docs.select("doc_id", "text"))
    keep = F.col("quality") >= min_quality
    if require_gopher:
        keep = keep & (F.col("gopher_pass") == 1)
    if require_rep:
        keep = keep & (F.col("rep_pass") == 1)
    deduped = (
        sig.join(quality.select("doc_id", "quality", "text"), "doc_id")
        .filter(keep)
        .select("doc_id", "url", "text", "quality", "n_words")
    )
    if stats is not None:
        stats["after_quality"] = deduped.count()

    if benchmark is not None:
        dirty = (
            D.decontaminate(deduped, benchmark, n=decontaminate_n)
            .select("doc_id")
            .distinct()
        )
        deduped = deduped.join(dirty, "doc_id", "left_anti")
        if stats is not None:
            stats["after_decontamination"] = deduped.count()

    bucket = SM._bucket("doc_id", split_salt)
    cut = int(round(train_frac * SM._DENOM))
    return deduped.select(
        "doc_id",
        "url",
        "text",
        "quality",
        "n_words",
        F.when(bucket < cut, "train").otherwise("holdout").alias("split"),
    )
