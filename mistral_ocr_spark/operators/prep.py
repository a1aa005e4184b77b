"""Training-prep transforms: token-bounded document chunking and PII
redaction — the last-mile operators between a cleaned corpus and a
pretraining dataloader.

Both are pure built-in ``pyspark.sql.functions`` expressions (JVM-side,
whole-stage-codegen'd, zero Python in the hot path) with deterministic
formulas reproducible in ANSI SQL, so each ships with a DuckDB oracle
test rather than a reimplementation guess.

Reference parity note: stevegsax/mistral-ocr has no corpus-prep surface;
this is training-data-pipeline breadth (the C4/Gopher pipelines redact or
drop PII-bearing lines; every pretraining pipeline chunks documents to
the model's sequence length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into word-token chunks of at most
    ``max_tokens`` with ``overlap`` tokens of context carried between
    consecutive chunks — ``(id_col, chunk_id, text, n_tokens)``, one row
    per chunk, ``chunk_id`` 0-based in document order.

    Chunking rule (deterministic, oracle-expressible): tokens are the
    ``\\s+`` split of the trimmed text; chunk ``i`` covers tokens
    ``[i·step, i·step + max_tokens)`` with ``step = max_tokens − overlap``;
    chunks are emitted while ``i·step < n_tokens``, so the final chunk may
    be short but never empty, a document with ``n ≤ max_tokens`` yields
    exactly one chunk, and every token belongs to at least one chunk.
    NULL-text documents are dropped (the LM-operator contract).

    Plan shape at 10^12 docs: one map-side array split + a transform over
    the per-doc chunk index sequence + one explode — no shuffle at all
    (chunking is embarrassingly parallel); the per-row memory bound is
    the document itself.
    """
    if overlap >= max_tokens:
        raise ValueError(f"overlap ({overlap}) must be < max_tokens ({max_tokens})")
    step = max_tokens - overlap
    words = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_ws"),
    )
    n = F.size("_ws")
    # number of chunks = ceil(max(n - overlap, step) / step) — floor form
    n_chunks = F.greatest(-F.floor(-(n - F.lit(overlap)) / F.lit(step)), F.lit(1)).cast(
        "int"
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.array_join(
                F.slice("_ws", i * step + 1, max_tokens), " "
            ).alias("text"),
            F.least(n - i * step, F.lit(max_tokens)).cast("bigint").alias("n_tokens"),
        ),
    )
    return (
        words.select(id_col, F.explode_outer(chunks).alias("c"))
        .filter(F.col("c").isNotNull())
        .select(
            id_col,
            F.col("c.chunk_id").cast("int").alias("chunk_id"),
            F.col("c.text").alias("text"),
            F.col("c.n_tokens").alias("n_tokens"),
        )
    )


# PII patterns — intersection of Java-regex and RE2 syntax so the DuckDB
# oracle runs the IDENTICAL expressions (no lookbehind, no backrefs).
# Deliberately conservative-match (precision over recall): a redactor that
# eats ordinary text corrupts the corpus silently, while a rare missed
# address is caught by downstream audits.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (
        r"[A-Za-z0-9][A-Za-z0-9._%+-]*@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    "ipv4": (
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
    "phone": (
        # +country or (area) prefixed, 7+ digits with separators — bare
        # digit runs are NOT matched (years, ids, quantities)
        r"(?:\+\d{1,3}[ .-]?)?\(?\d{3}\)?[ .-]\d{3}[ .-]\d{4}\b",
        "<PHONE>",
    ),
}


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    kinds: list[str] | None = None,
) -> DataFrame:
    """Mask PII spans in ``text_col`` in place and count what was masked:
    input columns pass through, ``text_col`` is rewritten with
    ``<EMAIL>/<IP>/<PHONE>`` placeholders, and one ``n_<kind>`` BIGINT
    column per active kind reports the number of masked spans (count
    BEFORE masking, so overlapping patterns applied later never uncount
    earlier ones — application order is the ``PII_PATTERNS`` dict order).

    Pure ``regexp_count`` + chained ``regexp_replace`` — map-side only,
    no shuffle; the identical patterns run in the DuckDB oracle (the
    pattern table is data shared by both engines, not parallel code).
    """
    kinds = list(PII_PATTERNS) if kinds is None else kinds
    for k in kinds:
        if k not in PII_PATTERNS:
            raise ValueError(f"unknown PII kind {k!r}; known: {list(PII_PATTERNS)}")
    out = docs
    masked = F.col(text_col)
    for k in kinds:
        pat, _rep = PII_PATTERNS[k]
        out = out.withColumn(
            f"n_{k}", F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint")
        )
    for k in kinds:
        pat, rep = PII_PATTERNS[k]
        masked = F.regexp_replace(masked, pat, rep)
    return out.withColumn(text_col, masked)
