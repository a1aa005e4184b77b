"""Text-analysis operators for a training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

Everything here is built-in ``pyspark.sql.functions`` expressions — fully
JVM-side, whole-stage-codegen'd, no Python in the hot path. Each operator
has a deterministic formula that is also expressible in ANSI SQL, so every
one is DuckDB-oracle checkable (the *same* formula, not a reimplementation
guess).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Language marker words (surrounded by spaces when counted): the highest-
# frequency function words per language — the standard closed-class-word
# profile trick (function words are near-universal in running text and
# highly language-specific). 12 languages; swap/extend the table for a
# full profile set at production scale — the operator and its oracle both
# derive from this dict, so extending it is data, not code.
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " la "],
    "es": [" el ", " que ", " los "],
    "pt": [" uma ", " não ", " os "],
    "it": [" il ", " di ", " che "],
    "nl": [" het ", " een ", " van "],
    "sv": [" och ", " att ", " det "],
    "da": [" og ", " jeg ", " ikke "],
    "pl": [" nie ", " się ", " jest "],
    "tr": [" bir ", " ve ", " bu "],
    "id": [" yang ", " dan ", " untuk "],
}

STOPWORDS = [" the ", " a ", " of ", " and ", " to "]


def _count_occurrences(col, needle: str):
    """#occurrences of needle — (len(s) - len(replace(s, needle,''))) / len(needle).

    Chosen over regexp_count because the identical expression runs in any
    ANSI SQL engine (the DuckDB oracle uses the same arithmetic).
    """
    return (F.length(col) - F.length(F.replace(col, F.lit(needle)))) / F.lit(len(needle))


def _padded(text_col):
    return F.concat(F.lit(" "), text_col, F.lit(" "))


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn(
        "n_tokens", F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("bigint")
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Argmax of marker-word counts; ties broken by fixed language order;
    all-zero → 'und' (undetermined, BCP-47 style)."""
    p = _padded(F.col(text_col))
    scores = {
        lang: sum((_count_occurrences(p, m) for m in ms), F.lit(0).cast("double"))
        for lang, ms in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang in LANG_MARKERS:  # dict order = fixed tiebreak order
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return df.withColumn("lang_pred", pred)


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """[0,1] quality heuristic: length saturation + stopword density +
    mean-word-length sanity. Deterministic arithmetic, rounded to 6 dp."""
    t = F.trim(F.col(text_col))
    n_tok = F.size(F.split(t, r"\s+")).cast("double")
    p = _padded(t)
    stop = sum((_count_occurrences(p, s) for s in STOPWORDS), F.lit(0).cast("double"))
    stop_ratio = F.least(F.lit(1.0), stop / F.greatest(n_tok, F.lit(1.0)) * 5.0)
    len_score = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    mean_wlen = F.length(t) / F.greatest(n_tok, F.lit(1.0))
    wlen_score = F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), 1.0).otherwise(0.0)
    return df.withColumn(
        "quality",
        F.round(len_score * 0.4 + stop_ratio * 0.3 + wlen_score * 0.3, 6),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-normalized content fingerprint (md5 hex) — the exact-dedup
    key and the cross-engine-portable stand-in for a rolling hash."""
    norm = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.withColumn("fingerprint", F.md5(norm))


# --- shared SQL fragments for the DuckDB oracles (same formulas) -----------

def occurrences_sql(padded: str, needle: str) -> str:
    n = needle.replace("'", "''")
    return f"(length({padded}) - length(replace({padded}, '{n}', ''))) / {len(needle)}"


def lang_score_sql(lang: str, padded: str) -> str:
    return " + ".join(occurrences_sql(padded, m) for m in LANG_MARKERS[lang])
