"""Deterministic sampling / split operators for training-data pipelines.

`df.randomSplit` is seed-dependent AND partitioning-dependent (resampling
on recompute, different rows at different parallelism) — useless when the
split must be stable across reruns, resumes, and cluster sizes. The
operators here derive membership from a HASH of a stable key, so the same
row lands in the same split on every run, at any parallelism, with no
shuffle and no state:

- ``hash_split``: train/val/test (any number of named fractions) by
  ``xxhash64(key, salt) mod D`` threshold ranges — one map-side filter per
  split, no sort, no sample() nondeterminism.
- ``stratified_sample``: per-stratum fraction by the same hash rule —
  e.g. "keep 10% of every language" — exact-in-expectation per stratum
  with deterministic membership, not a resampled approximation.

Reference parity note: stevegsax/mistral-ocr has no sampling surface;
this is training-data-pipeline breadth (the brief's 100-TB pipeline ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_prefix_long(key: Column, salt: str, n_hex: int = 8, sep: str = "-") -> Column:
    """THE portable-hash convention, shared by every deterministic
    membership/order rule in the repo (``_bucket`` splits, DSIR buckets
    and Gumbel draws, shard assignment): the first ``n_hex`` hex digits
    of ``md5(key || sep || salt)`` as a LONG — byte-identical arithmetic
    in any engine with md5 + hex parsing (DuckDB:
    ``CAST(('0x' || substr(md5(k || '{sep}{salt}'), 1, n)) AS BIGINT)``).
    ``n_hex <= 15`` keeps the value under 2^60, signed-long safe. NULL
    keys hash to NULL (callers choose their own NULL policy)."""
    if not 1 <= n_hex <= 15:
        raise ValueError(f"n_hex must be in [1, 15], got {n_hex}")
    h = F.md5(F.concat(key.cast("string"), F.lit(f"{sep}{salt}")))
    return F.conv(F.substring(h, 1, n_hex), 16, 10).cast("long")

_DENOM = 1_000_000  # hash buckets; fraction resolution 1e-6


def _bucket(key_col: str, salt: str, hash: str = "xxhash64"):
    """Deterministic bucket in [0, _DENOM). ``hash="xxhash64"`` is the fast
    JVM default; ``hash="md5"`` derives the bucket from the first 8 hex
    digits of md5(key || '-' || salt) — byte-identical arithmetic exists in
    any ANSI SQL engine (DuckDB: CAST('0x'||substr(md5(..),1,8) AS BIGINT)),
    so md5-mode splits are value-oracle-checkable cross-engine."""
    if hash == "md5":
        return md5_prefix_long(F.col(key_col), salt, 8) % F.lit(_DENOM)
    return F.pmod(F.xxhash64(F.col(key_col), F.lit(salt)), F.lit(_DENOM))


def _split_ranges(fractions: dict[str, float]) -> list[tuple[str, int, int]]:
    """The ONE place the bucket-range arithmetic lives (rounding rule
    included): both the filter form (hash_split) and the label-column form
    (hash_split_column) derive from it, so the split membership contract
    cannot drift between them."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    names = list(fractions)
    out: list[tuple[str, int, int]] = []
    lo = 0
    for i, name in enumerate(names):
        hi = lo + int(round(fractions[name] * _DENOM))
        if i == len(names) - 1 and abs(total - 1.0) < 1e-9:
            # last split absorbs the rounding remainder so full-sum splits
            # are EXHAUSTIVE (three 1/3 fractions would otherwise strand
            # one bucket in no split)
            hi = _DENOM
        out.append((name, lo, hi))
        lo = hi
    return out


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "split-v1",
    hash: str = "xxhash64",
) -> dict[str, DataFrame]:
    """Disjoint, exhaustive-if-fractions-sum-to-1 named splits, stable in
    the key: ``hash_split(docs, "url", {"train": 0.98, "val": 0.01,
    "test": 0.01})``. Changing ``salt`` re-draws the whole assignment;
    adding rows never moves existing ones between splits."""
    b = _bucket(key_col, salt, hash)
    return {
        name: df.filter((b >= lo) & (b < hi))
        for name, lo, hi in _split_ranges(fractions)
    }


def hash_split_column(
    key_col: str,
    fractions: dict[str, float],
    salt: str = "split-v1",
    hash: str = "xxhash64",
):
    """The split assignment as a label COLUMN (for pipelines that keep one
    DataFrame and tag rows instead of fanning out per-split frames) — the
    IDENTICAL bucket ranges as ``hash_split``, including the
    remainder-absorbing rounding rule, via the shared ``_split_ranges``.
    Rows outside the covered range (fractions summing < 1) get NULL."""
    if not fractions:
        # fail at the call site, not as an opaque AttributeError when the
        # caller touches the returned None (ADVICE r4)
        raise ValueError("fractions must name at least one split")
    b = _bucket(key_col, salt, hash)
    expr = None
    for name, lo, hi in _split_ranges(fractions):
        cond = (b >= lo) & (b < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr


def stratified_sample(
    df: DataFrame,
    key_col: str,
    fraction: float | dict[str, float],
    stratum_col: str | None = None,
    salt: str = "sample-v1",
    hash: str = "xxhash64",
) -> DataFrame:
    """Deterministic sample: keep a row iff its key-hash bucket falls under
    the (per-stratum) fraction. With ``fraction`` a dict, ``stratum_col``
    selects the per-stratum rate (missing strata keep nothing); with a
    float, one global rate. Pure map-side filter — no shuffle, no seed
    state, identical membership at any parallelism."""
    b = _bucket(key_col, salt, hash)
    if isinstance(fraction, dict):
        if stratum_col is None:
            raise ValueError("stratum_col required with per-stratum fractions")
        expr = F.lit(False)
        for stratum, frac in fraction.items():
            expr = expr | (
                (F.col(stratum_col) == stratum) & (b < int(round(frac * _DENOM)))
            )
        return df.filter(expr)
    return df.filter(b < int(round(fraction * _DENOM)))
