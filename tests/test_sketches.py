"""Heavy-hitter (two-pass Misra-Gries) and HLL sketch tests: exactness vs
a full wordcount ground truth, the no-miss guarantee on skewed input, the
bounded candidate-set property, determinism across parallelism, and the
HLL error bound."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mistral_ocr_spark.operators import sketches as K

SF001 = "/root/testdata/sf0.001"


def _word_stream(spark, sf=SF001):
    return (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"))
    )


def _exact_heavy(spark, words, frac):
    total = words.count()
    rows = (
        words.groupBy("w").count().filter(F.col("count") >= total * frac).collect()
    )
    return {r.w: r["count"] for r in rows}


@pytest.mark.parametrize("frac", [0.01, 0.002])
def test_heavy_hitters_exact_vs_wordcount(spark, frac):
    words = _word_stream(spark)
    want = _exact_heavy(spark, words, frac)
    got = {r.item: r.freq for r in K.heavy_hitters(words, "w", frac).collect()}
    assert got == want, f"frac={frac}: {len(got)} vs {len(want)} items"


def test_heavy_hitters_no_miss_on_skewed_partitions(spark):
    """Adversarial layout: the heavy item is SPREAD thinly across many
    partitions (its per-partition share is small, so naive per-partition
    top-k would drop it) while each partition has its own dominant local
    item. The MG merge guarantee must still surface the global heavy
    hitter."""
    rows = []
    for p in range(16):
        rows += [(f"local{p}",)] * 200      # per-partition dominator
        rows += [("global",)] * 30          # thin everywhere, heavy overall
        rows += [(f"noise{p}-{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, ["w"]).repartition(16)
    got = {r.item: r.freq for r in K.heavy_hitters(df, "w", 0.05).collect()}
    # 'global' (480 of 6880 ≈ 7%) is the only item above the 5% bar; the
    # per-partition dominators (200 ≈ 2.9%) must be recount-eliminated
    assert got.get("global") == 16 * 30
    want = _exact_heavy(spark, df, 0.05)
    assert got == want == {"global": 480}


def test_heavy_hitters_deterministic_across_parallelism(spark):
    words = _word_stream(spark)
    a = sorted(tuple(r) for r in K.heavy_hitters(words.repartition(1), "w", 0.005).collect())
    b = sorted(tuple(r) for r in K.heavy_hitters(words.repartition(16), "w", 0.005).collect())
    assert a == b and len(a) > 0


def test_heavy_hitters_candidate_set_is_bounded(spark):
    """The pass-1 shuffle is partitions × k rows, not the distinct-item
    universe: on a high-cardinality stream the candidate count must stay
    ≤ partitions × k even though distinct items vastly exceed it."""
    import math

    n_parts, frac = 8, 0.01
    k = max(2, math.ceil(2.0 / frac))
    df = (
        spark.range(200_000)
        .repartition(n_parts)
        .select(F.concat(F.lit("item"), (F.col("id") % 150_000).cast("string")).alias("w"))
    )
    from mistral_ocr_spark.operators.sketches import _mg_partition_fn

    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("item", T.StringType()), T.StructField("lb", T.LongType())]
    )
    cand = df.mapInPandas(_mg_partition_fn(k, "w"), schema).count()
    assert cand <= n_parts * k, f"{cand} candidates > {n_parts * k} bound"


def test_approx_distinct_within_rsd(spark):
    words = _word_stream(spark)
    exact = words.select("w").distinct().count()
    approx = K.approx_distinct(words, "w", rsd=0.02).collect()[0].approx_distinct
    assert abs(approx - exact) / exact < 0.1, (approx, exact)
