"""Bloom-filter incremental dedup (operators/bloom.py).

Ground truth for the exact path is Spark's own LEFT ANTI join (itself
oracled against DuckDB throughout the suite); the Bloom-only path is
checked against the filter's one-sided guarantee (never a false negative
⇒ never emits a duplicate) plus a measured false-positive-rate bound.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mistral_ocr_spark.operators.bloom import (
    BloomFilter,
    bloom_dedup_increment,
    bloom_sizing,
    build_bloom,
    probe_might_contain,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_sizing_math():
    n_bits, n_hashes = bloom_sizing(1000, 0.01)
    # textbook: ~9.585 bits/key at 1% → 9585, rounded up to bytes
    assert 9585 <= n_bits <= 9592 and n_bits % 8 == 0
    assert n_hashes == 7  # round(bits/n * ln2) = round(6.64)
    with pytest.raises(ValueError):
        bloom_sizing(0, 0.01)
    with pytest.raises(ValueError):
        bloom_sizing(100, 1.5)


def test_exact_verify_equals_anti_join(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id", "lang")
    increment = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    got = bloom_dedup_increment(
        corpus, increment, "doc_id", expected_items=500, fpp=0.05
    )
    want = increment.join(corpus.select("doc_id"), on="doc_id", how="left_anti")
    g = sorted((r.doc_id, r.lang) for r in got.collect())
    w = sorted((r.doc_id, r.lang) for r in want.collect())
    assert g == w
    assert len(g) > 0  # the planted split actually leaves new rows


def test_no_false_negatives(spark, sf_dir):
    corpus = _docs(spark, sf_dir).select("text")
    bloom = build_bloom(corpus, "text", expected_items=500, fpp=0.01)
    flagged = probe_might_contain(corpus, bloom, "text")
    n_missed = flagged.filter(~F.col("might_contain")).count()
    assert n_missed == 0


def test_bloom_only_never_emits_duplicate(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id")
    increment = docs.select("doc_id", "lang")
    got = bloom_dedup_increment(
        corpus, increment, "doc_id", expected_items=500, fpp=0.2, exact_verify=False
    )
    corpus_ids = {r.doc_id for r in corpus.collect()}
    true_new = {r.doc_id for r in increment.join(corpus, "doc_id", "left_anti").collect()}
    got_ids = {r.doc_id for r in got.collect()}
    assert not (got_ids & corpus_ids)  # never a duplicate
    assert got_ids <= true_new  # only over-drops, never invents


def test_fpr_within_configured_bound(spark):
    fpp = 0.01
    member = spark.range(5000).select(F.concat(F.lit("in-"), "id").alias("k"))
    probe = spark.range(20000).select(F.concat(F.lit("out-"), "id").alias("k"))
    bloom = build_bloom(member, "k", expected_items=5000, fpp=fpp)
    hits = (
        probe_might_contain(probe, bloom, "k")
        .filter(F.col("might_contain"))
        .count()
    )
    measured = hits / 20000
    # 3x slack on a 20k sample: at true rate 0.01 the binomial std-dev is
    # ~0.0007, so 0.03 is a >20-sigma bound — a failure means a real bug
    assert measured <= 3 * fpp, f"measured FPR {measured} > {3 * fpp}"


def test_null_keys_follow_anti_join_semantics(spark):
    corpus = spark.createDataFrame(
        [Row(k="a"), Row(k=None), Row(k="b")], "k string"
    )
    increment = spark.createDataFrame(
        [Row(k="a", v=1), Row(k=None, v=2), Row(k=None, v=3), Row(k="c", v=4)],
        "k string, v int",
    )
    got = bloom_dedup_increment(corpus, increment, "k", expected_items=10)
    want = increment.join(corpus.select("k"), "k", "left_anti")
    assert sorted([(r.k, r.v) for r in got.collect()], key=str) == sorted(
        [(r.k, r.v) for r in want.collect()], key=str
    )
    # NULL-keyed increment rows are always "new" (NULL = x is never true)
    assert sorted(r.v for r in got.collect() if r.k is None) == [2, 3]


def test_bitmap_parallelism_and_merge_tree_invariant(spark):
    data = spark.range(4000).select(F.concat(F.lit("k"), "id").alias("k"))
    blooms = [
        build_bloom(data.repartition(p), "k", expected_items=4000, fpp=0.01, merge_groups=g)
        for p, g in [(1, 0), (7, 0), (7, 3)]
    ]
    assert blooms[0] == blooms[1] == blooms[2]  # OR is commutative/associative
    assert isinstance(blooms[0], BloomFilter)
    assert len(blooms[0].bitmap) == blooms[0].n_bits // 8


def test_key_dtype_mismatch_raises(spark):
    # a coercible mismatch ('5' joins 5L but hashes differently) would
    # silently break the anti-join equality — must refuse up front
    corpus = spark.range(10).select(F.col("id").alias("k"))
    increment = spark.range(10).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError, match="dtype mismatch"):
        bloom_dedup_increment(corpus, increment, "k", expected_items=10)


def test_helper_column_collision_raises(spark):
    df = spark.range(5).select(F.col("id").cast("string").alias("k"))
    bloom = build_bloom(df, "k", expected_items=5)
    with pytest.raises(ValueError, match="collide"):
        probe_might_contain(df.withColumn("_bh1", F.lit(1)), bloom, "k")
    with pytest.raises(ValueError, match="collide"):
        probe_might_contain(df.withColumn("hit", F.lit(True)), bloom, "k", flag_col="hit")


def test_probe_preserves_rows_and_schema(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    bloom = build_bloom(docs.limit(100), "text", expected_items=100)
    flagged = probe_might_contain(docs, bloom, "text", flag_col="hit")
    assert flagged.columns == ["doc_id", "lang", "text", "hit"]
    assert flagged.count() == docs.count()


def test_save_load_roundtrip(spark, tmp_path):
    from mistral_ocr_spark.operators.bloom import load_bloom, save_bloom

    member = spark.range(500).select(F.concat(F.lit("k"), "id").alias("k"))
    bloom = build_bloom(member, "k", expected_items=500, fpp=0.01)
    path = str(tmp_path / "bloom")
    save_bloom(spark, bloom, path)
    loaded = load_bloom(spark, path)
    assert loaded == bloom
    # the loaded filter probes identically (stored params authoritative)
    missed = (
        probe_might_contain(member, loaded, "k")
        .filter(~F.col("might_contain"))
        .count()
    )
    assert missed == 0
