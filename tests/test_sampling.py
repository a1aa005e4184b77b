"""Deterministic-sampling tests: splits must be disjoint, exhaustive,
near-proportional, stable across parallelism AND across runs, and
stratified rates must hold per stratum."""

from __future__ import annotations

from mistral_ocr_spark.operators.sampling import hash_split, stratified_sample


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text", "lang")


def test_hash_split_disjoint_exhaustive_proportional(spark, sf_dir):
    d = _docs(spark, sf_dir)
    n = d.count()
    splits = hash_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {k: v.count() for k, v in splits.items()}
    assert sum(counts.values()) == n  # exhaustive
    ids = [set(r.doc_id for r in v.select("doc_id").collect()) for v in splits.values()]
    assert not (ids[0] & ids[1]) and not (ids[0] & ids[2]) and not (ids[1] & ids[2])
    assert abs(counts["train"] / n - 0.8) < 0.06  # 500 rows: ±6% tolerance


def test_hash_split_stable_across_parallelism_and_runs(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = set(
        r.doc_id
        for r in hash_split(d, "doc_id", {"train": 0.8})["train"].select("doc_id").collect()
    )
    b = set(
        r.doc_id
        for r in hash_split(d.repartition(16), "doc_id", {"train": 0.8})["train"]
        .select("doc_id")
        .collect()
    )
    assert a == b  # same membership at different parallelism, rerun


def test_hash_split_membership_stable_under_row_addition(spark, sf_dir):
    d = _docs(spark, sf_dir)
    full = hash_split(d, "doc_id", {"val": 0.1})["val"]
    half = hash_split(d.filter("doc_id < 250"), "doc_id", {"val": 0.1})["val"]
    got_full = set(r.doc_id for r in full.select("doc_id").collect())
    got_half = set(r.doc_id for r in half.select("doc_id").collect())
    # adding the other 250 rows never moved an existing row out of val
    assert got_half == {i for i in got_full if i < 250}


def test_hash_split_rejects_oversubscribed_fractions(spark, sf_dir):
    import pytest

    with pytest.raises(ValueError):
        hash_split(_docs(spark, sf_dir), "doc_id", {"a": 0.7, "b": 0.7})


def test_stratified_sample_per_stratum_rates(spark, sf_dir):
    d = _docs(spark, sf_dir)
    base = {r.lang: r.n for r in d.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    out = stratified_sample(d, "doc_id", {"en": 0.5, "de": 0.1}, stratum_col="lang")
    got = {r.lang: r.n for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    assert set(got) <= {"en", "de"}  # unlisted strata keep nothing
    assert abs(got.get("en", 0) / base["en"] - 0.5) < 0.15
    assert got.get("de", 0) / base["de"] < 0.35
    # global-rate variant is a superset check of determinism
    g1 = stratified_sample(d, "doc_id", 0.2)
    g2 = stratified_sample(d.repartition(8), "doc_id", 0.2)
    assert set(r.doc_id for r in g1.collect()) == set(r.doc_id for r in g2.collect())


def test_sampling_is_map_side_only(spark, sf_dir):
    plan = (
        stratified_sample(_docs(spark, sf_dir), "doc_id", 0.2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure filter: no shuffle anywhere


def test_hash_split_thirds_are_exhaustive(spark, sf_dir):
    """Three 1/3 fractions: naive rounding strands one bucket; the last
    split must absorb the remainder when fractions sum to 1."""
    d = _docs(spark, sf_dir)
    splits = hash_split(d, "doc_id", {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3})
    assert sum(v.count() for v in splits.values()) == d.count()

def test_hash_split_column_rejects_empty_fractions():
    from mistral_ocr_spark.operators import sampling as SM

    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one split"):
        SM.hash_split_column("doc_id", {})
