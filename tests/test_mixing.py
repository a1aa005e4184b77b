"""Corpus mixing / budget selection vs independent Python replays."""

from __future__ import annotations

import hashlib
import random

import pytest

from mistral_ocr_spark.operators import mixing as MX

SALT = "mix-v1"


def _md5_bucket(key, salt=SALT):
    h = hashlib.md5(f"{key}-{salt}".encode()).hexdigest()
    return int(h[:8], 16) % 1_000_000


# --- balance_to_target -----------------------------------------------------

def _strat_corpus(spark):
    rows = []
    i = 0
    for lang, n in [("en", 1000), ("fr", 300), ("de", 100), ("xx", 50)]:
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    return rows, spark.createDataFrame(rows, "doc_id long, lang string")


def test_balance_matches_replay_and_keeps_binding_stratum(spark):
    rows, df = _strat_corpus(spark)
    stats: dict = {}
    target = {"en": 0.5, "fr": 0.3, "de": 0.2}
    out = MX.balance_to_target(
        df, "lang", target, "doc_id", salt=SALT, hash="md5", stats=stats
    )
    got = {r["doc_id"] for r in out.collect()}
    # T = min(1000/.5, 300/.3, 100/.2) = 500 → fractions .25 / .5 / 1.0
    assert stats["_total_expected"] == pytest.approx(500.0)
    assert stats["de"] == (100, pytest.approx(1.0))
    assert stats["en"] == (1000, pytest.approx(0.25))
    # exact membership replay (sampling's md5 rule)
    fr = {
        s: round(v[1] * 1_000_000)
        for s, v in stats.items()
        if s != "_total_expected"
    }
    want = {
        i
        for i, lang in rows
        if lang in fr and _md5_bucket(i) < fr[lang]
    }
    assert got == want
    # binding stratum survives in full; untargeted stratum fully dropped
    langs = dict(rows)
    assert sum(1 for i in got if langs[i] == "de") == 100
    assert all(langs[i] != "xx" for i in got)


def test_balance_missing_stratum_raises(spark):
    _, df = _strat_corpus(spark)
    with pytest.raises(ValueError, match="absent"):
        MX.balance_to_target(df, "lang", {"en": 0.5, "zz": 0.5}, "doc_id")
    with pytest.raises(ValueError, match="positive"):
        MX.balance_to_target(df, "lang", {}, "doc_id")
    # a sign typo must not silently drop the stratum (r5 review)
    with pytest.raises(ValueError, match="negative"):
        MX.balance_to_target(
            df, "lang", {"en": 0.6, "de": -0.2, "fr": 0.6}, "doc_id"
        )


# --- select_until_budget ---------------------------------------------------

def _scored_corpus(n=400, seed=17):
    rng = random.Random(seed)
    # duplicate scores on purpose: ties must break by id
    return [
        (i, round(rng.choice([0.1, 0.5, 0.9, rng.random()]), 3), rng.randint(1, 50))
        for i in range(n)
    ]


def _gt_budget(rows, budget):
    cum = 0
    keep = {}
    for i, s, c in sorted(rows, key=lambda r: (-r[1], r[0])):
        if cum + c > budget:
            break
        cum += c
        keep[i] = cum
    return keep


def test_budget_matches_python_ground_truth(spark):
    rows = _scored_corpus()
    budget = 3000
    df = spark.createDataFrame(rows, "doc_id long, score double, n_tokens long")
    got = {
        r["doc_id"]: r["cum_cost"]
        for r in MX.select_until_budget(df, budget).collect()
    }
    assert got == _gt_budget(rows, budget)


def test_budget_edges(spark):
    rows = _scored_corpus(50)
    df = spark.createDataFrame(rows, "doc_id long, score double, n_tokens long")
    assert MX.select_until_budget(df, 0).count() == 0
    total = sum(c for _, _, c in rows)
    assert MX.select_until_budget(df, total).count() == len(rows)
    with pytest.raises(ValueError):
        MX.select_until_budget(df, -1)


def test_budget_rejects_null_and_negative(spark):
    df = spark.createDataFrame(
        [(1, 0.5, None), (2, 0.1, 3)], "doc_id long, score double, n_tokens long"
    )
    with pytest.raises(ValueError, match="NULL"):
        MX.select_until_budget(df, 10)
    df2 = spark.createDataFrame(
        [(1, 0.5, -2), (2, 0.1, 3)], "doc_id long, score double, n_tokens long"
    )
    with pytest.raises(ValueError, match="negative"):
        MX.select_until_budget(df2, 10)


def test_budget_rejects_fractional_cost_type(spark):
    # float costs would make boundary membership partition-layout
    # dependent (driver float offset merge vs window sum) — r5 review
    df = spark.createDataFrame(
        [(1, 0.5, 2.5), (2, 0.1, 3.0)], "doc_id long, score double, n_tokens double"
    )
    with pytest.raises(ValueError, match="integral"):
        MX.select_until_budget(df, 10)


def test_budget_deterministic_across_parallelism(spark):
    rows = _scored_corpus(300, seed=3)
    df = spark.createDataFrame(rows, "doc_id long, score double, n_tokens long")
    a = {
        (r["doc_id"], r["cum_cost"])
        for r in MX.select_until_budget(df, 2500, partitions=2).collect()
    }
    b = {
        (r["doc_id"], r["cum_cost"])
        for r in MX.select_until_budget(df, 2500, partitions=16).collect()
    }
    assert a == b


# --- shuffle_shards / write_shards -----------------------------------------

def _h60(key, salt="s-v1"):
    return int(hashlib.md5(f"{key}-{salt}".encode()).hexdigest()[:15], 16)


def test_shuffle_shards_matches_replay(spark):
    rows = [(i, f"t{i}") for i in range(500)]
    df = spark.createDataFrame(rows + [(None, "null-key")], "doc_id long, text string")
    got = {
        r["text"]: (r["shard"], r["sort_key"])
        for r in MX.shuffle_shards(df, 8, salt="s-v1").collect()
    }
    for i, t in rows:
        assert got[t] == (_h60(i) % 8, _h60(i))
    # NULL key hashes under the '' pseudo-key — a real shard, never NULL
    assert got["null-key"] == (_h60("") % 8, _h60(""))
    with pytest.raises(ValueError):
        MX.shuffle_shards(df, 0)


def test_write_shards_one_ordered_file_per_shard(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    rows = [(i, f"t{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(16)
    p = str(tmp_path / "shards")
    MX.write_shards(MX.shuffle_shards(df, 8, salt="s-v1"), p, 8)
    seen = set()
    for k in range(8):
        files = glob.glob(f"{p}/shard={k}/*.parquet")
        assert len(files) == 1, f"shard {k}: {files}"  # one task per shard
        t = pq.read_table(files[0])
        keys = t.column("sort_key").to_pylist()
        assert keys == sorted(keys)  # exact sort_key order within the file
        assert all(h % 8 == k for h in keys)
        seen.update(t.column("doc_id").to_pylist())
    assert seen == {i for i, _ in rows}  # nothing lost, nothing duplicated
