"""DSIR importance resampling: independent pure-Python ground truth
(hashlib md5 + math.log — no Spark code shared with the implementation),
planted-target behavior, determinism, and plan shape."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from mistral_ocr_spark.operators import dsir

B = 256
SALT = "dsir-v1"
ALPHA = 1.0


# --- independent reference implementation ---------------------------------

def _ref_bucket(gram: str, n_buckets: int = B, salt: str = SALT) -> int:
    h = hashlib.md5((gram + "|" + salt).encode()).hexdigest()
    return int(h[:8], 16) % n_buckets


def _ref_grams(text: str) -> list[str]:
    w = [t for t in text.split() if t]
    return w + [f"{a} {b}" for a, b in zip(w, w[1:])]


def _ref_counts(texts: list[str]) -> dict[int, int]:
    c: dict[int, int] = {}
    for t in texts:
        for g in _ref_grams(t):
            b = _ref_bucket(g)
            c[b] = c.get(b, 0) + 1
    return c


def _ref_logw(raw: dict[int, str], target_texts: list[str]) -> dict[int, float]:
    cr = _ref_counts(list(raw.values()))
    ct = _ref_counts(target_texts)
    nr, nt = sum(cr.values()), sum(ct.values())
    lam = {
        b: math.log(ct.get(b, 0) + ALPHA)
        - math.log(nt + ALPHA * B)
        - math.log(cr[b] + ALPHA)
        + math.log(nr + ALPHA * B)
        for b in cr
    }
    out = {}
    for i, t in raw.items():
        out[i] = sum(lam[_ref_bucket(g)] for g in _ref_grams(t))
    return out


def _ref_gumbel(doc_id: int, salt: str = SALT) -> float:
    h = hashlib.md5((str(doc_id) + "|" + salt).encode()).hexdigest()
    u = (int(h[:8], 16) + 0.5) / 2**32
    return -math.log(-math.log(u))


RAW = {
    1: "the cat sat on the mat",
    2: "quantum flux capacitor harmonics resonate",
    3: "the dog sat on the log",
    4: "flux harmonics drive quantum resonance today",
    5: "cats and dogs sat together on mats",
    6: "",
    7: "   ",
    8: "solo",
    9: "the the the the the",
    10: "quantum quantum flux flux harmonics",
}
TARGET = [
    "quantum flux harmonics in resonant capacitors",
    "flux quantum devices resonate with harmonics",
]


@pytest.fixture(scope="module")
def raw_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in RAW.items()], "doc_id int, text string"
    )


@pytest.fixture(scope="module")
def target_df(spark):
    return spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(TARGET)], "doc_id int, text string"
    )


def test_weights_match_independent_reference(spark, raw_df, target_df):
    got = {
        r.doc_id: r.logw
        for r in dsir.dsir_weights(raw_df, target_df, n_buckets=B).collect()
    }
    want = _ref_logw(RAW, TARGET)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=1e-9), f"doc {i}"


def test_empty_and_blank_docs_keep_zero_weight_rows(spark, raw_df, target_df):
    got = {
        r.doc_id: r.logw
        for r in dsir.dsir_weights(raw_df, target_df, n_buckets=B).collect()
    }
    assert got[6] == 0.0 and got[7] == 0.0


def test_planted_target_ranks_on_top(spark, raw_df, target_df):
    """Docs sharing the target's vocabulary (2, 4, 10) must outrank the
    cat/dog docs on raw importance weight."""
    w = {
        r.doc_id: r.logw
        for r in dsir.dsir_weights(raw_df, target_df, n_buckets=B).collect()
    }
    assert min(w[2], w[4]) > max(w[1], w[3], w[5])


def test_select_matches_reference_gumbel_topk(spark, raw_df, target_df):
    k = 4
    got = dsir.dsir_select(raw_df, target_df, k, n_buckets=B).collect()
    want_scores = {
        i: round(round_or(w) + _ref_gumbel(i), 6)
        for i, w in _ref_logw(RAW, TARGET).items()
    }
    want = sorted(want_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert [(r.doc_id, r.score) for r in got] == [
        (i, pytest.approx(s, abs=2e-6)) for i, s in want
    ]


def round_or(x: float) -> float:
    return x  # full precision into the sum; rounding happens once at the end


def test_select_deterministic_across_parallelism(spark, raw_df, target_df):
    a = dsir.dsir_select(raw_df.repartition(1), target_df, 5, n_buckets=B).collect()
    b = dsir.dsir_select(raw_df.repartition(7), target_df, 5, n_buckets=B).collect()
    assert [(r.doc_id, r.logw, r.score) for r in a] == [
        (r.doc_id, r.logw, r.score) for r in b
    ]


def test_lambda_table_bounded_and_broadcast(spark, raw_df, target_df):
    lam = dsir.log_ratio_table(
        dsir.bucket_counts(raw_df, n_buckets=B),
        dsir.bucket_counts(target_df, n_buckets=B),
        B,
    )
    assert lam.count() <= B
    plan = dsir.dsir_weights(raw_df, target_df, n_buckets=B)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_matches_duckdb_oracle_on_documents_fixture(spark, sf_dir):
    """Cross-engine parity at the driver's scale, same SQL the registry
    ships (tables read straight from the sf parquet)."""
    import duckdb

    from mistral_ocr_spark.plans.queries import REGISTRY

    fn, sql = REGISTRY["dsir_select"]
    got = fn(spark, sf_dir).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(sql).fetchall()
    assert [(r.doc_id, r.logw, r.score) for r in got] == [
        (i, pytest.approx(lw, abs=2e-6), pytest.approx(s, abs=2e-6))
        for i, lw, s in want
    ]


def test_word_split_evaluates_once_in_plan(spark, raw_df):
    """The words array must materialize in its own projection: with the
    split inlined into the bigram lambda, Spark re-runs the regex split
    twice PER BIGRAM (no CSE in transform lambdas — measured ~10x on this
    operator; the r4 Generate-double-eval cousin)."""
    plan = (
        dsir._doc_buckets(raw_df, "text", "doc_id", B, SALT)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("split(") == 1
