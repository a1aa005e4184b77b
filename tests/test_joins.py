"""As-of join tests: semantics vs a driver-side reference implementation
(greatest right.ts <= left.ts per key), DuckDB native ASOF JOIN agreement,
tie rules, no-match NULLs, and the plan shape (one shuffle, no range/nested-
loop join)."""

from __future__ import annotations

import datetime as dt

import duckdb

from mistral_ocr_spark.operators.joins import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _make(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), "l-a"),
            (1, _ts(3), "l-b"),
            (2, _ts(5), "l-c"),
            (3, _ts(9), "l-d"),  # key with no right rows at all
            (1, _ts(7), "l-e"),  # exactly at a right ts -> matches it
        ],
        ["k", "ts", "lv"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts(4), 40),
            (1, _ts(7), 70),
            (1, _ts(12), 120),  # after every left row -> never matched
            (2, _ts(6), 60),  # after the only k=2 left row -> no match
        ],
        ["k", "ts", "rv"],
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _make(spark)
    out = asof_join(left, right, on="k", ts="ts")
    got = {r.lv: (r.rv_right, r.ts_right) for r in out.collect()}
    assert got == {
        "l-a": (70, _ts(7)),  # latest <= :10 is :07
        "l-b": (None, None),  # :03 precedes every right row
        "l-c": (None, None),  # right :06 is after left :05
        "l-d": (None, None),  # key 3 has no right rows
        "l-e": (70, _ts(7)),  # equal ts matches (>= semantics)
    }
    assert out.count() == left.count()  # left join: every left row survives


def test_asof_matches_duckdb_native(spark):
    left, right = _make(spark)
    out = asof_join(left, right, on="k", ts="ts")
    got = sorted((r.k, r.ts, r.lv, r.rv_right) for r in out.collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE l(k INT, ts TIMESTAMP, lv VARCHAR)")
    con.execute("CREATE TABLE r(k INT, ts TIMESTAMP, rv INT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", [tuple(r) for r in left.collect()])
    con.executemany("INSERT INTO r VALUES (?,?,?)", [tuple(r) for r in right.collect()])
    want = sorted(
        con.execute(
            "SELECT l.k, l.ts, l.lv, r.rv FROM l "
            "ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
    )
    con.close()
    assert got == want


def test_duplicate_right_ts_resolves_deterministically(spark):
    left = spark.createDataFrame([(1, _ts(9), "x")], ["k", "ts", "lv"])
    right = spark.createDataFrame(
        [(1, _ts(5), 1), (1, _ts(5), 9), (1, _ts(5), 4)], ["k", "ts", "rv"]
    )
    rows = asof_join(left, right, on="k", ts="ts").collect()
    assert len(rows) == 1 and rows[0].rv_right == 9  # max tuple wins


def test_plan_is_single_shuffle_no_range_join(spark):
    left, right = _make(spark)
    plan = asof_join(left, right, on="k", ts="ts")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # the union-merge shape: exactly one exchange for the window, plus at
    # most one for the right-side pre-dedup aggregate on the same key
    assert plan.count("Exchange") <= 2
