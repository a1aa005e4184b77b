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


def test_range_join_matches_duckdb_inequality_join(spark):
    """Bucket-decomposed point-in-interval join vs DuckDB's plain
    inequality join on the same data — including intervals spanning many
    buckets, zero-length intervals, boundary hits, and a keyed variant."""
    import random

    from mistral_ocr_spark.operators.joins import range_join

    rng = random.Random(3)
    pts = [(i, rng.randrange(0, 1000), rng.choice("ab")) for i in range(300)]
    ivs = []
    for j in range(80):
        s = rng.randrange(0, 950)
        ivs.append((j, s, s + rng.choice([0, 3, 17, 240]), rng.choice("ab")))
    pdf = spark.createDataFrame(pts, ["pid", "ts", "k"])
    idf = spark.createDataFrame(ivs, ["iid", "s", "e", "k2"])

    out = range_join(pdf, idf, ts="ts", start="s", end="e", bucket_width=16)
    got = sorted((r.pid, r.iid) for r in out.collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE p(pid INT, ts INT, k VARCHAR)")
    con.execute("CREATE TABLE i(iid INT, s INT, e INT, k2 VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?,?,?)", pts)
    con.executemany("INSERT INTO i VALUES (?,?,?,?)", ivs)
    want = sorted(
        con.execute("SELECT pid, iid FROM p, i WHERE s <= ts AND ts < e").fetchall()
    )
    assert got == want and len(want) > 100  # non-trivial match volume

    # keyed variant: equality on k in addition to containment
    keyed = range_join(
        pdf, idf.withColumnRenamed("k2", "k"), ts="ts", start="s", end="e",
        bucket_width=16, on="k",
    )
    got_k = sorted((r.pid, r.iid) for r in keyed.collect())
    want_k = sorted(
        con.execute(
            "SELECT pid, iid FROM p, i WHERE s <= ts AND ts < e AND p.k = i.k2"
        ).fetchall()
    )
    con.close()
    assert got_k == want_k


def test_range_join_plan_is_hash_join_not_nested_loop(spark):
    from mistral_ocr_spark.operators.joins import range_join

    pdf = spark.createDataFrame([(1, 5)], ["pid", "ts"])
    idf = spark.createDataFrame([(1, 0, 10)], ["iid", "s", "e"])
    plan = (
        range_join(pdf, idf, ts="ts", start="s", end="e", bucket_width=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_asof_join_random_matches_python_reference(spark):
    """Property check on random data: the union-window as-of join must equal
    the obvious per-row reference (max right.ts <= left.ts per key) across
    duplicate timestamps, empty keys, and interleaved orders."""
    import random

    rng = random.Random(17)
    lrows = [(rng.randrange(4), _ts(rng.randrange(60)), f"l{i}") for i in range(120)]
    rrows = [(rng.randrange(5), _ts(rng.randrange(60)), i * 10) for i in range(80)]
    left = spark.createDataFrame(lrows, ["k", "ts", "lv"])
    right = spark.createDataFrame(rrows, ["k", "ts", "rv"])

    # reference: dedup right per (k, ts) by max rv, then per left row take
    # the row with the greatest ts <= left.ts
    best = {}
    for k, t, rv in rrows:
        best[(k, t)] = max(best.get((k, t), rv), rv)
    want = {}
    for k, t, lv in lrows:
        cand = [(t2, rv) for (k2, t2), rv in best.items() if k2 == k and t2 <= t]
        want[lv] = max(cand)[1] if cand else None

    out = asof_join(left, right, on="k", ts="ts")
    got = {r.lv: r.rv_right for r in out.collect()}
    assert got == want


def test_asof_forward_direction_matches_duckdb(spark):
    """direction='forward': earliest right row at-or-after each left row —
    checked against DuckDB ASOF with the inequality flipped."""
    left, right = _make(spark)
    out = asof_join(left, right, on="k", ts="ts", direction="forward")
    got = sorted((r.k, r.ts, r.lv, r.rv_right) for r in out.collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE l(k INT, ts TIMESTAMP, lv VARCHAR)")
    con.execute("CREATE TABLE r(k INT, ts TIMESTAMP, rv INT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", [tuple(r) for r in left.collect()])
    con.executemany("INSERT INTO r VALUES (?,?,?)", [tuple(r) for r in right.collect()])
    want = sorted(
        con.execute(
            "SELECT l.k, l.ts, l.lv, r.rv FROM l "
            "ASOF LEFT JOIN r ON l.k = r.k AND l.ts <= r.ts"
        ).fetchall()
    )
    con.close()
    assert got == want
    # spot checks: equal-ts still matches; no future row -> NULL
    by_lv = {r.lv: r.rv_right for r in out.collect()}
    assert by_lv["l-e"] == 70  # :07 matches the :07 click
    assert by_lv["l-c"] == 60  # :05 -> earliest at-or-after is :06
    assert by_lv["l-d"] is None


def test_range_join_random_bucket_widths_agree(spark):
    """Bucket width is a performance knob, never a correctness knob: wildly
    different widths must produce the identical pair set."""
    import random

    from mistral_ocr_spark.operators.joins import range_join

    rng = random.Random(23)
    pts = [(i, rng.randrange(0, 500)) for i in range(150)]
    ivs = [(j, s := rng.randrange(0, 480), s + rng.randrange(0, 60)) for j in range(50)]
    pdf = spark.createDataFrame(pts, ["pid", "ts"])
    idf = spark.createDataFrame(ivs, ["iid", "s", "e"])
    results = [
        sorted(
            (r.pid, r.iid)
            for r in range_join(pdf, idf, ts="ts", start="s", end="e", bucket_width=w).collect()
        )
        for w in (1, 7, 64, 1000)
    ]
    assert results[0] == results[1] == results[2] == results[3]
    assert len(results[0]) > 50


def test_asof_join_hot_key(spark):
    """Skew fixture (VERDICT r3 #8): one key owns half of all rows — the
    documented hot-key bound of the union-merge window. Output must stay
    exact (vs DuckDB's native ASOF JOIN on the identical data); the hot
    key's history serializes through one window partition by design."""
    import random

    rng = random.Random(99)
    n_hot, n_cold_keys, per_cold = 20_000, 50, 400
    left_rows, right_rows = [], []
    for k, n in [(0, n_hot)] + [(k, per_cold) for k in range(1, n_cold_keys + 1)]:
        for i in range(n):
            t = _ts(0) + dt.timedelta(seconds=rng.randint(0, 10**6))
            if rng.random() < 0.5:
                left_rows.append((k, t, rng.randint(0, 10**9)))
            else:
                right_rows.append((k, t, rng.randint(0, 10**9)))
    left = spark.createDataFrame(left_rows, ["k", "ts", "lv"]).repartition(8)
    right = spark.createDataFrame(right_rows, ["k", "ts", "rv"]).repartition(8)
    out = asof_join(left, right, on="k", ts="ts")
    got = sorted((r.k, r.ts, r.lv, r.rv_right) for r in out.collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE l(k INT, ts TIMESTAMP, lv BIGINT)")
    con.execute("CREATE TABLE r(k INT, ts TIMESTAMP, rv BIGINT)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", left_rows)
    con.executemany("INSERT INTO r VALUES (?,?,?)", right_rows)
    want = sorted(
        con.execute(
            # the operator's documented tie rule: duplicate right (k, ts)
            # rows reduce to the max carried tuple before the as-of
            "WITH r1 AS (SELECT k, ts, max(rv) AS rv FROM r GROUP BY k, ts) "
            "SELECT l.k, l.ts, l.lv, r1.rv FROM l "
            "ASOF LEFT JOIN r1 ON l.k = r1.k AND l.ts >= r1.ts"
        ).fetchall()
    )
    con.close()
    assert len(got) == len(left_rows)
    assert got == want
