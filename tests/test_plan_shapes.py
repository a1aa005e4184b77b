"""Physical-plan regression tests: the optimizations the engine's scale
story depends on must be visible in `explain` output — filters reaching
the parquet scan, small dims broadcast, top-k as TakeOrderedAndProject,
column-pruned reads, and no cartesian products outside the declared
single-row broadcasts."""

from __future__ import annotations

import pytest

from mistral_ocr_spark.plans.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    fn, _sql = REGISTRY[name]
    return fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_point_lookup_pushes_filter(spark):
    plan = _plan(spark, "point_lookup")
    assert "PushedFilters: [" in plan and "doc_id" in plan.split("PushedFilters")[1][:80]


def test_point_lookup_prunes_columns(spark):
    plan = _plan(spark, "point_lookup")
    read = plan.split("ReadSchema")[1][:200]
    assert "text" not in read, f"unpruned scan reads text column: {read}"


def test_tpch_q3_broadcasts_dim_and_takeordered(spark):
    plan = _plan(spark, "tpch_q3_shipping")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-k without a full sort


def test_topk_is_takeordered(spark):
    assert "TakeOrderedAndProject" in _plan(spark, "topk_orders")


def test_anti_join_is_broadcast_or_hash(spark):
    plan = _plan(spark, "resume_anti_join")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_agg_is_partial_then_final(spark):
    # map-side combine: two HashAggregate nodes around the exchange
    plan = _plan(spark, "tpch_q1_pricing")
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_no_cartesian_outside_declared_single_row_broadcasts(spark):
    # Every registered query must avoid CartesianProduct; the single-row
    # scalar broadcasts (status_counters share/pct, ANN query vector)
    # plan as BroadcastNestedLoopJoin over one broadcast row, which is the
    # intended shape.
    offenders = []
    for name in REGISTRY:
        if name == "lineage_status":
            continue  # runs the extractor; plan string still fine but slow
        fn, _sql = REGISTRY[name]
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


@pytest.mark.parametrize("name", ["search_content", "tpch_q6_forecast"])
def test_scans_push_predicates(spark, name):
    plan = _plan(spark, name)
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters")[1][:120]
    assert "[]" not in pushed.split("]")[0] + "]", f"{name}: empty pushdown {pushed}"


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing both join sides on the join key (the co-located-join lever
    for repeated large joins at scale): the sort-merge join must plan with
    ZERO Exchange nodes, vs two for the unbucketed equivalent."""
    from pyspark.sql import functions as F

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}/warehouse'")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode("overwrite").saveAsTable(
        "bkt.orders_b"
    )
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey").mode(
        "overwrite"
    ).saveAsTable("bkt.customer_b")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        bucketed = spark.table("bkt.orders_b").join(
            spark.table("bkt.customer_b"), F.col("o_custkey") == F.col("c_custkey")
        )
        plain = orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        plan_b = bucketed._jdf.queryExecution().executedPlan().toString()
        plan_p = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan_b, f"bucketed join still shuffles:\n{plan_b[:500]}"
        assert "Exchange" in plan_p  # the unbucketed baseline does shuffle
        assert bucketed.count() == plain.count()  # same answer
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt.orders_b")
        spark.sql("DROP TABLE IF EXISTS bkt.customer_b")
        spark.sql("DROP DATABASE IF EXISTS bkt")


def test_ann_multiprobe_has_no_global_oN_takeordered(spark):
    """VERDICT r2 #2: the signature prescreen must be a map-side hamming
    filter, not a global orderBy(ham).limit(n·frac) — the only TakeOrdered
    in the plan is the final top-k with k=10, so no single-partition funnel
    grows with the corpus."""
    import re

    plan = _plan(spark, "ann_multiprobe_topk")
    limits = re.findall(r"TakeOrderedAndProject\(limit=(\d+)", plan)
    assert limits, "expected the final top-k as TakeOrderedAndProject"
    assert all(int(x) == 10 for x in limits), f"O(n)-k TakeOrdered present: {limits}"
    # and no other global sort sneaks in (rangepartitioning = full sort)
    assert "rangepartitioning" not in plan.lower(), plan[:800]


def test_extraction_plan_has_exactly_one_shuffle(spark):
    """The flagship pipeline is map-only around ONE explicit shuffle (the
    salted repartition); any second Exchange would be a scale regression."""
    from mistral_ocr_spark.operators.extract import extract_pages
    from mistral_ocr_spark.pipeline import salted_repartition
    from mistral_ocr_spark.sources.fixtures import generate_pages

    ext = extract_pages(salted_repartition(generate_pages(spark, 100, partitions=2), 4))
    plan = ext._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan[:800]


def test_web_quality_signals_single_exchange(spark):
    """The quality-signal operator must keep its one-exchange shape:
    repartition(doc_id) before explode satisfies BOTH downstream
    aggregations (doc ⊆ {doc, word}), so any second Exchange is a
    regression to the 30×-fanout double shuffle."""
    from mistral_ocr_spark.operators.textstats import web_quality_signals

    df = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    plan = web_quality_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan[:800]
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_connected_components_rounds_are_relational(spark):
    """Each large-star/small-star round must stay pure join+min-aggregate:
    no adjacency-list materialization (collect_list → a degree-10^9 node
    lands on one task) and no cartesian product."""
    from mistral_ocr_spark.operators import graph

    edges = spark.createDataFrame(
        [(i, (i * 7) % 50) for i in range(200) if i != (i * 7) % 50], ["id_a", "id_b"]
    )
    canon = graph._canonical(
        edges.selectExpr("id_a as src", "id_b as dst")
    )
    for step in (graph._large_star(canon), graph._small_star(canon)):
        plan = step._jdf.queryExecution().executedPlan().toString()
        assert "collect_list" not in plan and "CollectList" not in plan
        assert "CartesianProduct" not in plan
        assert "partial_min" in plan or "partial" in plan  # map-side combine


def test_range_join_query_is_equi_join_not_nested_loop(spark):
    # bucket decomposition must reach the driver-registered query as a
    # hash/sort-merge equi-join on (bucket, user_id) — never the
    # O(|P|·|I|) nested loop Catalyst picks for a raw inequality join
    plan = _plan(spark, "range_join_clicks")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_decontaminate_query_broadcasts_benchmark_grams(spark):
    # the benchmark gram set (eval suites — small by construction) must be
    # the broadcast side so corpus grams die map-side without a shuffle
    plan = _plan(spark, "decontaminate")
    assert "BroadcastHashJoin" in plan, plan[:800]
