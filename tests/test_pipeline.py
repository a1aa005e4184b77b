"""Pipeline tests: exactly-once resume, determinism under parallelism,
skew balance, lineage counters (FIXTURES.md §6 test matrix)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mistral_ocr_spark import pipeline
from mistral_ocr_spark.operators.extract import extract_pages
from mistral_ocr_spark.sources import catalog
from mistral_ocr_spark.sources.fixtures import generate_pages

N = 3000


@pytest.fixture()
def table_root():
    root = tempfile.mkdtemp(prefix="ocr_tbl_")
    yield root
    shutil.rmtree(root, ignore_errors=True)


def test_resume_exactly_once(spark, table_root):
    pages = generate_pages(spark, N, partitions=6)
    # Simulated crash: only 1 of 3 chunks commits.
    s1 = pipeline.run(spark, pages, table_root, n_chunks=3, max_chunks=1, num_partitions=8)
    assert s1["chunks_done"] == 1
    partial = catalog.read_extracted(spark, table_root).count()
    assert 0 < partial < N

    s2 = pipeline.run(spark, pages, table_root, n_chunks=3, num_partitions=8)
    assert s2["chunks_skipped"] == 1 and s2["chunks_done"] == 2
    ext = catalog.read_extracted(spark, table_root)
    assert ext.count() == N
    assert ext.select("url").distinct().count() == N  # exactly once per url

    # Fully idempotent rerun: nothing recomputed.
    s3 = pipeline.run(spark, pages, table_root, n_chunks=3, num_partitions=8)
    assert s3["chunks_done"] == 0 and s3["chunks_skipped"] == 3


def test_single_pass_equals_loop(spark, table_root):
    """single_pass=True (one input scan, partitionBy(chunk) write) must
    produce byte-identical committed rows and the same resume state as the
    per-chunk loop (VERDICT r2 #5)."""
    import os

    pages = generate_pages(spark, N, partitions=6)
    loop_root = os.path.join(table_root, "loop")
    sp_root = os.path.join(table_root, "sp")
    s_loop = pipeline.run(spark, pages, loop_root, n_chunks=4, num_partitions=8)
    s_sp = pipeline.run(
        spark, pages, sp_root, n_chunks=4, num_partitions=8, single_pass=True
    )
    assert s_sp["chunks_done"] == s_loop["chunks_done"] == 4
    assert s_sp["docs"] == s_loop["docs"] == N
    a = {
        r.url: (r.text, r.markdown)
        for r in catalog.read_extracted(spark, loop_root).collect()
    }
    b = {
        r.url: (r.text, r.markdown)
        for r in catalog.read_extracted(spark, sp_root).collect()
    }
    assert a == b
    # lineage exists per chunk and counts agree
    lin = catalog.read_lineage(spark, sp_root)
    assert {r.chunk_id for r in lin.select("chunk_id").distinct().collect()} == {0, 1, 2, 3}
    assert lin.agg(F.sum("doc_count")).collect()[0][0] == N


def test_single_pass_resumes_loop_run_and_vice_versa(spark, table_root):
    """Chunk identity is a pure function of the url, so a crashed loop run
    resumes under single_pass (and back) exactly once per url."""
    pages = generate_pages(spark, N, partitions=6)
    s1 = pipeline.run(spark, pages, table_root, n_chunks=3, max_chunks=1, num_partitions=8)
    assert s1["chunks_done"] == 1
    s2 = pipeline.run(
        spark, pages, table_root, n_chunks=3, num_partitions=8, single_pass=True
    )
    assert s2["chunks_skipped"] == 1 and s2["chunks_done"] == 2
    ext = catalog.read_extracted(spark, table_root)
    assert ext.count() == N
    assert ext.select("url").distinct().count() == N
    # idempotent rerun in either mode: nothing recomputed
    s3 = pipeline.run(
        spark, pages, table_root, n_chunks=3, num_partitions=8, single_pass=True
    )
    assert s3["chunks_done"] == 0 and s3["chunks_skipped"] == 3
    s4 = pipeline.run(spark, pages, table_root, n_chunks=3, num_partitions=8)
    assert s4["chunks_done"] == 0 and s4["chunks_skipped"] == 3


def test_crash_mid_chunk_invisible(spark, table_root):
    """Files written without a manifest commit must be invisible to readers."""
    import os

    pages = generate_pages(spark, 500, partitions=2)
    pipeline.run(spark, pages, table_root, n_chunks=2, max_chunks=1, num_partitions=4)
    committed = catalog.read_extracted(spark, table_root).count()
    # Simulate a crash that wrote data files but never committed chunk 1:
    orphan = os.path.join(table_root, "data", "run=run-0001", "chunk=1")
    extract_pages(generate_pages(spark, 100, partitions=1)).write.mode(
        "overwrite"
    ).parquet(orphan)
    assert catalog.read_extracted(spark, table_root).count() == committed


def test_determinism_across_parallelism(spark):
    a = {
        r.url: (r.text, r.markdown)
        for r in extract_pages(generate_pages(spark, 1000, partitions=2)).collect()
    }
    b = {
        r.url: (r.text, r.markdown)
        for r in extract_pages(
            pipeline.salted_repartition(generate_pages(spark, 1000, partitions=13), 7)
        ).collect()
    }
    assert a == b


def test_salting_bounds_skew(spark, table_root):
    pages = generate_pages(spark, 6000, partitions=6)  # hot host = 30% of rows
    pipeline.run(spark, pages, table_root, n_chunks=1, num_partitions=12)
    lin = catalog.read_lineage(spark, table_root)
    ns = [r.n for r in lin.groupBy("partition_id").agg(F.sum("doc_count").alias("n")).collect()]
    assert max(ns) <= 2 * (sum(ns) / len(ns)), f"skew too high: {ns}"


def test_salting_bounds_pathological_skew(spark, table_root):
    """80% of the crawl on ONE host — the salt must still spread it."""
    pages = generate_pages(spark, 6000, partitions=6, hot_tenths=8)
    pipeline.run(spark, pages, table_root, n_chunks=1, num_partitions=12)
    lin = catalog.read_lineage(spark, table_root)
    ns = [r.n for r in lin.groupBy("partition_id").agg(F.sum("doc_count").alias("n")).collect()]
    assert len(ns) == 12  # hot host did NOT collapse to few partitions
    assert max(ns) <= 2 * (sum(ns) / len(ns)), f"skew too high: {ns}"


def test_merge_latest_wins(spark, table_root):
    """J4 reconcile semantics: a later run re-extracting a url subset
    supersedes the earlier rows at read time (exactly one row per url)."""
    pages = generate_pages(spark, 1000, partitions=4)
    pipeline.run(spark, pages, table_root, run_id="run-0001", n_chunks=1, num_partitions=4)
    subset = pages.filter(F.pmod(F.xxhash64("url"), F.lit(10)) == 0)
    n_subset = subset.count()
    pipeline.run(spark, subset, table_root, run_id="run-0002", n_chunks=1, num_partitions=4)

    raw = catalog.read_extracted(spark, table_root)
    assert raw.count() == 1000 + n_subset  # both runs' rows are on disk
    latest = catalog.read_extracted_latest(spark, table_root)
    assert latest.count() == 1000
    assert latest.select("url").distinct().count() == 1000
    assert latest.filter(F.col("run_id") == "run-0002").count() == n_subset


def test_cancel_and_resume(spark, table_root):
    """Cancel marker stops the run at a chunk boundary; clearing it and
    re-running resumes from the committed chunks (reference cancel verb)."""
    import os

    pages = generate_pages(spark, 600, partitions=2)
    open(os.path.join(table_root, f"_CANCEL-run-0001"), "w").close()
    s1 = pipeline.run(spark, pages, table_root, n_chunks=2, num_partitions=4)
    assert s1.get("cancelled") and s1["chunks_done"] == 0

    os.remove(os.path.join(table_root, f"_CANCEL-run-0001"))
    s2 = pipeline.run(spark, pages, table_root, n_chunks=2, num_partitions=4)
    assert s2["chunks_done"] == 2
    assert catalog.read_extracted(spark, table_root).count() == 600


def test_compaction_preserves_table(spark, table_root):
    pages = generate_pages(spark, 1200, partitions=4)
    pipeline.run(spark, pages, table_root, n_chunks=2, num_partitions=8)
    before = catalog.load_manifest(table_root)
    rows_before = {r.url for r in catalog.read_extracted(spark, table_root).select("url").collect()}
    assert len(before["data_files"]) == 16  # 2 chunks x 8 partitions

    after = catalog.compact(spark, table_root, target_rows_per_file=1000)
    assert len(after["data_files"]) == 2  # 1200 rows / 1000 per file
    rows_after = {r.url for r in catalog.read_extracted(spark, table_root).select("url").collect()}
    assert rows_after == rows_before
    # resume state survives compaction: nothing reprocessed
    s = pipeline.run(spark, pages, table_root, n_chunks=2, num_partitions=8)
    assert s["chunks_done"] == 0 and s["chunks_skipped"] == 2


def test_lineage_counters(spark, table_root):
    pages = generate_pages(spark, 1000, partitions=4)
    pipeline.run(spark, pages, table_root, n_chunks=2, num_partitions=4)
    lin = catalog.read_lineage(spark, table_root)
    tot = lin.agg(
        F.sum("doc_count").alias("d"), F.sum("succeeded").alias("s"), F.sum("failed").alias("f")
    ).collect()[0]
    assert tot.d == 1000 and tot.s + tot.f == 1000 and tot.f > 0
    err = catalog.read_errors(spark, table_root)
    assert err.count() == tot.f
    assert set(lin.select("status").distinct().toPandas()["status"]) == {"complete"}
