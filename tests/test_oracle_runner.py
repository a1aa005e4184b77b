"""Golden harness (SURVEY.md M0): the distributed pipeline must match the
single-process oracle runner byte-for-byte per url — including through the
salted repartition and at a different tokenizer engine."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from mistral_ocr_spark.operators.extract import extract_pages
from mistral_ocr_spark.oracle import run_oracle
from mistral_ocr_spark.pipeline import salted_repartition
from mistral_ocr_spark.sources.fixtures import generate_pages


def test_cluster_matches_single_process_oracle(spark):
    tmp = tempfile.mkdtemp(prefix="ocr_golden_")
    try:
        generate_pages(spark, 2000, partitions=4).coalesce(1).write.parquet(f"{tmp}/pages")
        part = glob.glob(f"{tmp}/pages/part-*.parquet")[0]
        n = run_oracle(part, f"{tmp}/golden.parquet")
        assert n == 2000

        import pyarrow.parquet as pq

        g = pq.read_table(f"{tmp}/golden.parquet")
        golden = {
            u: (t, m, e)
            for u, t, m, e in zip(
                g.column("url").to_pylist(),
                g.column("text").to_pylist(),
                g.column("markdown").to_pylist(),
                g.column("error_class").to_pylist(),
            )
        }

        ext = extract_pages(
            salted_repartition(spark.read.parquet(f"{tmp}/pages"), 8)
        ).select("url", "text", "markdown", "error_class")
        mismatches = [
            r.url
            for r in ext.collect()
            if golden[r.url] != (r.text, r.markdown, r.error_class)
        ]
        assert not mismatches, f"byte-identity broken for {mismatches[:5]}"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
