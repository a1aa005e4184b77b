"""Timed extraction job for the two-cluster-size scaling evidence,
executed THROUGH ``spark-submit --py-files engine.zip`` — the north
rule's deployment shape (ship the engine as a zip, run the same job at N
and 4N executors, report throughput at both + the efficiency ratio).

The script reads pre-generated pages, runs the production job shape
(salted repartition on the url-host hash → mapInArrow extract → parquet
sink) and prints ONE JSON line with the wall time of the timed section.
App/JVM startup is excluded — a cluster pays it once per application,
not per job — and the input is counted first so the timed section reads
a warm source, measuring compute+shuffle+sink rather than first-touch
page cache.

    python -m zipfile -c engine.zip mistral_ocr_spark
    spark-submit --master local[4]  --py-files engine.zip \
        scripts/scaling_job.py --pages P --out O4  --parallelism 8
    spark-submit --master local[16] --py-files engine.zip \
        scripts/scaling_job.py --pages P --out O16 --parallelism 32

efficiency = (docs_per_sec at 4N) / (4 x docs_per_sec at N); the driver
-grade measurement (page-cache warm, best-of-N, same-window machine
ceiling) lives in bench.py::_run_scaling — this script is the
ship-path variant (tests/test_spark_submit.py runs both sizes).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", required=True, help="input pages parquet")
    p.add_argument("--out", required=True, help="output parquet path")
    p.add_argument("--parallelism", type=int, required=True)
    p.add_argument(
        "--repeats",
        type=int,
        default=1,
        help="timed repetitions; best-of-N reported (the first run pays "
        "Python-worker spawn + JIT — a long-lived cluster job does not)",
    )
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("mistral-ocr-spark-scaling").getOrCreate()

    from mistral_ocr_spark.operators.extract import extract_pages
    from mistral_ocr_spark.pipeline import salted_repartition

    pages = spark.read.parquet(args.pages)
    n = pages.count()  # warms the source metadata/footers before timing
    secs = None
    for _ in range(max(args.repeats, 1)):
        t0 = time.time()
        extract_pages(salted_repartition(pages, args.parallelism)).write.mode(
            "overwrite"
        ).parquet(args.out)
        s = time.time() - t0
        secs = s if secs is None else min(secs, s)
    print(
        json.dumps(
            {
                "docs": n,
                "secs": round(secs, 3),
                "docs_per_sec": round(n / secs, 1),
                "parallelism": args.parallelism,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
