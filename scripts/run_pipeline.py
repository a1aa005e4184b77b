"""spark-submit entry point for the extraction pipeline.

On a real cluster:

    python -m zipfile -c engine.zip mistral_ocr_spark
    spark-submit --master <cluster> --py-files engine.zip \
        scripts/run_pipeline.py --pages s3://.../pages --table s3://.../extracted

In this sandbox the same invocation runs against local[*] (see
tests/test_spark_submit.py for the subprocess-driven check). The script
deliberately creates its own SparkSession from the submit-provided conf —
no local session factory — so it behaves identically under a cluster
manager.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--pages", help="input pages parquet path")
    p.add_argument("--generate", type=int, default=0, help="or synthesize N pages")
    p.add_argument("--table", required=True, help="output table root")
    p.add_argument("--run-id", default="run-0001")
    p.add_argument("--chunks", type=int, default=4)
    p.add_argument("--num-partitions", type=int, default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("mistral-ocr-spark-pipeline").getOrCreate()

    from mistral_ocr_spark import pipeline
    from mistral_ocr_spark.sources.fixtures import generate_pages

    if args.pages:
        pages = spark.read.parquet(args.pages)
    elif args.generate:
        pages = generate_pages(spark, args.generate)
    else:
        raise SystemExit("one of --pages/--generate is required")

    stats = pipeline.run(
        spark,
        pages,
        args.table,
        run_id=args.run_id,
        n_chunks=args.chunks,
        num_partitions=args.num_partitions,
    )
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
