"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction query; ``queries``/``oracle_sql``
expose every implemented operator (SURVEY.md §2 + training-data ops) with
their DuckDB oracles. Implementation lives in mistral_ocr_spark/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mistral_ocr_spark.plans import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize Common-Crawl-style pages from sf0.001 documents,
    run the in-cluster main-content extractor, return (url, text, markdown)."""
    from mistral_ocr_spark.operators.extract import extract_pages
    from mistral_ocr_spark.sources.fixtures import pages_from_documents

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    return extract_pages(pages).select("url", "text", "markdown", "error_class")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
