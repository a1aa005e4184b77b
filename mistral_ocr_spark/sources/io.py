"""Edge-format I/O: JSONL batch exchange and the filesystem download tree.

The reference exchanges JSONL batch files with the remote service
(one request object per document, /root/reference/src/mistral_ocr/
simple_client.py:702-752; results parsed back at :504-529) and downloads
results into ``<doc-name-normalized>/<file>_NNN.{md,txt}`` trees
(README.md:362-376). Internally this engine never round-trips through
JSONL (Arrow carries everything); these exist as debug/interop edges and
as the export verb.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_pages(
    spark: SparkSession,
    path: str,
    recursive: bool = False,
    glob: str | None = None,
    skip_hidden: bool = True,
) -> DataFrame:
    """Pages-table scan with the reference's directory semantics: optional
    recursion (submit -r, simple_cli.py:17-27), glob filtering, and
    hidden-file exclusion (specs/01_REQUIREMENTS.md:33-34) — expressed as
    reader options so they reach the file index, not a post-filter.
    """
    from mistral_ocr_spark.sources.tables import PAGES_SCHEMA

    r = spark.read.schema(PAGES_SCHEMA)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    if glob:
        r = r.option("pathGlobFilter", glob)
    df = r.parquet(path)
    if skip_hidden:
        # hidden *rows* (dot-segment urls) are a data predicate — pushed down
        df = df.filter(~F.col("url").rlike("/\\."))
    return df


def pages_to_request_jsonl(pages: DataFrame, model: str = "in-cluster-extractor") -> DataFrame:
    """One JSONL request object per page — the reference's batch-file shape
    (custom_id / method / url / body, simple_client.py:720-752), with the
    base64 data-URL payload built from the binary column.

    Returns a single-column DataFrame ``value`` ready for
    ``df.write.text(path)``.
    """
    body = F.struct(
        F.lit(model).alias("model"),
        F.concat(F.lit("data:text/html;base64,"), F.base64(F.col("html"))).alias(
            "document_url"
        ),
    )
    obj = F.struct(
        F.col("url").alias("custom_id"),
        F.lit("POST").alias("method"),
        F.lit("/v1/extract").alias("url"),
        body.alias("body"),
    )
    return pages.filter(F.col("html").isNotNull()).select(
        F.to_json(obj).alias("value")
    )


RESULT_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("custom_id", T.StringType()),
        T.StructField(
            "response",
            T.StructType(
                [
                    T.StructField(
                        "body",
                        T.StructType(
                            [
                                T.StructField("text", T.StringType()),
                                T.StructField("markdown", T.StringType()),
                            ]
                        ),
                    )
                ]
            ),
        ),
    ]
)


def read_result_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Parse a result JSONL file (the reference's download shape,
    simple_client.py:504-529) into (url, text, markdown). Blank lines are
    skipped (P6)."""
    lines = spark.read.text(path).filter(F.length(F.trim(F.col("value"))) > 0)
    parsed = lines.select(F.from_json("value", RESULT_JSONL_SCHEMA).alias("r"))
    return parsed.select(
        F.col("r.custom_id").alias("url"),
        F.col("r.response.body.text").alias("text"),
        F.col("r.response.body.markdown").alias("markdown"),
    )


def export_download_tree(extracted: DataFrame, dest: str, limit: int | None = None) -> int:
    """Write per-document .txt/.md files under a normalized directory per
    host — the reference's download-tree layout (README.md:362-376:
    lowercased, whitespace→hyphen dir names; unknown docs under unknown/).

    Driver-side writer over ``toLocalIterator`` — this is an export verb
    for human consumption (bounded output), not a data-plane sink; the
    data-plane sink is the parquet/manifest table.
    """
    rows = extracted.select(
        F.regexp_replace(
            F.lower(
                F.coalesce(F.parse_url(F.col("url"), F.lit("HOST")), F.lit("unknown"))
            ),
            r"\s+",
            "-",
        ).alias("doc_dir"),
        F.regexp_replace(F.col("url"), r"[^A-Za-z0-9._-]", "_").alias("fname"),
        "text",
        "markdown",
    )
    if limit is not None:
        rows = rows.limit(limit)
    n = 0
    for r in rows.toLocalIterator():
        d = os.path.join(dest, r.doc_dir)
        os.makedirs(d, exist_ok=True)
        if r.text is not None:
            with open(os.path.join(d, f"{r.fname}_{n:03d}.txt"), "w") as f:
                f.write(r.text)
        if r.markdown is not None:
            with open(os.path.join(d, f"{r.fname}_{n:03d}.md"), "w") as f:
                f.write(r.markdown)
        n += 1
    return n
