"""Custom stateful streaming operator: per-host cumulative crawl stats.

``applyInPandasWithState`` over the pages stream — the Structured
Streaming shape for operators Spark lacks built-in: arbitrary per-key
state (here: running page/byte counters per host, the streaming analog of
the lineage byte/doc counters A4) maintained across micro-batches AND
across job restarts via the streaming checkpoint.

Grouping key is the url host — the same key the batch pipeline salts on;
at web scale this operator is why host locality matters.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mistral_ocr_spark.sources.tables import PAGES_SCHEMA

OUTPUT_SCHEMA = "host string, pages long, bytes long"
STATE_SCHEMA = "pages long, bytes long"


def _update_host_stats(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    pages, nbytes = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        pages += len(pdf)
        nbytes += int(pdf["size"].fillna(0).sum())
    state.update((pages, nbytes))
    yield pd.DataFrame({"host": [key[0]], "pages": [pages], "bytes": [nbytes]})


def host_stats_stream(
    spark: SparkSession, pages_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Process available page files, updating per-host cumulative counters;
    emits the updated counter rows per micro-batch to a parquet log
    (foreachBatch append — parquet sinks don't take update mode directly).
    Re-invocation resumes both the file position AND the counters from the
    checkpoint: exactly-once accumulation across restarts.
    """
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    keyed = pages.select(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.octet_length(F.col("html")).cast("long").alias("size"),
    )
    updated = keyed.groupBy("host").applyInPandasWithState(
        _update_host_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def write_batch(df, batch_id: int) -> None:
        df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out_dir)

    q = (
        updated.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def latest_host_stats(spark: SparkSession, out_dir: str):
    """Latest counter row per host from the emitted update log."""
    from pyspark.sql import Window

    log = spark.read.parquet(out_dir)
    w = Window.partitionBy("host").orderBy(F.desc("batch_id"), F.desc("pages"))
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "batch_id")
    )
