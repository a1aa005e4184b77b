"""Custom stateful streaming operator on the Spark 4 ``transformWithState``
API: the successor to ``applyInPandasWithState`` (SPARK-40434 → SPARK-46815
"arbitrary stateful processing v2") with typed state handles, timers, and
RocksDB-backed state.

Same semantics as streaming/stateful.py (per-host cumulative crawl
counters, state surviving restarts via the checkpoint) so the two APIs are
cross-checked against each other AND against the batch groupBy in
tests/test_streaming.py — the engine supports whichever API a user's Spark
version prefers.

Environmental note: Spark's transform_with_state driver worker speaks a
protobuf wire format to the JVM (``google.protobuf`` import at runtime);
in environments without a protobuf wheel (this sandbox) the v2 stream
fails at initialization and the test skips — the applyInPandasWithState
variant provides the always-available path with identical semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from mistral_ocr_spark.sources.tables import PAGES_SCHEMA

OUTPUT_SCHEMA = "host string, pages long, bytes long"
STATE_SCHEMA = "pages long, bytes long"


class HostStatsProcessor(StatefulProcessor):
    """Running (pages, bytes) per host in a typed ValueState handle."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counters = handle.getValueState("counters", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        pages, nbytes = self._counters.get() if self._counters.exists() else (0, 0)
        for pdf in rows:
            pages += len(pdf)
            nbytes += int(pdf["size"].fillna(0).sum())
        self._counters.update((pages, nbytes))
        yield pd.DataFrame({"host": [key[0]], "pages": [pages], "bytes": [nbytes]})

    def close(self) -> None:
        pass


def host_stats_stream_v2(
    spark: SparkSession, pages_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """transformWithStateInPandas version of stateful.host_stats_stream:
    AvailableNow trigger, update-mode emission into a parquet batch log,
    exactly-once counter accumulation across restarts. Requires the RocksDB
    state store (bundled with Spark; set per-session below)."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    keyed = pages.select(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.octet_length(F.col("html")).cast("long").alias("size"),
    )
    updated = keyed.groupBy("host").transformWithStateInPandas(
        statefulProcessor=HostStatsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
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
