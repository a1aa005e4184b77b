"""Streaming metrics: watermarked tumbling-window aggregation.

The batch pipeline's lineage counters (A1/A2) re-expressed as a streaming
view: events (or per-page extraction metrics) arrive as files, and a
watermark bounds how late a row may be while state stays bounded — the
standard Structured Streaming shape for rate/volume dashboards over a
long-running extraction fleet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_event_counts(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Count events per (window, event_type) with a late-data watermark;
    processes everything currently available, then stops (AvailableNow).
    Append mode: a window emits once its watermark passes — exactly the
    bounded-state behavior needed on an unbounded crawl-metrics stream."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def batch_event_counts(spark: SparkSession, events: DataFrame, window: str = "1 hour") -> DataFrame:
    """The batch-equivalent aggregation (for cross-checking the stream)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
