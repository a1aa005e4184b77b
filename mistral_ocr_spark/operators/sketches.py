"""Frequency / cardinality sketches for corpus statistics — the "novel
sketch" family of the training-data brief, built so every expensive stage
is bounded regardless of corpus size.

- ``heavy_hitters`` — EXACT frequent-item counts via the two-pass
  Misra-Gries scheme (Misra & Gries 1982; mergeability per Agarwal et al.,
  "Mergeable Summaries", PODS 2012): pass 1 runs an MG(k) summary inside
  each partition (bounded memory, one Arrow batch stream) and shuffles at
  most partitions × k candidate rows — NOT the full distinct-item
  universe; pass 2 exactly recounts the candidate set. Guarantee: an item
  with global frequency > n/k undercounts by at most n_p/k within each
  partition, so its summed lower bound stays positive and it MUST surface
  in some summary — with ``k = ceil(2/threshold)`` no item at or above the
  threshold can be missed, and the recount makes reported counts exact
  (no sketch error reaches the caller).
- ``approx_distinct`` — HyperLogLog++ cardinality (Spark's built-in
  ``approx_count_distinct``) with the relative-error knob surfaced; the
  constant-memory alternative to ``count_distinct`` for 10^12-row columns.

Reference parity note: stevegsax/mistral-ocr has no sketch operators; this
is training-data-pipeline surface (corpus vocabulary statistics, stopword
discovery, boilerplate-token detection at crawl scale).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition_fn(k: int, col: str):
    """pandas-batch Misra-Gries: one MG(k) counter table per PARTITION
    (state carried across the partition's Arrow batches), emitted as
    (item, lower-bound count) rows when the partition ends."""
    import pandas as pd

    def fn(batches):
        counters: dict = {}
        for pdf in batches:
            for item in pdf[col]:
                if item is None:
                    continue
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all step; drop zeros (classic MG)
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {"item": list(counters.keys()), "lb": list(counters.values())}
            )

    return fn


def heavy_hitters(
    df: DataFrame,
    col: str,
    threshold_frac: float = 0.001,
    id_col: str | None = None,
) -> DataFrame:
    """All items of ``col`` whose frequency is ≥ ``threshold_frac`` of the
    total item count, with EXACT counts — ``(item, freq, frac)`` ordered
    nowhere (caller sorts).

    Two passes over the data, both bounded:

    1. candidate generation: per-partition MG(k) with k = ceil(2/threshold)
       → at most partitions × k rows shuffle (a few thousand per
       partition), never the distinct-item universe;
    2. exact recount: the item stream filtered to the candidate set
       (broadcast — candidates ≤ partitions × k by construction) and
       hash-aggregated, plus one scalar count for the denominator.

    The MG guarantee (undercount ≤ n_p/k per partition) plus
    k = ceil(2/threshold) means NO true heavy hitter can be absent from
    the candidate set; false candidates are eliminated by the exact
    recount, so the output is exactly the items at or above the threshold.
    """
    if not (0 < threshold_frac <= 1):
        raise ValueError(f"threshold_frac must be in (0, 1], got {threshold_frac}")
    k = max(2, math.ceil(2.0 / threshold_frac))
    from pyspark.sql import types as T

    items = df.select(F.col(col).alias("_item")).filter(F.col("_item").isNotNull())
    schema = T.StructType(
        [
            T.StructField("item", df.schema[col].dataType),
            T.StructField("lb", T.LongType()),
        ]
    )
    cand = (
        items.withColumnRenamed("_item", "_i")
        .select(F.col("_i").alias(col))
        .mapInPandas(_mg_partition_fn(k, col), schema)
        .select("item")
        .distinct()
    )
    n_total = items.agg(F.count(F.lit(1)).alias("_n"))
    counts = (
        items.join(F.broadcast(cand), items["_item"] == cand["item"])
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    return (
        counts.crossJoin(F.broadcast(n_total))
        .filter(F.col("freq") >= F.col("_n") * threshold_frac)
        .select(
            "item",
            "freq",
            F.round(F.col("freq") / F.col("_n"), 6).alias("frac"),
        )
    )


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.02) -> DataFrame:
    """HyperLogLog++ distinct count of ``col`` as a one-row DataFrame
    ``(approx_distinct)`` — constant memory per partition, mergeable
    map-side, relative standard deviation ``rsd`` (Spark builtin)."""
    return df.agg(
        F.approx_count_distinct(col, rsd).cast("bigint").alias("approx_distinct")
    )
