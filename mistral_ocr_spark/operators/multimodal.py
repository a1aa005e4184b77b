"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Real in this module: the Spark-side schema, partitioning, Arrow batch
shape, and the ``mapInPandas`` feature-extraction contract. STUBBED (this
container has no image/audio codecs): the actual pixel/sample decode —
``decode_image`` raises ``NotImplementedError`` unless the deterministic
fake decoder is selected, which derives metadata purely from the bytes so
tests/oracles stay exact.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("content_md5", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real decode path — requires an image codec library.

    STUB: not available in this container. The Spark plumbing around it
    (batching, schema, partitioning) is real and tested with the fake
    decoder below.
    """
    raise NotImplementedError("no image codec in this environment; use fake_decode")


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decoder: (width, height) derived from the bytes.

    Matches the arithmetic the DuckDB oracle uses, so the whole mapInPandas
    path is value-checkable end-to-end.
    """
    n = len(payload)
    return (n % 640) + 16, (n % 480) + 16


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        dims = [fake_decode(p) for p in payloads]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "byte_len": [len(p) for p in payloads],
                "content_md5": [hashlib.md5(p).hexdigest() for p in payloads],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """media(media_id, kind, payload, meta) → per-item features.

    One JVM→Python crossing per Arrow batch; payloads stream through in
    bounded batches (arrow.maxRecordsPerBatch), never materialized per
    partition.
    """
    return media.select("media_id", "payload").mapInPandas(
        _feature_batches, FEATURES_SCHEMA
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents (text bytes as payload) —
    the fixture path; at production the payload column comes from WARC."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )
