"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exact baseline (pure built-in expressions:
``zip_with`` + ``aggregate`` — JVM-side, no Python), and a random-
hyperplane-LSH bucketed variant as the scale path (bucket join instead of
the O(n·q) cross product).

Scale notes: at 10^9+ vectors the brute-force path is only for reranking
within buckets; the LSH variant's bucket join shuffles each side once on
the bucket key and broadcast-joins the (tiny) query set.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame, query_id: int, k: int = 10, vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k neighbors of one vector.

    Plan: broadcast the single query row → map-side cosine → top-k via
    orderBy+limit (Catalyst plans TakeOrderedAndProject — no full sort).
    """
    q = embeddings.filter(F.col("vec_id") == query_id).select(
        F.col(vec_col).alias("q_vec")
    )
    scored = (
        embeddings.filter(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col(vec_col), F.col("q_vec")), 6).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float, vec_col: str = "embedding"
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact; for oracle-checkable test
    scale — the LSH variant below is the web-scale path)."""
    e = embeddings.select("vec_id", vec_col)
    a = e.select(F.col("vec_id").alias("id_a"), F.col(vec_col).alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    return np.random.RandomState(seed).randn(n_planes, dim)


def lsh_bucket_col(vec_col: Column, planes: np.ndarray) -> Column:
    """Random-hyperplane signature as an int bucket (sign bits packed)."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array([F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec_col, plane) >= 0, 1).otherwise(0)
        bucket = bucket + bit * F.lit(1 << i)
    return bucket


def embedding_near_dup_lsh(
    embeddings: DataFrame,
    threshold: float,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs via random-hyperplane bucketing — the web-scale path:
    candidates share a signature bucket (high-cosine pairs collide with
    probability (1 - θ/π)^n_planes), exact cosine verifies. Recall < 1 by
    construction; the exact variant (embedding_near_dup_pairs) is the
    test-scale oracle.
    """
    planes = _hyperplanes(dim, n_planes)
    b = embeddings.select("vec_id", vec_col).withColumn(
        "bucket", lsh_bucket_col(F.col(vec_col), planes)
    )
    x = b.select(
        F.col("vec_id").alias("id_a"), F.col(vec_col).alias("va"), "bucket"
    )
    y = b.select(
        F.col("vec_id").alias("id_b"), F.col(vec_col).alias("vb"), "bucket"
    )
    cand = x.join(y, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return cand.select(
        "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)


def lsh_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates share the query's hyperplane bucket, exact
    cosine rerank within the bucket. Recall < 1 by construction (ANN)."""
    planes = _hyperplanes(dim, n_planes)
    bucketed = embeddings.withColumn("bucket", lsh_bucket_col(F.col(vec_col), planes))
    q = bucketed.filter(F.col("vec_id") == query_id).select(
        F.col("bucket").alias("q_bucket"), F.col(vec_col).alias("q_vec")
    )
    cand = (
        bucketed.join(F.broadcast(q), F.col("bucket") == F.col("q_bucket"))
        .filter(F.col("vec_id") != query_id)
        .select(
            "vec_id",
            F.round(cosine(F.col(vec_col), F.col("q_vec")), 6).alias("cos_sim"),
        )
    )
    return cand.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)
