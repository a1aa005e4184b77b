"""Deduplication operators for a large-scale training-data pipeline.

Exact (hash-groupBy), exact n-gram Jaccard (distributed shingle join),
MinHash+LSH (banded candidate generation + exact verification), and
SimHash (bit-band blocking + JVM-side hamming verification).

Scale notes (the 100 TB design point):
- The shingle join carries an optional ``max_df`` document-frequency cut:
  shingles occurring in more than ``max_df`` documents are dropped before
  the join (stopword-shingles otherwise explode the join at web scale).
- MinHash/SimHash signatures are computed in *one* Arrow-batched pandas
  pass (numpy inside); candidate pairs then verify with built-in array /
  bit functions — the expensive O(n²) work never touches Python.
- All hash functions are explicitly seeded/fixed — signatures are
  deterministic across executors, which resume/idempotency depends on.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MERSENNE = (1 << 61) - 1
_MAX32 = (1 << 32) - 1


def _perm_params(num_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rs = np.random.RandomState(seed)
    a = rs.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    b = rs.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Group identical (whitespace-normalized) texts; keep min key as the
    representative. Pure hash aggregation: map-side partial agg for free."""
    norm = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return (
        docs.select(F.col(key_col), F.md5(norm).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(key_col).alias("keeper_id"),
            F.count(F.lit(1)).cast("bigint").alias("dup_count"),
        )
    )


# ---------------------------------------------------------------------------
# word-3-gram shingles + exact Jaccard via distributed shingle join
# ---------------------------------------------------------------------------

def with_shingles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct word-3-gram shingle array per doc (built-in array exprs)."""
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.greatest(F.size(w) - 2, F.lit(1))
    tri = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(
            " ", F.element_at(w, i), F.element_at(w, i + 1), F.element_at(w, i + 2)
        ),
    )
    return docs.withColumn("shingles", F.array_distinct(tri))


def jaccard_pairs_exact(
    docs: DataFrame,
    threshold: float,
    key_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """All pairs with word-3-gram Jaccard ≥ threshold — exact algorithm.

    Plan shape: explode shingles → (optional df-cut) → self-join on shingle
    → count shared per pair → jaccard filter. Only pairs sharing ≥1
    shingle are ever materialized (never the O(n²) cross product).
    """
    sh = with_shingles(docs, text_col).select(
        F.col(key_col).alias("id"), "shingles", F.size("shingles").alias("n_sh")
    )
    ex = sh.select("id", "n_sh", F.explode("shingles").alias("shingle"))
    if max_df is not None:
        hot = ex.groupBy("shingle").count().filter(F.col("count") > max_df)
        ex = ex.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    a = ex.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), "shingle")
    b = ex.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return pairs.select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_batch_fn(num_hashes: int):
    a, b = _perm_params(num_hashes)

    def fn(batches):
        for pdf in batches:
            sigs = []
            for hashes in pdf["sh_hash"]:
                if len(hashes) == 0:
                    sigs.append([int(_MAX32)] * num_hashes)
                    continue
                # shingle hashes arrive pre-computed (JVM xxhash64);
                # fold signed int64 → uint64, then per-permutation min
                base = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
                m = (np.outer(base, a) + b) % _MERSENNE
                sigs.append((m.min(axis=0) & _MAX32).astype(np.int64).tolist())
            yield pd.DataFrame({"id": pdf["id"], "sig": sigs})

    return fn


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 64, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, sig: array<bigint>[num_hashes]) via one Arrow-batched pass.

    Shingle *string* hashing runs JVM-side (``xxhash64`` inside a
    ``transform`` — whole-stage codegen); Python only does the numpy
    permutation/min reduction over the pre-hashed int64 array.
    """
    sh = with_shingles(docs, text_col).select(
        F.col(key_col).alias("id"),
        F.transform("shingles", lambda s: F.xxhash64(s)).alias("sh_hash"),
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )
    return sh.mapInPandas(_minhash_batch_fn(num_hashes), schema)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float,
    num_hashes: int = 64,
    bands: int = 32,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs ≥ threshold: LSH banding for candidates, then exact
    word-3-gram Jaccard verification (so output = exact answer set, with
    recall governed by the band/row choice: P[miss | s=0.6, 32 bands of 2]
    ≈ (1-0.36)^32 < 1e-6).
    """
    rows = num_hashes // bands
    # Signatures feed three plan branches (banding, est-prefilter a/b);
    # persist so the mapInPandas minhash kernel runs once, not 3-4 times.
    # At production scale this would be an explicit signatures table.
    sigs = minhash_signatures(docs, num_hashes, key_col, text_col).persist()
    band_cols = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda i: F.struct(
                i.alias("band"),
                F.xxhash64(F.concat_ws("_", F.slice(F.col("sig"), i * rows + 1, rows)), i).alias(
                    "bucket"
                ),
            ),
        )
    )
    buckets = sigs.select("id", band_cols.alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    # Signature-estimate prefilter: E[matching minhash components] = true
    # Jaccard, so pairs whose estimate sits far below the threshold are cut
    # before the (expensive) exact-verification join. The 0.2 margin keeps
    # the miss probability negligible (Hoeffding: exp(-2·64·0.2²) < 0.6%,
    # and only for pairs sitting exactly at the threshold).
    est_margin = 0.2
    sig_a = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sig_b = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    ) / F.lit(num_hashes)
    cand = (
        cand.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .filter(est >= threshold - est_margin)
        .select("id_a", "id_b")
    )
    sh = with_shingles(docs, text_col).select(
        F.col(key_col).alias("id"), "shingles"
    ).persist()  # joined twice (a-side and b-side)
    verified = (
        cand.join(sh.withColumnRenamed("shingles", "sh_a"), cand.id_a == sh.id)
        .drop("id")
        .join(
            sh.withColumnRenamed("shingles", "sh_b").withColumnRenamed("id", "id2"),
            F.col("id_b") == F.col("id2"),
        )
        .drop("id2")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.size("sh_a") + F.size("sh_b") - inter)
    return verified.select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _word_hash64(w: str) -> int:
    b = w.encode("utf-8")
    return zlib.crc32(b) | (zlib.crc32(b + b"\x01") << 32)


def _simhash_batch_fn():
    def fn(batches):
        for pdf in batches:
            out = []
            for text in pdf["text"]:
                words = text.split()
                acc = np.zeros(64, dtype=np.int64)
                shifts = np.arange(64, dtype=np.uint64)
                for w in words:
                    h = np.uint64(_word_hash64(w))
                    bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
                    acc += np.where(bits == 1, 1, -1)
                sig = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
                out.append(sig - (1 << 63))  # store as signed int64
            yield pd.DataFrame({"id": pdf["id"], "simhash": out})

    return fn


def simhash_signatures(docs: DataFrame, key_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("simhash", T.LongType())]
    )
    return docs.select(
        F.col(key_col).alias("id"), F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")).alias("text")
    ).mapInPandas(_simhash_batch_fn(), schema)


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 6, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Pairs with simhash hamming distance ≤ max_hamming.

    Blocking: 8 bands of 8 bits — any pair within hamming 6 agrees on ≥2
    bands (pigeonhole), so band-equality candidates have recall 1. The
    hamming check itself is ``bit_count(a XOR b)`` — JVM built-in.
    """
    sigs = simhash_signatures(docs, key_col, text_col)
    band = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright(F.col("simhash"), i * 8)
                    .bitwiseAND(F.lit(255))
                    .alias("bucket"),
                )
                for i in range(8)
            ]
        )
    )
    buckets = sigs.select("id", "simhash", band.alias("bb")).select(
        "id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.simhash").alias("sh_a"),
            F.col("y.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", ham.cast("int").alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# ---------------------------------------------------------------------------
# fixture augmentation: guaranteed near-dups (shared with the oracle SQL)
# ---------------------------------------------------------------------------

def augmented_docs(docs: DataFrame, id_offset: int = 100000) -> DataFrame:
    """documents ∪ copies with the last word dropped (doc_id + offset) —
    deterministic true-positive near-dups, expressible in ANSI SQL so the
    DuckDB oracle builds the identical input."""
    pert = docs.select(
        (F.col("doc_id") + id_offset).alias("doc_id"),
        F.regexp_replace(F.col("text"), r"\s+\S+$", "").alias("text"),
    )
    return docs.select("doc_id", "text").unionAll(pert)
