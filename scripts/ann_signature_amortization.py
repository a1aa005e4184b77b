"""Measure the signature-index amortization (VERDICT r3 #3): per-query cost
of signature_rerank_topk with the inline O(n) signature kernel vs reading a
persisted signature table (signature_index).

Corpus: 200k deterministic 64-dim vectors built from pure JVM expressions
(xxhash64-derived lanes — no Python, no RNG state), so the run is
reproducible and generation is excluded from timing. One warmed local[16]
session; best-of-3 per configuration; results asserted identical.

Usage: python scripts/ann_signature_amortization.py
Run in ISOLATION (nothing else on the box) — same protocol as bench.py.
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N = 200_000
DIM = 64
QUERIES = [1, 777, 123_456]


def main():
    from pyspark.sql import functions as F

    from mistral_ocr_spark.operators import similarity as S
    from mistral_ocr_spark.session import get_spark

    spark = get_spark(
        app_name="ann-sig-amortization", master="local[16]", shuffle_partitions=32
    )
    tmp = tempfile.mkdtemp(prefix="annsig-")
    emb_path = f"{tmp}/embeddings"
    lane = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda j: (
            F.pmod(F.xxhash64(F.col("id"), j), F.lit(1000)).cast("double") / 500.0 - 1.0
        ),
    )
    (
        spark.range(N)
        .repartition(32)
        .select(F.col("id").alias("vec_id"), lane.alias("embedding"))
        .write.mode("overwrite")
        .parquet(emb_path)
    )
    emb = spark.read.parquet(emb_path)
    emb.count()  # warm page cache

    def timed(fn, reps=3):
        best, out = 1e9, None
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            best = min(best, time.time() - t0)
        return best, out

    # warmup: one full inline query amortizes Python-worker spawn
    S.signature_rerank_topk(emb, query_id=0, k=10, max_hamming=40).collect()

    t_inline, r_inline = timed(
        lambda: [
            tuple(r)
            for q in QUERIES
            for r in S.signature_rerank_topk(
                emb, query_id=q, k=10, max_hamming=40
            ).collect()
        ]
    )

    t_build, idx = timed(
        lambda: S.signature_index(emb, f"{tmp}/sigs"), reps=1
    )
    t_cached, r_cached = timed(
        lambda: [
            tuple(r)
            for q in QUERIES
            for r in S.signature_rerank_topk(
                emb, query_id=q, k=10, max_hamming=40, sig_table=idx
            ).collect()
        ]
    )
    assert r_inline == r_cached, "cached path changed results"

    nq = len(QUERIES)
    print(f"corpus: {N} x {DIM}-dim vectors, {nq} queries, best-of-3 warm")
    print(f"inline kernel:  {t_inline:.2f} s total, {t_inline / nq:.2f} s/query")
    print(f"index build:    {t_build:.2f} s (one-off)")
    print(f"cached index:   {t_cached:.2f} s total, {t_cached / nq:.2f} s/query")
    print(f"per-query speedup: {t_inline / t_cached:.2f}x; "
          f"build amortizes after {t_build / max(t_inline - t_cached, 1e-9) * nq:.1f} queries")
    spark.stop()


if __name__ == "__main__":
    main()
