"""Sweep signature_rerank_topk's hamming threshold on a CLUSTERED fixture
(VERDICT r3 #4: the default n_planes/2-1 keeps ~half of a uniform corpus;
pick the smallest default with recall >= 0.95 where ANN is actually used —
corpora with planted near-dup structure).

Fixture: the sf embeddings corpus plus one deterministically-perturbed copy
per vector (cos(v, v') swept over [0.92, 0.99] — the
tests/test_dedup_similarity.py::_perturbed_embeddings construction), so
every query has a true near neighbor and the corpus has genuine cluster
structure. For each threshold t we report, averaged over query points:

- recall@10 vs exact brute force (numpy, same arithmetic as the operator's
  rounded-cosine ordering)
- survivor fraction: |{ham <= t}| / n — the share of the corpus whose FULL
  vector is fetched for the exact rerank (the cost knob)

The hamming arithmetic reuses the operator's own signature kernel
(plane_signatures → packed longs → XOR popcount), so the sweep measures the
shipped code path, not a reimplementation; one threshold is cross-checked
end-to-end through signature_rerank_topk itself.

Usage: python scripts/multiprobe_threshold_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N_PLANES = 128
DIM = 64
THRESHOLDS = [16, 21, 26, 32, 38, 42, 48, 56, 63]
N_QUERIES = 16


def perturbed_corpus(spark):
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    out = []
    for r in rows:
        v = np.asarray(r.embedding, dtype=np.float64)
        rs = np.random.RandomState(10_000 + r.vec_id)
        u = rs.randn(v.shape[0])
        u -= u.dot(v) / v.dot(v) * v
        u *= np.linalg.norm(v) / np.linalg.norm(u)
        cos_phi = 0.92 + 0.07 * (r.vec_id % 97) / 96.0
        vp = v * cos_phi + u * np.sqrt(1.0 - cos_phi**2)
        out.append((r.vec_id, [float(x) for x in v]))
        out.append((r.vec_id + 100000, [float(x) for x in vp]))
    return out


def main():
    from mistral_ocr_spark.operators import similarity as S
    from mistral_ocr_spark.session import get_spark

    spark = get_spark(app_name="multiprobe-sweep", master="local[8]")
    corpus = perturbed_corpus(spark)
    df = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")

    sig_rows = S.plane_signatures(
        df, S._hyperplanes(DIM, N_PLANES), "embedding"
    ).collect()
    ids = np.array([r.vec_id for r in sig_rows])
    sigs = np.array([r.sig for r in sig_rows], dtype=np.uint64)

    V = np.array([corpus[i][1] for i in range(len(corpus))], dtype=np.float64)
    vid = np.array([corpus[i][0] for i in range(len(corpus))])
    order = np.argsort(vid)
    V, vid = V[order], vid[order]
    sid_order = np.argsort(ids)
    sigs, ids = sigs[sid_order], ids[sid_order]
    assert (ids == vid).all()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)

    qids = [int(vid[i]) for i in range(0, 2 * N_QUERIES, 2)][:N_QUERIES]
    n = len(vid)
    recalls = {t: [] for t in THRESHOLDS}
    twin_recalls = {t: [] for t in THRESHOLDS}
    survivors = {t: [] for t in THRESHOLDS}
    for q in qids:
        qi = int(np.where(vid == q)[0][0])
        cos = np.round(Vn @ Vn[qi], 6)
        cos[qi] = -2
        exact = set(vid[np.lexsort((vid, -cos))[:10]])
        ham = np.zeros(n, dtype=np.int64)
        for g in range(sigs.shape[1]):
            ham += np.vectorize(lambda x: bin(x).count("1"))(
                (sigs[:, g] ^ sigs[qi, g]).astype(np.int64)
            )
        ham[qi] = 10**9
        for t in THRESHOLDS:
            surv = ham <= t
            survivors[t].append(surv.sum() / n)
            cand = np.where(surv)[0]
            cos_c = cos[cand]
            top = set(vid[cand[np.lexsort((vid[cand], -cos_c))[:10]]])
            recalls[t].append(len(exact & top) / 10)
            # the clustered-corpus design point: is the planted near-dup
            # (cos 0.92-0.99, the only GENUINE neighbor) retrieved?
            twin_recalls[t].append(1.0 if (q + 100000) in top else 0.0)

    print(f"\nfixture: {SF} + perturbed twins (n={n}), "
          f"{N_PLANES} planes, {N_QUERIES} queries")
    print("| max_hamming | twin recall (cos .92-.99) | recall@10 (incl. "
          "cos~0.3 background) | survivor frac |")
    print("|---|---|---|---|")
    for t in THRESHOLDS:
        print(
            f"| {t} | {np.mean(twin_recalls[t]):.3f} | {np.mean(recalls[t]):.3f} "
            f"| {np.mean(survivors[t]):.4f} |"
        )

    # end-to-end cross-check of one mid threshold through the operator
    t_check = 42
    q = qids[0]
    op_rows = S.signature_rerank_topk(
        df, query_id=q, k=10, max_hamming=t_check
    ).collect()
    qi = int(np.where(vid == q)[0][0])
    cos = np.round(Vn @ Vn[qi], 6)
    ham = np.zeros(n, dtype=np.int64)
    for g in range(sigs.shape[1]):
        ham += np.vectorize(lambda x: bin(x).count("1"))(
            (sigs[:, g] ^ sigs[qi, g]).astype(np.int64)
        )
    mask = (ham <= t_check) & (vid != q)
    cand = np.where(mask)[0]
    want = [int(x) for x in vid[cand[np.lexsort((vid[cand], -cos[cand]))[:10]]]]
    got = [r.vec_id for r in op_rows]
    assert got == want, f"operator disagrees with sweep arithmetic: {got} vs {want}"
    print(f"operator cross-check at t={t_check}: OK (top-10 identical)")
    spark.stop()


if __name__ == "__main__":
    main()
