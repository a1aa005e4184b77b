"""ExactSubstr duplicated-span removal vs an independent pure-Python
ground truth implementing the identical rule (Lee et al. 2022 §4.1,
word-token variant)."""

from __future__ import annotations

import random
import re

import pytest

from pyspark.sql import functions as F

from mistral_ocr_spark.operators.dedup import exact_substring_dedup

# ASCII \s class — matches dsir.words_expr's Java \s+ split; Python's \s
# is Unicode-aware and would diverge on NBSP-style whitespace
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _gt(docs: dict[int, str | None], k: int) -> dict[int, tuple[str, int, int]]:
    words = {
        d: [w for w in _WS.split(t or "") if w] for d, t in docs.items()
    }
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for d in sorted(words):
        ws = words[d]
        for i in range(len(ws) - k + 1):
            occ.setdefault(tuple(ws[i : i + k]), []).append((d, i))
    covered: dict[int, set[int]] = {d: set() for d in words}
    for sites in occ.values():
        if len(sites) < 2:
            continue
        winner = min(sites)
        for d, i in sites:
            if (d, i) != winner:
                covered[d].update(range(i, i + k))
    out = {}
    for d, ws in words.items():
        if not covered[d]:
            # untouched docs keep their ORIGINAL text byte-for-byte
            out[d] = (docs[d] or "", len(ws), 0)
            continue
        keep = [w for j, w in enumerate(ws) if j not in covered[d]]
        out[d] = (" ".join(keep), len(keep), len(ws) - len(keep))
    return out


def _corpus() -> dict[int, str | None]:
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(24)]
    shared = " ".join(rng.choice(vocab) for _ in range(14))  # > k
    rep = " ".join(rng.choice(vocab) for _ in range(12))
    docs: dict[int, str | None] = {}
    for d in range(12):
        body = " ".join(rng.choice(vocab) for _ in range(rng.randint(25, 60)))
        docs[d] = body
    # shared passage planted mid-document in three docs
    for d in (1, 4, 7):
        ws = docs[d].split()
        cut = rng.randint(3, len(ws) - 3)
        docs[d] = " ".join(ws[:cut]) + " " + shared + " " + " ".join(ws[cut:])
    # internal repetition inside one doc
    docs[2] = rep + " " + docs[2] + " " + rep
    # identical SHORT docs: below k words, must be untouched
    docs[20] = "tiny doc alpha beta"
    docs[21] = "tiny doc alpha beta"
    # empty / NULL anchors
    docs[22] = ""
    docs[23] = None
    return docs


def _run(spark, docs, k, parallelism=4):
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    ).repartition(parallelism)
    rows = exact_substring_dedup(df, k=k).collect()
    return {
        r["doc_id"]: (r["text"], r["n_words_kept"], r["n_words_dropped"])
        for r in rows
    }


def test_matches_python_ground_truth(spark):
    docs = _corpus()
    k = 10
    got = _run(spark, docs, k)
    want = _gt(docs, k)
    assert set(got) == set(want)  # one row per input doc, incl. empty/NULL
    assert got == want


def test_planted_semantics(spark):
    """Spot-checks of the rule itself, independent of the ground-truth
    harness: winner keeps its copy, short identical docs untouched."""
    docs = _corpus()
    k = 10
    got = _run(spark, docs, k)
    # doc 1 is min(doc_id) among the shared-passage sites → winner: keeps
    # every word; docs 4 and 7 lose at least the 14-word passage
    assert got[1][2] == 0
    assert got[4][2] >= 14 and got[7][2] >= 14
    # identical 4-word docs are below k → never touched here
    assert got[20] == ("tiny doc alpha beta", 4, 0)
    assert got[21] == ("tiny doc alpha beta", 4, 0)
    assert got[22] == ("", 0, 0)
    assert got[23] == ("", 0, 0)


def test_random_fuzz_small_vocab(spark):
    """Tiny vocab + small k forces dense window collisions — the
    adversarial regime for run-merging and winner selection."""
    rng = random.Random(1234)
    vocab = ["a", "b", "c"]
    docs = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))
        for d in range(30)
    }
    k = 3
    assert _run(spark, docs, k) == _gt(docs, k)


def test_deterministic_across_parallelism(spark):
    docs = _corpus()
    a = _run(spark, docs, 10, parallelism=2)
    b = _run(spark, docs, 10, parallelism=16)
    assert a == b


def test_untouched_docs_keep_original_whitespace(spark):
    """Docs that lose no words must come back byte-identical — reassembly
    whitespace-normalizing EVERY doc was a review catch."""
    raw = "alpha\tbeta\n\ngamma  delta"
    docs = {1: raw, 2: "other words entirely here"}
    got = _run(spark, docs, 3)
    assert got[1] == (raw, 4, 0)


def test_window_kernel_evaluates_once_per_branch(spark):
    """The O(n·k) slice-hash kernel must not appear in the returned plan
    AT ALL (r6: the occurrence stream is materialized to scratch before
    the plan branches, so the kernel runs exactly once inside that write
    — the dup-key aggregate and the join-back both read the scratch);
    any `split(` in the plan means the word kernel escaped the words
    scratch materialization too."""
    df = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    plan = (
        exact_substring_dedup(df, k=2)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("slice(") == 0
    # the anchor branch projects only (id, text) from the raw source;
    # every consumer of the words array reads the scratch parquet, so
    # the regex split kernel must not appear in the returned plan at all
    assert plan.count("split(") == 0


def test_k_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        exact_substring_dedup(df, k=1)
