"""BPE trainer/encoder: the paper's worked example, equivalence with a
naive recount-from-scratch reference, encode round-trips, and
parallelism determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mistral_ocr_spark.operators import tokenizer as TK


# --- independent naive reference (recount from scratch each iteration) ----

def _naive_merges(freqs, n_merges):
    words = {i: (tuple(w) + (TK.END,), c) for i, (w, c) in enumerate(freqs)}
    merges = []
    for _ in range(n_merges):
        pc = {}
        for sym, c in words.values():
            for p in zip(sym, sym[1:]):
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        for i, (sym, c) in list(words.items()):
            new, j = [], 0
            while j < len(sym):
                if j + 1 < len(sym) and (sym[j], sym[j + 1]) == best:
                    new.append(joined)
                    j += 2
                else:
                    new.append(sym[j])
                    j += 1
            words[i] = (tuple(new), c)
    return merges


def _naive_encode(word, merges):
    sym = list(word) + [TK.END]
    for a, b in merges:  # apply merges in rank order, repeatedly per rank
        out, j = [], 0
        while j < len(sym):
            if j + 1 < len(sym) and sym[j] == a and sym[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(sym[j])
                j += 1
        sym = out
    return sym


PAPER = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_paper_example_first_merges():
    """Sennrich et al. §3.2 worked example: es → est → est</w> lead."""
    m = TK.learn_merges(PAPER, 5)
    assert m[0] == ("e", "s")
    assert m[1] == ("es", "t")
    assert m[2] == ("est", TK.END)


def test_incremental_equals_naive_reference():
    freqs = [
        ("the", 50), ("theme", 7), ("then", 9), ("aaaa", 4), ("aaab", 3),
        ("banana", 6), ("bandana", 2), ("a", 11), ("ab", 5), ("ba", 5),
        ("mississippi", 3), ("miss", 4), ("issue", 2),
    ]
    assert TK.learn_merges(freqs, 40) == _naive_merges(freqs, 40)


def test_repeated_pair_words_counted_per_occurrence():
    # 'aaaa' contributes THREE (a,a) occurrences x count
    m = TK.learn_merges([("aaaa", 2), ("bc", 5)], 1)
    assert m[0] == ("a", "a")  # 6 occurrences beat (b,c)=5


def test_encode_round_trips_and_matches_naive():
    freqs = [("hello", 4), ("help", 3), ("hull", 2), ("lope", 1)]
    merges = TK.learn_merges(freqs, 12)
    for w in ["hello", "help", "hull", "lope", "unseenword", "h"]:
        toks = TK.encode_word(w, {p: i for i, p in enumerate(merges)})
        assert "".join(toks) == w + TK.END  # lossless
        assert toks == _naive_encode(w, merges)


def test_more_merges_never_lengthen():
    ranks10 = {p: i for i, p in enumerate(TK.learn_merges(PAPER, 10))}
    ranks3 = {p: i for i, p in enumerate(TK.learn_merges(PAPER, 3))}
    for w, _ in PAPER:
        assert len(TK.encode_word(w, ranks10)) <= len(TK.encode_word(w, ranks3))


def test_train_bpe_distributed_matches_driver_side(spark):
    rows = [
        (1, "the quick brown fox the lazy dog the end"),
        (2, "quick quick brown foxes run"),
        (3, "lazy dogs and lazy foxes"),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = TK.train_bpe(df, 20, max_words=1000)
    freqs = {}
    for _, t in rows:
        for w in (t or "").split():
            freqs[w] = freqs.get(w, 0) + 1
    # truncation order: count desc, word asc
    fl = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == _naive_merges(fl, 20)


def test_truncation_is_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 3} common") for i in range(100)],
        "doc_id long, text string",
    )
    a = TK.train_bpe(df.repartition(1), 15, max_words=5)
    b = TK.train_bpe(df.repartition(9), 15, max_words=5)
    assert a == b


def test_bpe_encode_dataframe_and_model_persistence(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "banana band"), (2, "banana"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    merges = TK.train_bpe(df, 10)
    path = str(tmp_path / "bpe_model")
    TK.save_bpe(spark, merges, path)
    assert TK.load_bpe(spark, path) == merges
    out = {r.doc_id: r for r in TK.bpe_encode(df, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    want1 = TK.encode_word("banana", ranks) + TK.encode_word("band", ranks)
    assert out[1].tokens == want1 and out[1].n_bpe == len(want1)
    assert out[3].tokens == [] and out[4].tokens == []


def test_encode_deterministic_across_parallelism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    merges = TK.train_bpe(docs.filter(F.col("doc_id") < 50), 30)
    subset = docs.filter(F.col("doc_id") < 100)
    a = sorted(
        (r.doc_id, tuple(r.tokens))
        for r in TK.bpe_encode(subset.repartition(1), merges).collect()
    )
    b = sorted(
        (r.doc_id, tuple(r.tokens))
        for r in TK.bpe_encode(subset.repartition(8), merges).collect()
    )
    assert a == b


def test_unicode_whitespace_train_encode_agreement(spark):
    """NBSP is NOT a word boundary for Java \\s+; the encoder must agree:
    'a\\u00a0b' stays ONE word in both the frequency table and the encode
    kernel (the train/encode split-mismatch regression)."""
    text = "a b a b c"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    wc = {r.word: r.cnt for r in TK.word_counts(df).collect()}
    assert wc == {"a b": 2, "c": 1}
    merges = TK.train_bpe(df, 8)
    out = TK.bpe_encode(df, merges).collect()[0]
    assert "".join(out.tokens) == f"a b{TK.END}a b{TK.END}c{TK.END}"


def test_bpe_encode_string_id_column(spark):
    """ADVICE r5: the output schema derives the id field's type from the
    input (a hardcoded bigint broke the url-keyed LM CLI flow)."""
    from mistral_ocr_spark.operators import tokenizer as TK

    df = spark.createDataFrame(
        [("https://a.example/x", "low lower lowest")],
        "url string, text string",
    )
    merges = TK.train_bpe(df, 5)
    out = TK.bpe_encode(df, merges, id_col="url").collect()
    assert out[0].url == "https://a.example/x" and out[0].n_bpe > 0
