"""Language-ID marker-profile tests: each of the 12 profiled languages must
be detected on a plain sentence of its own function words, ties and
no-marker inputs must be deterministic, and the Spark formula must match
the generated DuckDB oracle on adversarial short inputs."""

from __future__ import annotations

import duckdb

from mistral_ocr_spark.operators import textstats as X

SAMPLES = {
    "en": "the cat and the dog sat of the mat and the rug",
    "de": "der hund und die katze und der vogel und die maus",
    "fr": "le chat et la souris et le chien et la maison",
    "es": "el perro que ladra y los gatos que duermen el dia",
    "pt": "uma casa e não os carros e uma rua e não os muros",
    "it": "il cane di casa che dorme il gatto di strada che corre",
    "nl": "het huis een boom van de straat het water een vogel van",
    "sv": "och han att hon det var och de att se det hus",
    "da": "og jeg ikke han og jeg ikke hun og jeg ikke de",
    "pl": "nie wiem się czy jest dom nie ma się co jest tu",
    "tr": "bir ev ve bu yol bir gün ve bu şehir bir an",
    "id": "yang besar dan kecil untuk kita yang lama dan baru untuk",
}


def test_twelve_language_profiles(spark):
    rows = [(lang, text) for lang, text in SAMPLES.items()]
    df = spark.createDataFrame(rows, ["expected", "text"])
    out = {r.expected: r.lang_pred for r in X.with_lang_id(df).collect()}
    assert out == {lang: lang for lang in SAMPLES}


def test_no_marker_is_und_and_ties_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "zxqv wklm brrt"), (2, ""), (3, "the der le")], ["doc_id", "text"]
    )
    got = {r.doc_id: r.lang_pred for r in X.with_lang_id(df).collect()}
    assert got[1] == "und" and got[2] == "und"
    # three-way tie resolves to the first language in dict order
    assert got[3] == "en"


def test_web_quality_signals_on_handcrafted_docs(spark):
    """Every signal checked against hand-computed values on docs built to
    hit both sides of each Gopher/repetition threshold."""
    # 60 words, 56 distinct, "the" twice, stopwords present -> passes both
    long_good = " ".join(f"word{i:02d}" for i in range(55)) + " the a of and the"
    short = "tiny doc of words"  # 4 words -> fails the 50-word floor
    repeaty = " ".join(["spam"] * 30 + ["the", "a"])  # one word dominates
    df = spark.createDataFrame(
        [(1, long_good), (2, short), (3, repeaty)], ["doc_id", "text"]
    )
    got = {r.doc_id: r.asDict() for r in X.web_quality_signals(df).collect()}

    g = got[1]
    assert g["n_words"] == 60
    assert 3.0 <= g["mean_word_len"] <= 10.0
    assert g["stop_hits"] == 5 and g["gopher_pass"] == 1
    # "the" appears 2x in 60 words; 59 distinct words
    assert abs(g["top_word_frac"] - 2 / 60) < 1e-6
    assert abs(g["dup_word_frac"] - (1 - 59 / 60)) < 1e-6
    assert g["rep_pass"] == 1
    s = got[2]
    assert s["n_words"] == 4 and s["gopher_pass"] == 0
    r = got[3]
    assert r["dup_word_frac"] > 0.6 and r["top_word_frac"] > 0.2 and r["rep_pass"] == 0
    assert r["top_word_frac"] == round(30 / 32, 6)


def test_lang_oracle_matches_on_adversarial_inputs(spark):
    """The generated SQL formula must agree with the Spark expression on
    short/accented/tie inputs, not just the driver corpus."""
    from mistral_ocr_spark.plans.queries import _lang_oracle

    texts = list(SAMPLES.values()) + ["", "the", "não se não", "der und le et"]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spark_out = {
        r.doc_id: r.lang_pred for r in X.with_lang_id(df).select("doc_id", "lang_pred").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, ?)" for i, _ in rows)
        + ") v(doc_id, text)",
        [t for _, t in rows],
    )
    duck_out = dict(con.execute(_lang_oracle()).fetchall())
    con.close()
    assert spark_out == duck_out


# ---------------------------------------------------------------------------
# BPE merge-fold totality (VERDICT r3 #5): the control-char guard makes the
# flattened-string replace fold exact BPE for ANY input, not just the
# printable-ASCII driver fixture.
# ---------------------------------------------------------------------------

ADVERSARIAL_TEXTS = [
    "the quick brown fox and the lazy dog",          # plain ASCII baseline
    "",                                               # empty
    "th\x01e and\x02 or \x13\x1f else",              # merge symbols IN the input
    "li\x00ne one\nline two\tand th\x0bree",         # NUL + whitespace controls
    "café naïve 你好 the of ing",  # accented + CJK
    "\x01\x02\x03\x04\x05",                           # nothing but symbols
    "emoji \U0001f600 mixed the and 123 !!! of",      # astral plane
    "  leading and trailing  ",
    "the" * 50,                                       # long merge cascade
    "a\x1fb\x1fc the\x1fof",                          # separator char itself
]


def _ref_bpe_counts(text):
    """Independent reference: per-segment symbol-list merging (no string
    replace anywhere) after the same control-char strip."""
    import re

    from mistral_ocr_spark.plans.queries import _BPE_MERGES, _BPE_PAT

    guarded = re.sub(r"[\x00-\x1f]", "", text)
    segs = re.findall(_BPE_PAT, guarded)
    total = 0
    for seg in segs:
        syms = list(seg)
        for pair, new in _BPE_MERGES:
            assert len(pair) == 2 and len(new) == 1
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
                    out.append(new)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        total += len(syms)
    return len(segs), total


def test_bpe_guard_total_on_adversarial_inputs(spark):
    """Spark fold == symbol-list reference == DuckDB fold on inputs
    containing the merge-symbol alphabet itself, NUL, the segment
    separator, CJK/astral Unicode, and empty strings."""
    import duckdb as _duck

    from mistral_ocr_spark.plans.queries import (
        _BPE_GUARD_SQL,
        _bpe_merged_count_sql,
        bpe_token_count_cols,
    )

    rows = [(i, t) for i, t in enumerate(ADVERSARIAL_TEXTS)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    n_pre, n_bpe = bpe_token_count_cols("text")
    got = {
        r.doc_id: (r.n_pre, r.n_bpe)
        for r in df.select("doc_id", n_pre.alias("n_pre"), n_bpe.alias("n_bpe")).collect()
    }

    want = {i: _ref_bpe_counts(t) for i, t in rows}
    assert got == want, f"spark fold != symbol-list reference: {got} vs {want}"

    con = _duck.connect()
    con.execute("CREATE TABLE documents(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    sql = (
        f"SELECT doc_id, len(regexp_extract_all({_BPE_GUARD_SQL}, "
        "'''s|''t|''re|''ve|''m|''ll|''d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+|\\s+')) "
        f"AS n_pre, {_bpe_merged_count_sql(_BPE_GUARD_SQL)} AS n_bpe FROM documents"
    )
    duck = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    con.close()
    assert duck == want, f"duckdb fold != reference: {duck} vs {want}"


def test_c4_line_rules_on_multiline_fixture(spark):
    """VERDICT r3 #9: the C4 line rules are real signals, exercised on a
    corpus that actually contains newlines — hand-computed expectations
    plus full-row agreement with the generated DuckDB oracle."""
    import duckdb as _duck

    from mistral_ocr_spark.plans.queries import _web_quality_oracle

    docs = [
        # 3 lines, all end in terminal punct, all >= 5 words -> c4_pass
        (1, "This is the first tidy sentence.\n"
            "Here is another proper line of prose!\n"
            "Does the third line also qualify for keeping?"),
        # nav-menu shaped: short lines, no punctuation -> fails both rules
        (2, "Home\nAbout us\nContact\nProducts\nLogin"),
        # mixed: 2 of 4 real lines end in punct, blank lines dropped
        (3, "A good long sentence that clearly terminates here.\n\n"
            "short stub\n"
            "Another complete thought with enough words in it.\n"
            "trailing fragment without end"),
        # single line, no newline at all (the driver-corpus shape)
        (4, "just one plain line of text with several words here"),
        (5, 'He said "stop".\nA quoted line can end in a quote mark."'),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.doc_id: r.asDict() for r in X.web_quality_signals(df).collect()}

    assert got[1]["n_lines"] == 3
    assert got[1]["punct_line_frac"] == 1.0
    assert got[1]["short_line_frac"] == 0.0
    assert got[1]["c4_pass"] == 1
    assert got[2]["n_lines"] == 5
    assert got[2]["punct_line_frac"] == 0.0
    assert got[2]["short_line_frac"] == 1.0
    assert got[2]["c4_pass"] == 0
    assert got[3]["n_lines"] == 4  # blank line dropped
    assert got[3]["punct_line_frac"] == 0.5
    assert got[3]["short_line_frac"] == 0.5
    assert got[3]["c4_pass"] == 1  # boundary: >= 0.5 and <= 0.5
    assert got[4]["n_lines"] == 1 and got[4]["punct_line_frac"] == 0.0
    assert got[5]["punct_line_frac"] == 1.0  # quote counts as terminal

    # full-row oracle agreement on the same multi-line corpus
    from mistral_ocr_spark.operators.textstats import web_quality_signals

    spark_rows = web_quality_signals(
        X.with_quality_score(df), carry_cols=["quality"]
    )
    cols = spark_rows.columns
    got_rows = sorted(
        tuple(f"{v:.6f}" if isinstance(v, float) else str(v) for v in r)
        for r in spark_rows.collect()
    )
    con = _duck.connect()
    con.execute("CREATE TABLE documents(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    res = con.execute(_web_quality_oracle())
    duck_cols = [c[0] for c in res.description]
    assert sorted(duck_cols) == sorted(cols)
    reorder = [duck_cols.index(c) for c in cols]
    want_rows = sorted(
        tuple(
            f"{r[i]:.6f}" if isinstance(r[i], float) else str(r[i]) for i in reorder
        )
        for r in res.fetchall()
    )
    con.close()
    assert got_rows == want_rows


def test_bm25_matches_duckdb_formula(spark):
    """BM25 top-k vs an independent DuckDB implementation of the identical
    formula (Okapi BM25, Lucene +1 idf smoothing) on the sf0.001 corpus."""
    import duckdb as _duck

    terms = ["merge", "sort", "window"]
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = [
        (r.doc_id, r.score)
        for r in X.bm25_topk(docs, terms, k=15).collect()
    ]
    con = _duck.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    tlist = ", ".join(f"'{t}'" for t in terms)
    want = con.execute(f"""
WITH w AS (SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
           FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM w GROUP BY 1),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, w, count(*) AS tf FROM w WHERE w IN ({tlist}) GROUP BY 1, 2),
dfq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
idf AS (SELECT w, ln((n - df + 0.5) / (df + 0.5) + 1.0) AS idf, avgdl FROM dfq, stats),
s AS (SELECT t.doc_id,
        round(sum(i.idf * (t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * d.dl / i.avgdl))), 6)
        AS score
      FROM tf t JOIN dl d USING (doc_id) JOIN idf i USING (w) GROUP BY 1)
SELECT doc_id, score FROM s ORDER BY score DESC, doc_id LIMIT 15""").fetchall()
    con.close()
    assert got == [(d, s) for d, s in want], f"{got[:3]} vs {want[:3]}"


def test_bm25_hand_computed_and_ordering(spark):
    """Tiny corpus with hand-checkable structure: a doc with more query-term
    hits outranks one with fewer; docs without any term never appear;
    shorter docs outrank longer ones at equal tf (length normalization)."""
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark filler"),
            (2, "spark filler filler filler filler filler filler filler"),
            (3, "spark filler filler filler"),
            (4, "nothing relevant here at all"),
        ],
        ["doc_id", "text"],
    )
    rows = X.bm25_topk(docs, ["spark"], k=10).collect()
    ids = [r.doc_id for r in rows]
    assert 4 not in ids
    assert ids[0] == 1            # highest tf wins
    assert ids.index(3) < ids.index(2)  # same tf=1, shorter doc ranks higher
    assert all(rows[i].score >= rows[i + 1].score for i in range(len(rows) - 1))


def test_bm25_index_prunes_partitions_and_matches(spark, tmp_path):
    """The indexed tier: identical top-k to the ad-hoc path, and the query's
    term-bucket filter reaches the postings scan as a PARTITION filter
    (storage-layer pruning, the ivf_index property). Final k TakeOrdered."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    terms = ["merge", "sort", "window"]
    idx = X.bm25_index(docs, str(tmp_path / "bm25"))
    adhoc = [tuple(r) for r in X.bm25_topk(docs, terms, k=15).collect()]
    indexed_df = X.bm25_topk(None, terms, k=15, index_dir=idx, spark=spark)
    assert [tuple(r) for r in indexed_df.collect()] == adhoc
    plan = indexed_df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [_b" in plan or (
        "PartitionFilters: [" in plan and "_b#" in plan.split("PartitionFilters")[1][:120]
    ), f"bucket filter not pushed to partition pruning:\n{plan[:1500]}"


def test_bm25_index_stores_its_bucket_modulus(spark, tmp_path):
    """A build/query n_buckets mismatch must be impossible: the modulus is
    persisted in stats/ and the query side uses the STORED value, so a
    caller passing a different n_buckets still gets correct results
    (r4 review: a mismatch silently dropped ~half the query terms)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = X.bm25_index(docs, str(tmp_path / "bm25_32"), n_buckets=32)
    adhoc = [tuple(r) for r in X.bm25_topk(docs, ["merge", "sort"], k=10).collect()]
    # deliberately wrong caller-side modulus: stored 32 must win
    got = [
        tuple(r)
        for r in X.bm25_topk(
            None, ["merge", "sort"], k=10, index_dir=idx, spark=spark, n_buckets=64
        ).collect()
    ]
    assert got == adhoc


def test_bm25_cold_query_resolves_buckets_in_one_job(spark, tmp_path, monkeypatch):
    """A cold 10-term indexed query resolves ALL unseen term buckets in ONE
    Spark job (VERDICT r4 #6: the per-term variant paid one collect job per
    cold term); a warm repeat launches zero. Counted via createDataFrame
    calls — the batched resolver's only job entry point — with the memo
    cleared first."""
    terms = [f"term{i}" for i in range(10)]
    calls = []
    real = type(spark).createDataFrame

    def counting(self, *a, **kw):
        calls.append(1)
        return real(self, *a, **kw)

    monkeypatch.setattr(type(spark), "createDataFrame", counting)
    monkeypatch.setattr(X, "_BUCKET_CACHE", {})
    got = X._buckets_of(spark, terms, 64)
    assert len(calls) == 1, f"expected 1 bucket-probe job, saw {len(calls)}"
    assert len(got) == 10 and all(0 <= b < 64 for b in got)
    # warm path: zero jobs, identical answers
    again = X._buckets_of(spark, terms, 64)
    assert len(calls) == 1 and again == got
    # values match the Spark builtin per term (the correctness contract)
    from pyspark.sql import functions as F

    want = [
        real(spark, [(t,) for t in terms], "t string")
        .select(F.pmod(F.xxhash64("t"), F.lit(64)).alias("b"))
        .collect()
    ]
    assert got == [int(r.b) for r in want[0]]


def test_lm_perplexity_hand_computed(spark, tmp_path):
    """Bigram stupid-backoff on a corpus small enough to check by hand:
    train on {'a b', 'a b', 'a c'}; N=6, V=3; c(a)=3 c(b)=2 c(c)=1;
    c(a,b)=2 c(a,c)=1. Score 'a b': p1 = (3+1)/9, p2 = 2/3.
    Score 'a z' (OOV): p1 = 4/9, p2 = 0.4 * (0+1)/9."""
    import math

    corpus = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], ["doc_id", "text"]
    )
    lm = X.ngram_lm_train(corpus, str(tmp_path / "lm"))
    docs = spark.createDataFrame([(10, "a b"), (11, "a z")], ["doc_id", "text"])
    got = {r.doc_id: r for r in X.lm_perplexity(docs, lm).collect()}

    lp_ab = (math.log(4 / 9) + math.log(2 / 3)) / 2
    lp_az = (math.log(4 / 9) + math.log(0.4 * (1 / 9))) / 2
    assert got[10].n_tokens == 2 and got[11].n_tokens == 2
    assert abs(got[10].avg_logprob - round(lp_ab, 6)) < 1e-6
    assert abs(got[10].ppl - round(math.exp(-lp_ab), 6)) < 1e-6
    assert abs(got[11].avg_logprob - round(lp_az, 6)) < 1e-6
    # fluent text scores lower perplexity than OOV-laden text
    assert got[10].ppl < got[11].ppl


def test_lm_perplexity_matches_duckdb_formula(spark, tmp_path):
    """Full-formula oracle on the sf0.001 corpus: train on even doc_ids,
    score odd doc_ids, and compare every (n_tokens, avg_logprob, ppl)
    against an independent DuckDB implementation of the identical
    stupid-backoff arithmetic."""
    import duckdb as _duck

    from pyspark.sql import functions as F

    path = "/root/testdata/sf0.001/documents.parquet"
    all_docs = spark.read.parquet(path).select("doc_id", "text")
    train = all_docs.filter(F.col("doc_id") % 2 == 0)
    score = all_docs.filter(F.col("doc_id") % 2 == 1)
    lm = X.ngram_lm_train(train, str(tmp_path / "lm001"), min_count=2)
    got = sorted(
        (r.doc_id, r.n_tokens, f"{r.avg_logprob:.6f}", f"{r.ppl:.6f}")
        for r in X.lm_perplexity(score, lm).collect()
    )

    con = _duck.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    want = con.execute("""
WITH tw AS (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
            FROM documents WHERE doc_id % 2 = 0),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tw GROUP BY 1),
stats AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v FROM uni),
tp AS (SELECT ws[i] AS h, ws[i+1] AS w FROM
        (SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
         FROM documents WHERE doc_id % 2 = 0),
        LATERAL (SELECT unnest(range(1, len(ws))) AS i)),
big AS (SELECT h, w, CAST(count(*) AS BIGINT) AS c FROM tp GROUP BY 1, 2 HAVING count(*) >= 2),
toks AS (SELECT doc_id, i AS pos, ws[i] AS w,
               CASE WHEN i > 1 THEN ws[i-1] END AS h
        FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
              FROM documents WHERE doc_id % 2 = 1),
             LATERAL (SELECT unnest(range(1, len(ws)+1)) AS i)),
sc AS (SELECT t.doc_id,
        CASE WHEN t.h IS NULL THEN (coalesce(uw.c, 0) + 1.0) / (s.n + s.v)
             WHEN b.c IS NOT NULL AND uh.c IS NOT NULL THEN CAST(b.c AS DOUBLE) / uh.c
             ELSE 0.4 * (coalesce(uw.c, 0) + 1.0) / (s.n + s.v) END AS p
      FROM toks t
      LEFT JOIN big b ON t.h = b.h AND t.w = b.w
      LEFT JOIN uni uh ON t.h = uh.w
      LEFT JOIN uni uw ON t.w = uw.w
      CROSS JOIN stats s)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(ln(p)), 6) AS avg_logprob,
       round(exp(-avg(ln(p))), 6) AS ppl
FROM sc GROUP BY doc_id ORDER BY doc_id
""").fetchall()
    con.close()
    want = sorted((d, n, f"{a:.6f}", f"{p:.6f}") for d, n, a, p in want)
    assert got == want, f"first diff: {next((a, b) for a, b in zip(got, want) if a != b)}"


def test_lm_perplexity_deterministic_across_parallelism(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    lm = X.ngram_lm_train(docs.repartition(1), str(tmp_path / "lm_det"))
    a = sorted(tuple(r) for r in X.lm_perplexity(docs.repartition(1), lm).collect())
    b = sorted(tuple(r) for r in X.lm_perplexity(docs.repartition(16), lm).collect())
    assert a == b and len(a) == 500


def test_lm_perplexity_edge_docs_short_empty_null(spark, tmp_path):
    """The input classes the r5 review caught: single-word docs must not
    crash training (sequence(1,0) is DESCENDING in Spark, not empty);
    NULL-text docs must pollute neither the model (no NULL unigram, no
    inflated N+V) nor the scores (no fabricated row); empty text is the
    '' token by the split convention."""
    corpus = spark.createDataFrame(
        [(1, "a b"), (2, "solo"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    lm = X.ngram_lm_train(corpus, str(tmp_path / "lm_edge"))
    uni = {r.w: r.c for r in spark.read.parquet(f"{lm}/unigrams").collect()}
    assert uni == {"a": 1, "b": 1, "solo": 1, "": 1}  # no None key
    st = spark.read.parquet(f"{lm}/stats").collect()[0]
    assert (st.n_tokens, st.vocab_size) == (4, 4)

    docs = spark.createDataFrame(
        [(10, "b a"), (11, "solo"), (12, ""), (13, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in X.lm_perplexity(docs, lm).collect()}
    assert 13 not in got, "NULL-text doc must not receive a score row"
    # 'solo' and '' are single known tokens: p = (1+1)/(4+4) -> ppl 4.0
    assert got[11].ppl == 4.0 and got[12].ppl == 4.0
    # 'b a': unigram floor then backoff (bigram (b,a) unseen, history known)
    import math

    lp = (math.log(2 / 8) + math.log(0.4 * (2 / 8))) / 2
    assert abs(got[10].avg_logprob - round(lp, 6)) < 1e-6
