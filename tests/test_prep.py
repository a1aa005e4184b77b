"""Training-prep operator tests (operators/prep.py): chunking vs
hand-computed windows and a full DuckDB oracle; PII redaction vs planted
spans and the identical-pattern DuckDB oracle."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from mistral_ocr_spark.operators import prep as P


def test_chunk_documents_hand_computed(spark):
    """max=5, overlap=2 (step=3) on 8/6/5/1/0-word docs — every boundary
    case: coverage, overlap carry, exact-max single chunk, short final
    chunk, and the ['']-token empty-text convention."""
    docs = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5 w6 w7 w8"),
            (2, "a b c d e f"),
            (3, "p q r s t"),
            (4, "solo"),
            (5, ""),
            (6, None),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.chunk_id): (r.text, r.n_tokens)
        for r in P.chunk_documents(docs, max_tokens=5, overlap=2).collect()
    }
    assert got == {
        (1, 0): ("w1 w2 w3 w4 w5", 5),
        (1, 1): ("w4 w5 w6 w7 w8", 5),
        (2, 0): ("a b c d e", 5),
        (2, 1): ("d e f", 3),
        (3, 0): ("p q r s t", 5),
        (4, 0): ("solo", 1),
        (5, 0): ("", 1),  # split('') is [''] — the corpus-wide convention
    }
    # every token of doc 1 appears in at least one chunk; consecutive
    # chunks share exactly `overlap` tokens
    assert got[(1, 0)][0].split()[-2:] == got[(1, 1)][0].split()[:2]


def test_chunk_documents_matches_duckdb_oracle(spark):
    """Identical windowing arithmetic in DuckDB over the fixture corpus
    (max=32, overlap=8): every (doc, chunk) row must agree."""
    path = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(path).select("doc_id", "text")
    got = sorted(
        (r.doc_id, r.chunk_id, r.text, r.n_tokens)
        for r in P.chunk_documents(docs, max_tokens=32, overlap=8).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    want = con.execute("""
WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws,
                  len(regexp_split_to_array(trim(text), '\\s+')) AS n
           FROM documents WHERE text IS NOT NULL),
c AS (SELECT doc_id, ws, n,
             greatest(CAST(ceil((n - 8) / 24.0) AS INT), 1) AS n_chunks FROM w)
SELECT doc_id, i AS chunk_id,
       array_to_string(list_slice(ws, i*24 + 1, i*24 + 32), ' ') AS text,
       CAST(least(n - i*24, 32) AS BIGINT) AS n_tokens
FROM c, LATERAL (SELECT unnest(range(0, n_chunks)) AS i)
ORDER BY doc_id, chunk_id
""").fetchall()
    con.close()
    assert got == [tuple(r) for r in want]
    assert len(got) > 500  # multi-chunk docs exist in the fixture


def test_chunk_documents_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        P.chunk_documents(docs, max_tokens=8, overlap=8)


def test_redact_pii_planted_spans(spark):
    """Planted emails/IPs/phones are masked and counted; ordinary digit
    runs, years, version strings, numeric ranges, and dotted IDs are
    untouched (the precision contract, incl. the r5-review cases where a
    bare trailing \\b ate the tails of larger numbers)."""
    rows = [
        (1, "contact bob.smith+spam@example.co.uk or call (555) 123-4567 now"),
        (2, "server at 10.0.255.7 and backup 192.168.1.1 online"),
        (3, "released in 2024, version 3.14.15 had 10000 downloads"),
        (4, "mail a@b.io b@c.net and +1 555-123-4567"),
        (5, None),
        (6, "pages 100-200 300-4000 and id 8675.309.1234 stay"),
        (7, "1.2.3.4@mail.com wrote"),
        # ADVICE r5: back-to-back spans share their separator, which the
        # pattern consumes — the gated second pass must catch the middle
        (8, "ips: 1.2.3.4 5.6.7.8 9.10.11.12"),
        # digit-leading adjacent phones: the 2nd's leading separator is
        # consumed by the 1st match, so one pass alone would skip it
        (9, "call 555-123-4567 556-123-4567 557-123-4567 now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in P.redact_pii(docs).collect()}
    assert got[1].text == "contact <EMAIL> or call <PHONE> now"
    assert (got[1].n_email, got[1].n_ipv4, got[1].n_phone) == (1, 0, 1)
    assert got[2].text == "server at <IP> and backup <IP> online"
    assert got[2].n_ipv4 == 2
    # version strings: 3.14.15 only has three octet groups -> not an IPv4;
    # years/counts are bare digit runs -> not phones
    assert got[3].text == rows[2][1]
    assert (got[3].n_email, got[3].n_ipv4, got[3].n_phone) == (0, 0, 0)
    assert got[4].text == "mail <EMAIL> <EMAIL> and <PHONE>"
    assert (got[4].n_email, got[4].n_phone) == (2, 1)
    assert got[5].text is None and got[5].n_email is None
    # r5 review regressions: digits embedded in ranges/IDs are NOT phones
    assert got[6].text == rows[5][1]
    assert (got[6].n_ipv4, got[6].n_phone) == (0, 0)
    # a span consumed by an earlier kind is not re-counted by a later one
    assert got[7].text == "<EMAIL> wrote"
    assert (got[7].n_email, got[7].n_ipv4) == (1, 0)
    # adjacent spans: every one masked, none leaked (ADVICE r5)
    assert got[8].text == "ips: <IP> <IP> <IP>"
    assert got[8].n_ipv4 == 3
    assert got[9].text == "call <PHONE> <PHONE> <PHONE> now"
    assert got[9].n_phone == 3


def test_redact_pii_matches_duckdb_oracle(spark):
    """The IDENTICAL patterns (shared data, not parallel code) run in
    DuckDB with the 'g' flag; masked text and counts must agree on a
    corpus of planted + fixture rows."""
    path = "/root/testdata/sf0.001/documents.parquet"
    base = (
        spark.read.parquet(path)
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 100)
    )
    planted = spark.createDataFrame(
        [
            (100001, "ping admin@site.org from 8.8.8.8 re +44 123-456-7890"),
            (100002, "no pii here at all"),
            (100003, "ips: 1.2.3.4 5.6.7.8 9.10.11.12"),
        ],
        "doc_id long, text string",
    )
    docs = base.unionByName(planted)
    got = sorted(
        (r.doc_id, r.text, r.n_email, r.n_ipv4, r.n_phone)
        for r in P.redact_pii(docs).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW base AS SELECT * FROM read_parquet('{path}')")
    con.execute(
        "CREATE VIEW documents AS SELECT doc_id, text FROM "
        "(SELECT * FROM base WHERE doc_id < 100) UNION ALL "
        "SELECT * FROM (VALUES (100001, 'ping admin@site.org from 8.8.8.8 re +44 123-456-7890'), "
        "(100002, 'no pii here at all'), "
        "(100003, 'ips: 1.2.3.4 5.6.7.8 9.10.11.12')) v(doc_id, text)"
    )
    # identical patterns; replacements translate Java's $n to RE2's \n.
    # ipv4/phone get the gated SECOND pass (ADVICE r5 adjacency fix) —
    # the oracle mirrors redact_pii's two-pass-per-context-kind shape.
    pats = {k: P.PII_PATTERNS[k][0] for k in ("email", "ipv4", "phone")}
    reps = {k: P.PII_PATTERNS[k][1].replace("$", "\\") for k in pats}
    want = con.execute(
        """
WITH m1 AS (SELECT doc_id, text AS t0,
                   regexp_replace(text, ?, ?, 'g') AS t1 FROM documents),
i1 AS (SELECT *, len(regexp_extract_all(t1, ?)) AS ni1,
              regexp_replace(t1, ?, ?, 'g') AS t2a FROM m1),
i2 AS (SELECT *,
       CASE WHEN ni1 > 0 THEN len(regexp_extract_all(t2a, ?)) ELSE 0 END AS ni2,
       CASE WHEN ni1 > 0 AND len(regexp_extract_all(t2a, ?)) > 0
            THEN regexp_replace(t2a, ?, ?, 'g') ELSE t2a END AS t2 FROM i1),
p1 AS (SELECT *, len(regexp_extract_all(t2, ?)) AS np1,
              regexp_replace(t2, ?, ?, 'g') AS t3a FROM i2),
p2 AS (SELECT *,
       CASE WHEN np1 > 0 THEN len(regexp_extract_all(t3a, ?)) ELSE 0 END AS np2,
       CASE WHEN np1 > 0 AND len(regexp_extract_all(t3a, ?)) > 0
            THEN regexp_replace(t3a, ?, ?, 'g') ELSE t3a END AS t3 FROM p1)
SELECT doc_id, t3 AS text,
  CAST(len(regexp_extract_all(t0, ?)) AS BIGINT) AS n_email,
  CAST(ni1 + ni2 AS BIGINT) AS n_ipv4,
  CAST(np1 + np2 AS BIGINT) AS n_phone
FROM p2 ORDER BY doc_id
""",
        [
            pats["email"], reps["email"],
            pats["ipv4"], pats["ipv4"], reps["ipv4"],
            pats["ipv4"], pats["ipv4"], pats["ipv4"], reps["ipv4"],
            pats["phone"], pats["phone"], reps["phone"],
            pats["phone"], pats["phone"], pats["phone"], reps["phone"],
            pats["email"],
        ],
    ).fetchall()
    con.close()
    assert got == [tuple(r) for r in want]


def test_pack_sequences_matches_global_window_oracle(spark):
    """The distributed prefix sum must equal the single-window global
    cumsum (DuckDB: SUM OVER ORDER BY) — offsets, seq ids, positions,
    and straddle flags, row for row."""
    path = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(path).select("doc_id", "text")
    chunks = P.chunk_documents(docs, max_tokens=32, overlap=8)
    got = sorted(
        (r.doc_id, r.chunk_id, r.global_offset, r.seq_id, r.seq_pos, r.straddles)
        for r in P.pack_sequences(chunks, seq_len=100, partitions=8).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    want = con.execute("""
WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws,
                  len(regexp_split_to_array(trim(text), '\\s+')) AS n
           FROM documents WHERE text IS NOT NULL),
c AS (SELECT doc_id, ws, n,
             greatest(CAST(ceil((n - 8) / 24.0) AS INT), 1) AS n_chunks FROM w),
ch AS (SELECT doc_id, i AS chunk_id,
              CAST(least(n - i*24, 32) AS BIGINT) AS n_tokens
       FROM c, LATERAL (SELECT unnest(range(0, n_chunks)) AS i)),
o AS (SELECT doc_id, chunk_id, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id, chunk_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS global_offset
      FROM ch)
SELECT doc_id, chunk_id, global_offset,
       CAST(global_offset // 100 AS BIGINT) AS seq_id,
       CAST(global_offset % 100 AS BIGINT) AS seq_pos,
       (global_offset % 100) + n_tokens > 100 AS straddles
FROM o ORDER BY doc_id, chunk_id
""").fetchall()
    con.close()
    assert got == [tuple(r) for r in want]
    assert len(got) > 500


def test_pack_sequences_deterministic_across_parallelism(spark):
    """Offsets are a pure function of the order columns: identical output
    at any partition count, even though range-partition boundaries (and
    thus the per-partition sums being merged) differ."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    chunks = P.chunk_documents(docs, max_tokens=32, overlap=8)
    a = sorted(
        tuple(r)
        for r in P.pack_sequences(chunks, seq_len=64, partitions=2).collect()
    )
    b = sorted(
        tuple(r)
        for r in P.pack_sequences(chunks, seq_len=64, partitions=16).collect()
    )
    assert a == b and len(a) > 500


def test_pack_sequences_edge_guards(spark):
    """r5 review regressions: duplicate order keys still get DISJOINT
    offset ranges (ROWS frame, not the default RANGE frame that assigns
    peers identical cumsums); NULL n_tokens and non-positive seq_len are
    rejected; seq_id stays exact past 2^53 cumulative tokens (integer
    div, not floor of a double division)."""
    dup = spark.createDataFrame(
        [(1, 0, 5), (1, 0, 5), (1, 1, 3)],
        "doc_id long, chunk_id int, n_tokens long",
    )
    rows = sorted(
        (r.global_offset, r.n_tokens)
        for r in P.pack_sequences(dup, seq_len=100, partitions=2).collect()
    )
    assert rows == [(0, 5), (5, 5), (10, 3)]  # disjoint, gap-free

    with pytest.raises(ValueError, match="seq_len"):
        P.pack_sequences(dup, seq_len=0)

    with_null = spark.createDataFrame(
        [(1, 0, 5), (2, 0, None)], "doc_id long, chunk_id int, n_tokens long"
    )
    with pytest.raises(ValueError, match="NULL"):
        P.pack_sequences(with_null, seq_len=100, partitions=2)

    frac = spark.createDataFrame(
        [(1, 0, 5.0)], "doc_id long, chunk_id int, n_tokens double"
    )
    with pytest.raises(ValueError, match="integral"):
        P.pack_sequences(frac, seq_len=100, partitions=2)

    big = spark.createDataFrame(
        [(1, 0, 2**53 + 3), (2, 0, 4)], "doc_id long, chunk_id int, n_tokens long"
    )
    got = {r.doc_id: r for r in P.pack_sequences(big, seq_len=3, partitions=2).collect()}
    assert got[2].global_offset == 2**53 + 3
    assert got[2].seq_id == (2**53 + 3) // 3  # exact; floor(double/3) is off by 1
    assert got[2].seq_pos == (2**53 + 3) % 3
