"""Unicode-normalization operator: equality with DuckDB's nfc_normalize
and Python's unicodedata on composed/decomposed/ligature/width samples;
NULL passthrough; dedup-key convergence after normalization."""

from __future__ import annotations

import unicodedata

import duckdb

from mistral_ocr_spark.operators.normalize import with_normalized_text

SAMPLES = [
    "e\u0301clair",  # decomposed: e + COMBINING ACUTE ACCENT
    "\u00e9clair",  # composed LATIN SMALL LETTER E WITH ACUTE
    "\ufb01x the \ufb02ow",  # compatibility ligatures (NFC keeps, NFKC folds)
    "\uff11\uff12\uff13 \uff57ide",  # fullwidth digits/letter
    "mixed \u00e9 + e\u0301 twice",
    "",  # empty
]


def test_nfc_matches_duckdb_and_unicodedata(spark):
    rows = [(i, s) for i, s in enumerate(SAMPLES)] + [(99, None)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.text for r in with_normalized_text(df, form="NFC").collect()}
    for i, s in enumerate(SAMPLES):
        assert got[i] == unicodedata.normalize("NFC", s)
    assert got[99] is None  # NULL passes through
    # decomposed and composed inputs converge to identical bytes
    assert got[0] == got[1] == "\u00e9clair"
    con = duckdb.connect()
    for i, s in enumerate(SAMPLES):
        (want,) = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()
        assert got[i] == want, f"sample {i}"
    con.close()


def test_nfkc_folds_compatibility_forms(spark):
    df = spark.createDataFrame([(1, "\ufb01x \uff11\uff12\uff13")], ["doc_id", "text"])
    out = with_normalized_text(df, form="NFKC").collect()[0].text
    assert out == "fix 123"


def test_normalization_converges_dedup_keys(spark):
    """The reason the operator exists: composed and decomposed spellings of
    the same text must produce the SAME dedup fingerprint after NFC."""
    from mistral_ocr_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "caf\u00e9 au lait"), (2, "cafe\u0301 au lait")], ["doc_id", "text"]
    )
    raw = exact_dedup(df)
    assert raw.count() == 2  # byte-level: different fingerprints
    normed = exact_dedup(with_normalized_text(df, form="NFC"))
    rows = normed.collect()
    assert len(rows) == 1 and rows[0].dup_count == 2 and rows[0].keeper_id == 1


def test_out_col_and_bad_form(spark):
    import pytest

    df = spark.createDataFrame([(1, "e\u0301")], ["doc_id", "text"])
    out = with_normalized_text(df, out_col="text_nfc").collect()[0]
    assert out.text == "e\u0301" and out.text_nfc == "\u00e9"
    with pytest.raises(ValueError):
        with_normalized_text(df, form="NFX")
