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
