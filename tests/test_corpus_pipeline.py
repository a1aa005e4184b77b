"""End-to-end composed pipeline test (operators/corpus.py): extraction,
boilerplate-line dedup, quality filtering, exact dedup, decontamination and
deterministic splitting chained on a corpus with one planted case per
stage, so every stage's effect is individually observable in the output."""

from __future__ import annotations

from pyspark.sql import functions as F

from mistral_ocr_spark.operators.corpus import build_training_corpus

_NAV = (
    '<nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a></li>'
    "</ul></nav>"
)
_FOOT = '<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer>'
_BOILER = "subscribe to our excellent newsletter for updates every single week"

_UNIQUE = {
    0: "alpha writes careful prose about distributed engines and their many planning tricks",
    1: "beta explains storage formats with modern columnar layouts and clever encodings here",
    2: "gamma describes shuffle behavior under load with measured numbers and clear graphs",
    # 3 is an exact duplicate of 2 (same article body, same heading)
    4: "delta surveys tokenizers across languages with fertility tables and honest caveats",
    5: "epsilon covers benchmark contamination where a sixteen word passage overlaps the "
       "eval suite by thirteen grams exactly",
    # 6 is the low-quality repetitive page
    7: "eta closes with deployment advice for long running clusters and their operators",
}


def _page(i: int, heading: str, paras: list[str]) -> tuple:
    body = "".join(f"<p>{p}</p>" for p in paras)
    html = (
        f"<html><head><title>t</title></head><body>{_NAV}"
        f"<article><h1>{heading}</h1>{body}</article>{_FOOT}</body></html>"
    ).encode()
    return (f"https://host-{i}.example.com/doc-{i}.html", None, html, None, "en")


def _corpus(spark):
    rows = []
    for i in (0, 1, 2, 4, 5, 7):
        rows.append(_page(i, f"Doc {i}", [_UNIQUE[i], _BOILER]))
    rows.append(_page(3, "Doc 2", [_UNIQUE[2], _BOILER]))  # dup of doc 2
    rows.append(_page(6, "Doc 6", ["spam " * 40, _BOILER]))  # repetitive
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    return spark.createDataFrame(rows, schema)


def test_composed_pipeline_each_stage_observable(spark):
    pages = _corpus(spark)
    bench = spark.createDataFrame(
        [(100, _UNIQUE[5])], ["bench_id", "text"]
    )  # contaminates doc 5
    stats: dict = {}
    out = build_training_corpus(
        pages, benchmark=bench, require_rep=True, line_min_df=2, stats=stats
    ).collect()
    by_url = {r.url.split("doc-")[1].split(".")[0]: r for r in out}

    # stage counts: 8 extracted; exact dedup drops one of {2,3} FIRST
    # (before line dedup — running it after would let the duplicate pair
    # push its own lines to df=2 and line-dedup would annihilate BOTH
    # copies, the ordering pitfall this test originally caught); line
    # dedup then strips boilerplate without emptying anyone; quality drops
    # the spam page; decontamination drops doc 5
    assert stats["extracted"] == 8
    assert stats["after_exact_dedup"] == 7
    assert stats["after_line_dedup"] == 7
    assert stats["after_quality"] == 6
    assert stats["after_decontamination"] == 5

    # survivors: 0, 1, exactly one of {2, 3}, 4, 7
    ids = set(by_url)
    assert {"0", "1", "4", "7"} <= ids
    assert len(ids & {"2", "3"}) == 1
    assert "5" not in ids and "6" not in ids

    # the boilerplate paragraph is stripped from every survivor; the
    # unique content and the heading survive
    for i, r in by_url.items():
        assert _BOILER not in r.text, f"doc {i} kept boilerplate"
        assert r.text.startswith("Doc ")
    assert _UNIQUE[0] in by_url["0"].text
    assert by_url["0"].n_words == 2 + len(_UNIQUE[0].split())

    # split column present and total
    assert all(r.split in ("train", "holdout") for r in out)


def test_composed_pipeline_deterministic_across_parallelism(spark):
    pages = _corpus(spark)
    a = sorted(
        tuple(r) for r in build_training_corpus(pages.repartition(1)).collect()
    )
    b = sorted(
        tuple(r) for r in build_training_corpus(pages.repartition(7)).collect()
    )
    assert a == b and len(a) > 0


def test_recrawled_urls_collapse_to_one_row(spark):
    """Duplicate URLs (re-crawls across WARC snapshots) must collapse to
    ONE deterministic survivor per doc_id instead of fanning out every
    downstream self-join (r4 review: 4 input rows produced 6 output rows
    with byte-identical duplicates)."""
    rows = [
        _page(0, "Doc 0", [_UNIQUE[0]]),
        _page(0, "Doc 0", [_UNIQUE[0]]),                  # same url, same html
        _page(1, "Doc 1", [_UNIQUE[1]]),
        _page(1, "Doc 1", [_UNIQUE[1] + " revised words here"]),  # same url, new crawl
    ]
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    pages = spark.createDataFrame(rows, schema)
    out = build_training_corpus(pages, line_min_df=None).collect()
    assert len(out) == 2, [r.url for r in out]
    urls = sorted(r.url for r in out)
    assert len(set(urls)) == 2
    # deterministic winner: rerun gives identical rows
    again = build_training_corpus(pages.repartition(4), line_min_df=None).collect()
    assert sorted(tuple(r) for r in out) == sorted(tuple(r) for r in again)


def test_final_plan_contains_no_extraction_recompute(spark):
    """The staged materialization means the FINAL plan reads parquet —
    zero MapInArrow nodes (r4 review: the unmaterialized chain re-ran the
    full-corpus extraction up to 32x in one action)."""
    pages = _corpus(spark)
    bench = spark.createDataFrame([(100, _UNIQUE[5])], ["bench_id", "text"])
    out = build_training_corpus(pages, benchmark=bench)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" not in plan, f"extraction recomputed in final plan:\n{plan[:1200]}"


def test_stats_cost_zero_extra_actions(spark, monkeypatch):
    """The stats contract rides Observations on the checkpoint writes
    (VERDICT r4 #7) — a stats run must trigger ZERO DataFrame.count calls
    (banned outright here) and still produce the exact per-stage numbers
    the count-based implementation produced."""
    from pyspark.sql import DataFrame

    def banned(self):  # pragma: no cover - should never run
        raise AssertionError("DataFrame.count() called during a stats run")

    monkeypatch.setattr(DataFrame, "count", banned)
    pages = _corpus(spark)
    bench = spark.createDataFrame([(100, _UNIQUE[5])], ["bench_id", "text"])
    stats: dict = {}
    out = build_training_corpus(
        pages, benchmark=bench, require_rep=True, line_min_df=2, stats=stats
    ).collect()
    assert stats == {
        "extracted": 8,
        "after_exact_dedup": 7,
        "after_line_dedup": 7,
        "after_quality": 6,
        "after_decontamination": 5,
    }
    assert len(out) == 5


def test_lm_perplexity_stage_filters_gibberish(spark, tmp_path):
    """Stage 5 (CCNet perplexity cut): a gibberish page that sails through
    the heuristic filters (distinct words, no repetition) must drop at the
    LM stage, while every fluent page survives. The threshold is placed
    between the measured fluent and gibberish scores, so the test pins the
    ORDERING the filter exists for, not a magic number."""
    from mistral_ocr_spark.operators import textstats as X

    gib = "zxq wvv qpl mnb vcx lkj hgf dsa poi uyt rew qas"
    pages = _corpus(spark).unionByName(
        spark.createDataFrame([_page(8, "Doc 8", [gib, _BOILER])], _corpus(spark).schema)
    )
    # reference LM: the fluent article bodies with their headings, in the
    # same "Doc k <body>" shape the extractor emits
    lm_train = spark.createDataFrame(
        [(i, f"Doc {i} {u}") for i, u in _UNIQUE.items()] + [(8, "Doc 8")],
        ["doc_id", "text"],
    )
    lm = X.ngram_lm_train(lm_train, str(tmp_path / "corpus_lm"))

    # measure, then split the threshold between fluent-max and gibberish
    no_lm = build_training_corpus(pages, line_min_df=2, require_rep=True)
    scored = {
        r.doc_id: r.ppl
        for r in X.lm_perplexity(
            no_lm.select("doc_id", "text"), lm
        ).collect()
    }
    by_url = {r.url: r.doc_id for r in no_lm.collect()}
    gib_id = by_url["https://host-8.example.com/doc-8.html"]
    fluent_max = max(p for d, p in scored.items() if d != gib_id)
    assert scored[gib_id] > fluent_max, (scored, gib_id)
    cut = (fluent_max + scored[gib_id]) / 2

    stats: dict = {}
    out = build_training_corpus(
        pages, line_min_df=2, require_rep=True, lm_dir=lm, max_ppl=cut, stats=stats
    ).collect()
    urls = {r.url for r in out}
    assert "https://host-8.example.com/doc-8.html" not in urls
    assert stats["after_lm_filter"] == stats["after_quality"] - 1
    assert len(out) == stats["after_lm_filter"] == 6


def test_half_specified_lm_config_raises(spark):
    """lm_dir without max_ppl (or vice versa) must fail loudly, not ship
    an unfiltered corpus (r5 review)."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="lm_dir and max_ppl"):
        build_training_corpus(_corpus(spark), lm_dir="/nonexistent")
    with _pytest.raises(ValueError, match="lm_dir and max_ppl"):
        build_training_corpus(_corpus(spark), max_ppl=100.0)


def test_crawl_policy_pre_stages(spark):
    """Stage 0: robots disallow, canonical-mirror collapse, and noindex
    drop all act BEFORE extraction; everything downstream is unchanged."""
    from mistral_ocr_spark.operators.robots import parse_robots

    base = _corpus(spark)
    mirror_html = (
        '<html><head>'
        '<link rel="canonical" href="https://host-1.example.com/doc-1.html">'
        f'</head><body><article><h1>Doc 1</h1><p>{_UNIQUE[1]} mirrored with '
        "extra words so exact dedup alone cannot collapse it</p></article>"
        "</body></html>"
    ).encode()
    noidx_html = (
        '<html><head><meta name="robots" content="noindex"></head>'
        f"<body><article><h1>Doc 9</h1><p>{_UNIQUE[0]} nine</p></article>"
        "</body></html>"
    ).encode()
    extra = spark.createDataFrame(
        [
            ("https://host-1.example.com/doc-1.amp.html", None, mirror_html, None, "en"),
            ("https://host-9.example.com/doc-9.html", None, noidx_html, None, "en"),
        ],
        base.schema,
    )
    robots = spark.createDataFrame(
        [("host-0.example.com", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    out = build_training_corpus(
        base.unionByName(extra),
        robots_rules=parse_robots(robots),
        honor_directives=True,
        line_min_df=None,
    )
    urls = {r.url for r in out.collect()}
    assert "https://host-0.example.com/doc-0.html" not in urls     # robots
    assert "https://host-1.example.com/doc-1.amp.html" not in urls  # mirror
    assert "https://host-9.example.com/doc-9.html" not in urls      # noindex
    assert "https://host-1.example.com/doc-1.html" in urls  # target survives
    assert "https://host-2.example.com/doc-2.html" in urls  # untouched docs stay


def test_dedup_increment_against_indexed_corpus(spark, tmp_path):
    """Incremental ingestion: exact dups drop via the corpus Bloom filter,
    near-dups vs the indexed corpus drop via the persisted MinHash index,
    within-increment near-dup clusters collapse TRANSITIVELY to min id."""
    import itertools

    from mistral_ocr_spark.operators.corpus import dedup_increment
    from mistral_ocr_spark.operators.dedup import minhash_index

    words = [f"w{i}" for i in range(60)]
    base = " ".join(words)

    def edited(prefix_changed=0, suffix_changed=0, tag=""):
        w = list(words)
        for i in range(prefix_changed):
            w[i] = f"p{tag}{i}"
        for i in range(suffix_changed):
            w[-1 - i] = f"s{tag}{i}"
        return " ".join(w)

    def jac3(a, b):
        sh = lambda t: {tuple(t.split()[i:i + 3]) for i in range(len(t.split()) - 2)}
        A, B = sh(a), sh(b)
        return len(A & B) / len(A | B)

    corpus_rows = [
        (1, "corpus doc one about extraction pipelines " + " ".join(f"c1x{i}" for i in range(30))),
        (2, " ".join(f"c2w{i}" for i in range(60)) + " corpus two trailer"),
        (3, "corpus three totally distinct content " + " ".join(f"c3x{i}" for i in range(30))),
    ]
    inc_near_corpus2 = corpus_rows[1][1] + " tiny"
    assert jac3(corpus_rows[1][1], inc_near_corpus2) >= 0.8
    t109 = base
    t108 = edited(prefix_changed=5)
    t110 = edited(suffix_changed=5)
    assert jac3(t108, t109) >= 0.8 and jac3(t109, t110) >= 0.8
    assert jac3(t108, t110) < 0.8  # transitivity genuinely needed
    unique = "increment unique document " + " ".join(f"u{i}" for i in range(30))
    increment_rows = [
        (101, corpus_rows[0][1]),       # exact dup of corpus 1 -> drops
        (102, inc_near_corpus2),        # near-dup of corpus 2 -> drops
        (103, unique),                  # survives
        (106, "twin text " + " ".join(f"t{i}" for i in range(30))),
        (107, "twin text " + " ".join(f"t{i}" for i in range(30))),  # exact twin of 106
        (108, t108), (109, t109), (110, t110),  # chain cluster -> keep 108
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    increment = spark.createDataFrame(increment_rows, "doc_id long, text string")
    idx = str(tmp_path / "mh_index")
    minhash_index(corpus, idx)

    got = sorted(
        r.doc_id
        for r in dedup_increment(
            corpus, increment,
            expected_corpus_docs=3,
            minhash_index_dir=idx,
            threshold=0.8,
        ).collect()
    )
    assert got == [103, 106, 108]

    # exact-only mode (no index): only the Bloom/exact stage applies
    got2 = sorted(
        r.doc_id
        for r in dedup_increment(corpus, increment, expected_corpus_docs=3).collect()
    )
    assert got2 == [102, 103, 106, 108, 109, 110]


def test_dedup_increment_corpus_tainted_cluster_drops_wholly(spark, tmp_path):
    """Batch semantics for the near stage: if the BRIDGE of a within-
    increment chain near-matches the corpus, the whole cluster drops —
    pre-filtering the chain's edges would keep both ends (r5 review,
    reproduced)."""
    from mistral_ocr_spark.operators.corpus import dedup_increment
    from mistral_ocr_spark.operators.dedup import minhash_index

    words = [f"w{i}" for i in range(60)]

    def variant(base, changes):
        w = list(base)
        for pos, val in changes.items():
            w[pos] = val
        return " ".join(w)

    def jac3(a, b):
        sh = lambda t: {tuple(t.split()[i:i + 3]) for i in range(len(t.split()) - 2)}
        A, B = sh(a), sh(b)
        return len(A & B) / len(A | B)

    tx = " ".join(words)                                        # corpus X
    tb = variant(words, {i: f"p{i}" for i in range(3)})         # B ~ X
    ta = variant(tb.split(), {i: f"a{i}" for i in range(54, 60)})   # A ~ B
    tc = variant(tb.split(), {i: f"c{i}" for i in range(48, 52)})   # C ~ B
    # the planted geometry: B bridges A and C AND touches the corpus;
    # neither end touches the corpus or the other end directly
    assert jac3(tb, tx) >= 0.8
    assert jac3(ta, tb) >= 0.8 and jac3(tc, tb) >= 0.8
    assert jac3(ta, tx) < 0.8 and jac3(tc, tx) < 0.8 and jac3(ta, tc) < 0.8

    unique = "wholly unrelated " + " ".join(f"z{i}" for i in range(40))
    corpus = spark.createDataFrame([(1, tx)], "doc_id long, text string")
    increment = spark.createDataFrame(
        [(101, ta), (102, tb), (103, tc), (105, unique)], "doc_id long, text string"
    )
    idx = str(tmp_path / "mh_idx2")
    minhash_index(corpus, idx)
    got = sorted(
        r.doc_id
        for r in dedup_increment(
            corpus, increment,
            expected_corpus_docs=1, minhash_index_dir=idx, threshold=0.8,
        ).collect()
    )
    assert got == [105], f"tainted cluster must drop wholly, got {got}"


def test_dedup_increment_prebuilt_artifacts(spark, tmp_path):
    """With corpus_bloom + corpus_fingerprints the corpus text is never
    touched: corpus_docs=None works and the answer matches the
    corpus_docs path."""
    from mistral_ocr_spark.operators.bloom import build_bloom, load_bloom, save_bloom
    from mistral_ocr_spark.operators.corpus import dedup_increment
    from mistral_ocr_spark.operators.dedup import content_fingerprint

    corpus = spark.createDataFrame(
        [(i, f"corpus doc {i} " + " ".join(f"x{i}y{j}" for j in range(20)))
         for i in range(5)],
        "doc_id long, text string",
    )
    increment = spark.createDataFrame(
        [(101, corpus.collect()[2].text), (102, "fresh content entirely new")],
        "doc_id long, text string",
    )
    fp_dir = str(tmp_path / "corpus_fp")
    corpus.select(content_fingerprint("text").alias("fp")).write.parquet(fp_dir)
    fps = spark.read.parquet(fp_dir)
    bloom = build_bloom(fps, "fp", expected_items=5)
    bpath = str(tmp_path / "corpus_bloom")
    save_bloom(spark, bloom, bpath)

    via_artifacts = sorted(
        r.doc_id
        for r in dedup_increment(
            None, increment,
            expected_corpus_docs=5,
            corpus_bloom=load_bloom(spark, bpath),
            corpus_fingerprints=fps,
        ).collect()
    )
    via_docs = sorted(
        r.doc_id
        for r in dedup_increment(corpus, increment, expected_corpus_docs=5).collect()
    )
    assert via_artifacts == via_docs == [102]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="corpus_docs"):
        dedup_increment(None, increment, expected_corpus_docs=5)
    with _pytest.raises(ValueError, match="_fp"):
        dedup_increment(
            corpus, increment.withColumn("_fp", F.lit("x")), expected_corpus_docs=5
        )
