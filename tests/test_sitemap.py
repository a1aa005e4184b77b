"""Sitemap source (sources/sitemap.py).

Ground truth: a regex-based entry extractor (structurally independent of
the implementation's ElementTree parse) plus hand-written expectations
from the sitemaps.org protocol examples.
"""

from __future__ import annotations

import gzip
import re

from pyspark.sql import functions as F

from mistral_ocr_spark.sources.sitemap import (
    parse_sitemap_bytes,
    read_sitemaps,
    sitemap_pages,
)


def ref_entries(payload: bytes):
    """Independent regex replay: block-split on <url>/<sitemap> elements,
    field extraction per block. Fixtures stay well-formed XML without
    CDATA — the contract region where both formulations agree."""
    if payload[:2] == b"\x1f\x8b":
        payload = gzip.decompress(payload)
    text = payload.decode("utf-8")
    kind = "url" if re.search(r"<\s*(\w+:)?urlset[\s>]", text) else "sitemap"
    tag = "url" if kind == "url" else "sitemap"
    out = []
    for block in re.findall(rf"(?s)<(?:\w+:)?{tag}\s*>(.*?)</(?:\w+:)?{tag}\s*>", text):
        def field(name):
            m = re.search(rf"(?s)<(?:\w+:)?{name}\s*>(.*?)</(?:\w+:)?{name}\s*>", block)
            return m.group(1).strip() or None if m else None
        loc = field("loc")
        if not loc:
            continue
        prio = field("priority")
        try:
            prio = float(prio) if prio is not None else None
        except ValueError:
            prio = None
        out.append((kind, loc, field("lastmod"), field("changefreq"), prio))
    return out


_NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'

_URLSET = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset {_NS}>
  <url>
    <loc>https://a.example/</loc>
    <lastmod>2026-01-04</lastmod>
    <changefreq>monthly</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://a.example/p2</loc></url>
  <url><lastmod>2026-01-05</lastmod></url>
  <url><loc>https://a.example/p3</loc><priority>high</priority></url>
</urlset>
"""

_NONS = """<urlset>
  <url><loc>https://b.example/only</loc></url>
</urlset>
"""

_INDEX = f"""<?xml version="1.0"?>
<sitemapindex {_NS}>
  <sitemap>
    <loc>https://c.example/sitemap-0.xml.gz</loc>
    <lastmod>2026-02-01T12:00:00Z</lastmod>
  </sitemap>
  <sitemap><loc>https://c.example/sitemap-1.xml.gz</loc></sitemap>
</sitemapindex>
"""


def test_parse_urlset_fields():
    got = parse_sitemap_bytes(_URLSET.encode())
    assert got == ref_entries(_URLSET.encode())
    assert got[0] == ("url", "https://a.example/", "2026-01-04", "monthly", 0.8)
    assert got[1] == ("url", "https://a.example/p2", None, None, None)
    # entry without loc skipped; malformed priority kept as None, loc kept
    assert got[2] == ("url", "https://a.example/p3", None, None, None)
    assert len(got) == 3


def test_parse_index_and_no_namespace():
    assert parse_sitemap_bytes(_INDEX.encode()) == ref_entries(_INDEX.encode()) == [
        ("sitemap", "https://c.example/sitemap-0.xml.gz", "2026-02-01T12:00:00Z", None, None),
        ("sitemap", "https://c.example/sitemap-1.xml.gz", None, None, None),
    ]
    assert parse_sitemap_bytes(_NONS.encode()) == [
        ("url", "https://b.example/only", None, None, None)
    ]


def test_read_sitemaps_gzip_and_error_isolation(spark):
    blobs = spark.createDataFrame(
        [
            (1, _URLSET.encode()),
            (2, gzip.compress(_INDEX.encode())),
            (3, b"<html>not a sitemap</html>"),
            (4, b"\x00\xff garbage"),
            (5, None),
        ],
        "src_id bigint, payload binary",
    )
    rows = read_sitemaps(blobs).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src_id, []).append(r)
    assert len(by_src[1]) == 3 and all(r.kind == "url" for r in by_src[1])
    assert len(by_src[2]) == 2 and all(r.kind == "sitemap" for r in by_src[2])
    assert [r.kind for r in by_src[3]] == ["parse_error"]
    assert by_src[3][0].error_class == "ValueError"
    assert [r.kind for r in by_src[4]] == ["parse_error"]
    assert [(r.kind, r.error_class) for r in by_src[5]] == [
        ("parse_error", "null_payload")
    ]
    # one bad blob never costs a good one
    assert {r.loc for r in by_src[1]} == {
        "https://a.example/", "https://a.example/p2", "https://a.example/p3"
    }


def test_sitemap_pages_frontier_dedup(spark):
    dup = """<urlset>
      <url><loc>https://d.example/x</loc><lastmod>2026-01-01</lastmod></url>
    </urlset>"""
    dup2 = """<urlset>
      <url><loc>https://d.example/x</loc><lastmod>2026-03-01</lastmod></url>
      <url><loc>https://d.example/y</loc></url>
    </urlset>"""
    blobs = spark.createDataFrame(
        [(1, dup.encode()), (2, dup2.encode()), (3, _INDEX.encode())],
        "src_id bigint, payload binary",
    )
    pages = {r.loc: r.lastmod for r in sitemap_pages(read_sitemaps(blobs)).collect()}
    # index entries are NOT pages; duplicate locs collapse to max lastmod
    assert pages == {"https://d.example/x": "2026-03-01", "https://d.example/y": None}


def test_read_sitemaps_deterministic_across_parallelism(spark):
    blobs = [(i, (_URLSET if i % 2 else _INDEX).encode()) for i in range(20)]
    outs = []
    for p in (2, 16):
        df = spark.createDataFrame(blobs, "src_id bigint, payload binary").repartition(p)
        outs.append(sorted(
            (r.src_id, r.kind, r.loc) for r in read_sitemaps(df).collect()
        ))
    assert outs[0] == outs[1]


def test_fuzz_against_regex_reference(spark):
    import random

    rnd = random.Random(7)
    blobs = []
    for i in range(30):
        kind = rnd.choice(["urlset", "sitemapindex"])
        tag = "url" if kind == "urlset" else "sitemap"
        entries = []
        for j in range(rnd.randint(0, 8)):
            parts = [f"<loc>https://f{i}.example/{j}</loc>"]
            if rnd.random() < 0.5:
                parts.append(f"<lastmod>2026-0{rnd.randint(1, 9)}-01</lastmod>")
            if rnd.random() < 0.3:
                parts.append(f"<priority>0.{rnd.randint(0, 9)}</priority>")
            rnd.shuffle(parts)
            entries.append(f"<{tag}>{''.join(parts)}</{tag}>")
        xml = f'<{kind} {_NS}>{"".join(entries)}</{kind}>'
        body = xml.encode()
        if rnd.random() < 0.4:
            body = gzip.compress(body)
        blobs.append((i, body))
    df = spark.createDataFrame(blobs, "src_id bigint, payload binary")
    got = sorted(
        (r.src_id, r.kind, r.loc, r.lastmod, r.priority)
        for r in read_sitemaps(df).filter(F.col("kind") != "parse_error").collect()
    )
    want = sorted(
        (sid, k, loc, lm, prio)
        for sid, body in blobs
        for (k, loc, lm, _cf, prio) in ref_entries(body)
    )
    assert got == want


def test_stray_entry_tag_does_not_leak(spark):
    # a <sitemap> child inside a <urlset> is a pointer, never a page
    mixed = (b"<urlset><url><loc>https://m.example/p1</loc></url>"
             b"<sitemap><loc>https://m.example/more.xml</loc></sitemap></urlset>")
    assert parse_sitemap_bytes(mixed) == [("url", "https://m.example/p1", None, None, None)]
    blobs = spark.createDataFrame([(1, mixed)], "src_id bigint, payload binary")
    pages = {r.loc for r in sitemap_pages(read_sitemaps(blobs)).collect()}
    assert pages == {"https://m.example/p1"}


def test_nonspec_priorities_become_none():
    for bad in ("Infinity", "-inf", "nan", "1_0", "0x1"):
        xml = f"<urlset><url><loc>https://x/</loc><priority>{bad}</priority></url></urlset>"
        assert parse_sitemap_bytes(xml.encode()) == [("url", "https://x/", None, None, None)]
    ok = parse_sitemap_bytes(
        b"<urlset><url><loc>https://x/</loc><priority>.5</priority></url></urlset>"
    )
    assert ok[0][4] == 0.5


def test_custom_id_col_and_null_id(spark):
    blobs = spark.createDataFrame(
        [(7, _NONS.encode()), (None, _NONS.encode())],
        "blob_id bigint, data binary",
    )
    rows = read_sitemaps(blobs, id_col="blob_id", payload_col="data").collect()
    assert sorted([(r.src_id, r.loc) for r in rows], key=str) == sorted(
        [(7, "https://b.example/only"), (None, "https://b.example/only")], key=str
    )


def test_frontier_recency_is_chronological(spark):
    # '13:00+02:00' is 11:00Z — OLDER than '12:00Z' despite sorting later
    # as a string; the frontier must keep the chronologically newer one
    a = b"<urlset><url><loc>https://t.example/x</loc><lastmod>2026-01-01T13:00:00+02:00</lastmod></url></urlset>"
    b = b"<urlset><url><loc>https://t.example/x</loc><lastmod>2026-01-01T12:00:00Z</lastmod></url></urlset>"
    blobs = spark.createDataFrame([(1, a), (2, b)], "src_id bigint, payload binary")
    got = sitemap_pages(read_sitemaps(blobs)).collect()
    assert [(r.loc, r.lastmod) for r in got] == [
        ("https://t.example/x", "2026-01-01T12:00:00Z")
    ]
