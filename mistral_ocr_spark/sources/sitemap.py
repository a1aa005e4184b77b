"""Sitemap source: parse sitemap.xml / sitemap-index blobs into url rows.

The discovery-side sibling of the WARC source: a crawl pipeline learns
WHAT to fetch from sitemaps (sitemaps.org protocol — ``<urlset>`` leaf
files and ``<sitemapindex>`` files pointing at more sitemaps, either
possibly gzip-compressed, ≤50k entries each by spec), and at web scale
the input is a table of fetched sitemap blobs, one row per file.

Design (the warc.py contract): one ``mapInPandas`` pass, each input row
a whole sitemap blob, each output row one ``<url>``/``<sitemap>`` entry.
Parallelism = many blobs (the spec's 50k-entry cap bounds per-row work).
Parsing is stdlib ``xml.etree`` on the decompressed bytes — namespace-
agnostic localname matching, since real-world sitemaps disagree about
default-namespace declarations.

Tolerance contract: an undecodable or malformed blob emits ONE
``kind='parse_error'`` row carrying the error class; other blobs are
unaffected (the extract_batches error-capture rule). ``lastmod`` is
emitted as the raw W3C-datetime string — casting is the caller's choice
(``to_timestamp`` handles the common forms), and a malformed lastmod
must not cost the loc.

Reference parity: stevegsax/mistral-ocr enumerates local files to
process (simple_client.py upload loop); sitemaps are the crawl-native
enumeration of the same decision.
"""

from __future__ import annotations

import gzip
import io

from pyspark.sql import DataFrame

SITEMAP_SCHEMA = (
    "src_id bigint, kind string, loc string, lastmod string, "
    "changefreq string, priority double, error_class string"
)

_FIELDS = ("src_id", "kind", "loc", "lastmod", "changefreq", "priority", "error_class")


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap_bytes(payload: bytes) -> list[tuple]:
    """One blob → entry tuples (kind, loc, lastmod, changefreq, priority).
    ``kind`` is ``url`` (leaf urlset entry) or ``sitemap`` (index entry —
    its loc names ANOTHER sitemap to fetch, not a page). Raises on
    malformed input; the Spark wrapper turns that into a parse_error row.
    Driver/tests call this directly; ``read_sitemaps`` runs it in the
    kernel."""
    import xml.etree.ElementTree as ET

    if payload[:2] == b"\x1f\x8b":
        payload = gzip.decompress(payload)
    root = ET.parse(io.BytesIO(payload)).getroot()
    rootname = _localname(root.tag)
    if rootname not in ("urlset", "sitemapindex"):
        raise ValueError(f"not a sitemap root element: {rootname}")
    kind = "url" if rootname == "urlset" else "sitemap"
    out = []
    for entry in root:
        if _localname(entry.tag) not in ("url", "sitemap"):
            continue
        fields = {"loc": None, "lastmod": None, "changefreq": None, "priority": None}
        for child in entry:
            name = _localname(child.tag)
            if name in fields:
                fields[name] = (child.text or "").strip() or None
        if not fields["loc"]:
            continue  # an entry without a loc carries nothing fetchable
        prio = None
        if fields["priority"] is not None:
            try:
                prio = float(fields["priority"])
            except ValueError:
                prio = None  # malformed priority must not cost the loc
        out.append((kind, fields["loc"], fields["lastmod"], fields["changefreq"], prio))
    return out


def read_sitemaps(
    blobs: DataFrame,
    id_col: str = "src_id",
    payload_col: str = "payload",
) -> DataFrame:
    """``(src_id, payload binary)`` → one row per sitemap entry
    (``SITEMAP_SCHEMA``). Plain or gzip blobs; per-blob error isolation
    (``kind='parse_error'`` + ``error_class``, loc NULL)."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            rows = []
            for src_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    rows.append((src_id, "parse_error", None, None, None, None,
                                 "null_payload"))
                    continue
                try:
                    for kind, loc, lastmod, cf, prio in parse_sitemap_bytes(
                        bytes(payload)
                    ):
                        rows.append((src_id, kind, loc, lastmod, cf, prio, None))
                except Exception as exc:  # malformed blob → one typed row
                    rows.append((src_id, "parse_error", None, None, None, None,
                                 type(exc).__name__))
            if rows:
                yield pd.DataFrame(rows, columns=list(_FIELDS))

    return blobs.select(
        blobs[id_col].alias("src_id"), blobs[payload_col].alias(payload_col)
    ).mapInPandas(fn, SITEMAP_SCHEMA)


def sitemap_pages(entries: DataFrame) -> DataFrame:
    """Leaf page urls from ``read_sitemaps`` output, deduplicated — the
    fetch frontier. Index entries (``kind='sitemap'``) are pointers to
    MORE sitemaps: fetch those blobs and run ``read_sitemaps`` again
    (fetching is outside this engine — no network in-cluster by design,
    the same boundary the WARC source draws)."""
    from pyspark.sql import functions as F

    return (
        entries.filter(F.col("kind") == "url")
        .select("loc", "lastmod")
        .groupBy("loc")
        .agg(F.max("lastmod").alias("lastmod"))
    )
