"""The Spark-side extraction operator: ``mapInArrow`` over page batches.

Vectorization contract (BASELINE.json input_hint: "vectorized pandas/Arrow
UDFs (no per-row Python) throughout"): Spark crosses the JVM→Python
boundary once per Arrow record batch, not per row. Inside the batch the
per-document parser runs as plain Python over the Arrow buffers (HTML
parsing is inherently per-document), with all regexes/parsers compiled
module-level so they are reused across batches by the long-lived Python
worker (SURVEY.md §4.2 point 3).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from pyspark import TaskContext
from pyspark.sql import DataFrame

from mistral_ocr_spark import EXTRACTOR_VERSION
from mistral_ocr_spark.extractor import ExtractResult, extract

_FAILED = ExtractResult(None, None, [], "extractor_error", None)

# Arrow-level output schema; must stay in sync with tables.EXTRACTED_SCHEMA.
_ARROW_SPAN = pa.struct(
    [("start", pa.int64()), ("end", pa.int64()), ("kind", pa.string())]
)
ARROW_EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("text", pa.string()),
        ("markdown", pa.string()),
        ("spans", pa.list_(_ARROW_SPAN)),
        ("images", pa.list_(pa.string())),
        ("error_class", pa.string()),
        ("encoding", pa.string()),
        ("extractor_version", pa.string()),
        ("html_bytes", pa.int64()),
        ("partition_id", pa.int32()),
    ]
)


def extract_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    """mapInArrow kernel: pages(url, warc_ts, html, text, lang) → extracted."""
    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    for batch in batches:
        n = batch.num_rows
        urls = batch.column("url")
        htmls = batch.column("html")
        fallbacks = batch.column("text")
        texts: list[str | None] = [None] * n
        mds: list[str | None] = [None] * n
        spans: list[list[dict] | None] = [None] * n
        images: list[list[str] | None] = [None] * n
        errs: list[str | None] = [None] * n
        encs: list[str | None] = [None] * n
        nbytes: list[int] = [0] * n

        for i in range(n):
            raw = htmls[i].as_py()
            fb = fallbacks[i].as_py()
            try:
                r = extract(raw, fb)
            except Exception:  # defensive: one bad row must not fail the
                # batch/task — per-row error capture like the reference's
                # error_files side channel (simple_client.py:630-664).
                # extract() is property-tested total, so this is insurance
                # against pathological inputs only.
                r = _FAILED
            texts[i] = r.text
            mds[i] = r.markdown
            spans[i] = [
                {"start": s, "end": e, "kind": k} for (s, e, k) in r.spans
            ]
            images[i] = list(r.images)
            errs[i] = r.error_class
            encs[i] = r.encoding
            nbytes[i] = len(raw) if raw is not None else 0

        yield pa.RecordBatch.from_arrays(
            [
                urls,
                batch.column("warc_ts"),
                batch.column("lang"),
                pa.array(texts, pa.string()),
                pa.array(mds, pa.string()),
                pa.array(spans, pa.list_(_ARROW_SPAN)),
                pa.array(images, pa.list_(pa.string())),
                pa.array(errs, pa.string()),
                pa.array(encs, pa.string()),
                pa.array([EXTRACTOR_VERSION] * n, pa.string()),
                pa.array(nbytes, pa.int64()),
                pa.array([pid] * n, pa.int32()),
            ],
            schema=ARROW_EXTRACTED_SCHEMA,
        )


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages DataFrame → extracted DataFrame (no shuffle introduced here;
    partitioning policy is the pipeline's job — see pipeline.run)."""
    from mistral_ocr_spark.sources.tables import EXTRACTED_SCHEMA

    cols = ["url", "warc_ts", "html", "text", "lang"]
    return pages.select(*cols).mapInArrow(extract_batches, EXTRACTED_SCHEMA)
