"""JSONL edge-format + download-tree tests — models the reference's
batch-file content assertions (/root/reference/tests/unit/
test_simple_client.py:364-393: parse the emitted JSONL, assert custom_id /
method / data-URL prefix) and download-tree layout tests."""

from __future__ import annotations

import base64
import json
import os
import shutil
import tempfile

import pytest

from mistral_ocr_spark.operators.extract import extract_pages
from mistral_ocr_spark.sources.fixtures import generate_pages
from mistral_ocr_spark.sources.io import (
    export_download_tree,
    pages_to_request_jsonl,
    read_result_jsonl,
)


@pytest.fixture()
def tmp():
    d = tempfile.mkdtemp(prefix="ocr_io_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_request_jsonl_shape(spark, tmp):
    pages = generate_pages(spark, 50, partitions=1)
    path = f"{tmp}/batch"
    pages_to_request_jsonl(pages).coalesce(1).write.text(path)
    lines = []
    for fn in os.listdir(path):
        if fn.startswith("part-"):
            with open(os.path.join(path, fn)) as f:
                lines += [ln for ln in f.read().splitlines() if ln.strip()]
    assert len(lines) > 0
    raw = {r.url: r.html for r in pages.collect() if r.html is not None}
    assert len(lines) == len(raw)
    for ln in lines:
        obj = json.loads(ln)
        assert obj["method"] == "POST"
        assert obj["custom_id"].startswith("https://")
        durl = obj["body"]["document_url"]
        assert durl.startswith("data:text/html;base64,")
        assert base64.b64decode(durl.split(",", 1)[1]) == raw[obj["custom_id"]]


def test_result_jsonl_roundtrip(spark, tmp):
    path = f"{tmp}/results.jsonl"
    with open(path, "w") as f:
        f.write(
            json.dumps(
                {
                    "custom_id": "https://h/x.html",
                    "response": {"body": {"text": "hello", "markdown": "# hello"}},
                }
            )
            + "\n\n"  # blank line must be skipped (P6)
            + json.dumps(
                {
                    "custom_id": "https://h/y.html",
                    "response": {"body": {"text": "world", "markdown": "world"}},
                }
            )
            + "\n"
        )
    out = {r.url: (r.text, r.markdown) for r in read_result_jsonl(spark, path).collect()}
    assert out == {
        "https://h/x.html": ("hello", "# hello"),
        "https://h/y.html": ("world", "world"),
    }


def test_read_pages_recursive_glob(spark, tmp):
    from mistral_ocr_spark.sources.io import read_pages

    generate_pages(spark, 30, partitions=1).write.parquet(f"{tmp}/corpus/a/part1")
    generate_pages(spark, 20, partitions=1).selectExpr(
        "concat(url, '?b') AS url", "warc_ts", "html", "text", "lang"
    ).write.parquet(f"{tmp}/corpus/b/part2")

    assert read_pages(spark, f"{tmp}/corpus", recursive=True).count() == 50
    only_a = read_pages(spark, f"{tmp}/corpus/a/part1", glob="*.parquet")
    assert only_a.count() == 30


def test_export_download_tree(spark, tmp):
    ext = extract_pages(generate_pages(spark, 40, partitions=1))
    n = export_download_tree(ext, f"{tmp}/tree")
    assert n == 40
    hosts = os.listdir(f"{tmp}/tree")
    assert any(h == "hot.example.com" for h in hosts)
    some = next(
        os.path.join(dp, f)
        for dp, _d, fs in os.walk(f"{tmp}/tree")
        for f in fs
        if f.endswith(".txt")
    )
    with open(some) as f:
        assert len(f.read()) > 0
