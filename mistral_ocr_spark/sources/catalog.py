"""Emulated-Iceberg table layer: parquet data files + atomic JSON manifests.

No Iceberg/Delta jars exist in this sandbox (verified — SURVEY.md §7), so
snapshot semantics are emulated with the same observable behavior the
pipeline needs at 100 TB (where this module would be swapped for real
Iceberg `writeTo(...).append()` / MERGE INTO):

- A **manifest** is a JSON file listing every committed data/lineage file
  and the set of committed (run_id, chunk_id) pairs.
- ``_CURRENT`` is a one-line pointer file updated via ``os.replace`` —
  atomic on POSIX — so readers always see a complete snapshot and a crash
  mid-commit leaves the previous snapshot intact (the hard part (b) of
  SURVEY.md §7: one atomic commit covering BOTH extracted and lineage).
- Uncommitted files from a crashed attempt are invisible (readers go
  through the manifest) and are overwritten by the retry.

This is the Spark re-expression of the reference's idempotent local store
(dedup-before-insert, /root/reference/src/mistral_ocr/simple_client.py:274-287;
cache-first reads, :481-483).
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_CURRENT = "_CURRENT"
_MANIFEST_DIR = "_manifests"


def _empty_manifest() -> dict[str, Any]:
    return {
        "snapshot_id": 0,
        "parent": None,
        "committed_chunks": {},  # run_id -> [chunk_id, ...]
        "data_files": [],
        "lineage_files": [],
    }


def load_manifest(root: str) -> dict[str, Any]:
    cur = os.path.join(root, _CURRENT)
    if not os.path.exists(cur):
        return _empty_manifest()
    with open(cur) as f:
        name = f.read().strip()
    with open(os.path.join(root, _MANIFEST_DIR, name)) as f:
        return json.load(f)


def committed_chunks(root: str, run_id: str) -> set[int]:
    return set(load_manifest(root)["committed_chunks"].get(run_id, []))


def _atomic_write(path: str, payload: str) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def commit_chunk(
    root: str,
    run_id: str,
    chunk_id: int,
    data_files: list[str],
    lineage_files: list[str],
) -> dict[str, Any]:
    """Atomically commit one chunk's data + lineage files as a new snapshot."""
    os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
    m = load_manifest(root)
    new = {
        "snapshot_id": m["snapshot_id"] + 1,
        "parent": m["snapshot_id"],
        "committed_chunks": {
            **m["committed_chunks"],
            run_id: sorted(set(m["committed_chunks"].get(run_id, [])) | {chunk_id}),
        },
        "data_files": m["data_files"] + data_files,
        "lineage_files": m["lineage_files"] + lineage_files,
    }
    name = f"manifest-{new['snapshot_id']:012d}.json"
    _atomic_write(os.path.join(root, _MANIFEST_DIR, name), json.dumps(new, indent=1))
    _atomic_write(os.path.join(root, _CURRENT), name)
    return new


def _read_files(spark: SparkSession, files: list[str], schema) -> DataFrame:
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)


def read_extracted(spark: SparkSession, root: str) -> DataFrame:
    """Committed extracted rows (snapshot-consistent)."""
    from mistral_ocr_spark.sources.tables import EXTRACTED_TABLE_SCHEMA

    return _read_files(spark, load_manifest(root)["data_files"], EXTRACTED_TABLE_SCHEMA)


def read_lineage(spark: SparkSession, root: str) -> DataFrame:
    from mistral_ocr_spark.sources.tables import LINEAGE_SCHEMA

    return _read_files(spark, load_manifest(root)["lineage_files"], LINEAGE_SCHEMA)


def read_extracted_latest(spark: SparkSession, root: str) -> DataFrame:
    """Committed extracted rows with MERGE/upsert read semantics: when a url
    was re-extracted by a later run (run_ids sort lexicographically —
    run-0001, run-0002, …), the newest run's row wins.

    This is the Spark re-expression of the reference's reconcile-by-key
    upsert (J4, /root/reference/src/mistral_ocr/simple_client.py:578-600):
    instead of rewriting files on merge (write amplification at 10^12
    rows), resolution happens at read time over snapshot-consistent files —
    with real Iceberg this becomes MERGE INTO + snapshot expiry.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ext = read_extracted(spark, root)
    w = Window.partitionBy("url").orderBy(F.desc("run_id"), F.desc("extractor_version"))
    return ext.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def read_errors(spark: SparkSession, root: str) -> DataFrame:
    """Failed-row side output (view over extracted — the analog of the
    reference's error_files table, simple_client.py:73-80)."""
    from pyspark.sql import functions as F

    ext = read_extracted(spark, root)
    return ext.filter(F.col("error_class").isNotNull()).select(
        "url",
        "run_id",
        "partition_id",
        "error_class",
        F.col("encoding").alias("message"),
    )


def compact(
    spark: SparkSession,
    root: str,
    target_rows_per_file: int = 250_000,
    expire_old_files: bool = False,
) -> dict[str, Any]:
    """Bin-pack the extracted table's data files into ~target-sized files —
    the Iceberg rewrite_data_files analog. Per-chunk writes at high
    parallelism leave many small files (tiny at test scale, metadata- and
    open-cost-bound at 10^12 rows); compaction rewrites them under a new
    snapshot while preserving committed-chunk resume state and lineage.

    ``expire_old_files`` deletes the superseded files after the commit
    (readers holding the old manifest in a long transaction would need
    snapshot-expiry grace periods on a real system; tests keep it False).
    """
    import math

    from pyspark.sql import functions as F  # noqa: F401  (parity with callers)

    m = load_manifest(root)
    if not m["data_files"]:
        return m
    from mistral_ocr_spark.sources.tables import EXTRACTED_TABLE_SCHEMA

    df = spark.read.schema(EXTRACTED_TABLE_SCHEMA).parquet(*m["data_files"])
    total = df.count()
    n_files = max(1, math.ceil(total / target_rows_per_file))
    out_dir = os.path.join(root, "data", f"compact-{m['snapshot_id'] + 1}")
    df.repartition(n_files).write.mode("overwrite").parquet(out_dir)
    new_files = list_parquet_files(out_dir)

    new = {
        "snapshot_id": m["snapshot_id"] + 1,
        "parent": m["snapshot_id"],
        "committed_chunks": m["committed_chunks"],
        "data_files": new_files,
        "lineage_files": m["lineage_files"],
    }
    name = f"manifest-{new['snapshot_id']:012d}.json"
    _atomic_write(os.path.join(root, _MANIFEST_DIR, name), json.dumps(new, indent=1))
    _atomic_write(os.path.join(root, _CURRENT), name)
    if expire_old_files:
        for f in m["data_files"]:
            try:
                os.remove(f)
            except OSError:
                pass
    return new


def list_parquet_files(path: str) -> list[str]:
    """Absolute paths of the parquet part files under a just-written dir."""
    out = []
    for dirpath, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet") and not n.startswith("."):
                out.append(os.path.join(dirpath, n))
    return sorted(out)
