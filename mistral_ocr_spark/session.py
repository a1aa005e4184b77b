"""SparkSession factory with scale-appropriate defaults.

Settings chosen for the 100 TB design point (and harmless at test scale):
AQE on (runtime coalescing + skew-join splitting), modest Arrow batch size
so the Python extraction workers stream instead of buffering whole
partitions, and parquet pushdown left at defaults (on).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mistral-ocr-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    # Shuffle/spill scratch: prefer tmpfs when present. On a real cluster
    # shuffle lands on node-local disks whose aggregate bandwidth scales
    # with the node count; a single box's one shared disk does not, so
    # leaving shuffle on it would under-measure the pipeline's scaling.
    local_dir = os.environ.get(
        "SPARK_LOCAL_DIRS", "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else None
    )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Stream Arrow batches through the Python extraction workers:
        # bounded memory per batch regardless of partition size.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
