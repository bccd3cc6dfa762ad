"""SparkSession factory tuned for the crawl engine.

Defaults are sized for the sandbox (local[32], 128 GiB) but every knob is
what we would set on a 1000-executor cluster too: AQE on (runtime
re-planning, skew-join splitting, partition coalescing), Arrow on (all our
Python surface is vectorized pandas/Arrow UDFs — never per-row Python),
and shuffle partitions sized to cores locally / to cluster size in prod.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "crawler_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    On a real cluster this is ``spark-submit --py-files crawler_spark.zip``
    with the same conf; locally master defaults to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    sp = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- planner: let Catalyst + AQE do their job -------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", str(sp))
        # --- Python surface: Arrow everywhere ---------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # pin worker reuse (defaults true, but scaling efficiency depends
        # on it: forking a fresh python worker per task would charge
        # startup to every task at the high-core level)
        .config("spark.python.worker.reuse", "true")
        # binary image payloads: bound Arrow batch bytes so executor memory
        # stays bounded when `bytes` columns flow through mapInArrow
        .config("spark.sql.execution.arrow.pyspark.fallback.enabled", "false")
        # --- scan sizing: 128 MiB splits, same as prod ------------------
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # Iceberg-compatible timestamps (INT96 is banned by the Iceberg
        # spec AND writes no row-group min/max stats — the store's
        # manifest column stats harvest footers at commit time)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/crawler_spark_warehouse")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver testdata table (column pruning + filter pushdown
    happen at the parquet scan — SURVEY.md §2.1 S1-S3)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
