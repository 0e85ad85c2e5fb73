"""SparkSession builder tuned for this engine.

Settings chosen for scale (see SURVEY.md section 6):
- AQE on: runtime partition coalescing + skew-join splitting replaces
  hand-tuned shuffle partition counts at 100 TB.
- UTC session timezone: date bucketing must be engine- and
  host-independent (the DuckDB oracle runs in UTC).
- Arrow on: any Pandas-UDF path (multimodal decode, stateful
  streaming) moves batches, never rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "near-indexer-for-explorer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults applied."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    else:
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()


def apply_session_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-provided
    SparkSession (e.g. the driver's).  Only touches conf that is safe to
    change after session start."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark
