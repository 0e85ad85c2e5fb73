"""Batch parquet table registry.

The reference indexer materializes its normalized tables in PostgreSQL
(/root/reference/database/migrations/2020-12-07-153402_initial_schema);
here the equivalent catalog is a directory of parquet tables.  Loads are
lazy — Catalyst prunes columns and pushes filters down to the scan, so
"load everything" costs only the metadata of what a plan actually reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's parquet
        # reader rejects outright; read nanos as long and truncate to a
        # microsecond TIMESTAMP_NTZ — the same nanos->micros truncation
        # DuckDB applies, so oracle timestamps compare equal.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
