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
        # events.parquet has shipped as either TIMESTAMP(NANOS) (which
        # Spark's parquet reader rejects outright unless nanos are read
        # as long) or plain TIMESTAMP(MICROS); normalize both layouts to
        # a microsecond TIMESTAMP_NTZ — the same nanos->micros truncation
        # DuckDB applies, so oracle timestamps compare equal.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":  # nanos surfaced as long
            ts = F.timestamp_micros(F.expr("ts div 1000"))
        else:  # already a timestamp (ntz or ltz)
            ts = F.col("ts")
        return df.withColumn("ts", ts.cast("timestamp_ntz"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def parallelize_small_scan(df: DataFrame) -> DataFrame:
    """Repartition to session parallelism when the scan carries fewer
    partitions (BENCH_BASELINE r13: a small lake scans as one file =
    ONE partition, which runs the first — often the heaviest — stage
    on one core; partition COUNT is invisible in `explain`, so this is
    a profiling finding, not a plan-census one).  Metadata-only gate:
    a production-scale scan already exceeds parallelism and no shuffle
    is added.  Callers must be row-independent up to their first
    shuffle (true of every Arrow kernel and per-row projection here);
    the round-robin redistribution then cannot change any output."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return df
