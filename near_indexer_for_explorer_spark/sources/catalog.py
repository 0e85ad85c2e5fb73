"""SQL catalog surface.

Users of the reference query its PostgreSQL schema with plain SQL; the
switch-over equivalent is registering the lake tables as views so any
`spark.sql(...)` the explorer runs today works verbatim (same table
names the driver's DuckDB oracle uses: region nation customer supplier
part orders lineitem events documents embeddings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from near_indexer_for_explorer_spark.sources.tables import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every table as a temp view; returns the view names."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TABLES)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run ANSI SQL against the registered catalog (registering it
    first if needed)."""
    register_views(spark, sf_dir)
    return spark.sql(query)
