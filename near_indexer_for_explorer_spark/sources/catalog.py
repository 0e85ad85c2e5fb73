"""SQL catalog surface.

Users of the reference query its PostgreSQL schema with plain SQL; the
switch-over equivalent is registering the lake tables as views so any
`spark.sql(...)` the explorer runs today works verbatim (same table
names the driver's DuckDB oracle uses: region nation customer supplier
part orders lineitem events documents embeddings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from near_indexer_for_explorer_spark.sources.lake import read_parquet_evolved
from near_indexer_for_explorer_spark.sources.tables import TABLES, load_table

# The reference's deprecated_namespace migration (migrations/
# 2023-04-20-160000: CREATE SCHEMA deprecated; ALTER TABLE ... SET
# SCHEMA deprecated) is a pure CATALOG rename -- the storage never
# moves, the table just answers to a different qualified name.  The
# lake replay is an alias map resolved at the VIEW layer: the
# deprecated name is a view over the canonical one, so a query
# written against either name plans against ONE relation (no copy,
# no second scan source; tests pin sameSemantics).  Our events table
# is the account-change stream analog those renamed tables held.
DEPRECATED_ALIASES: dict[str, str] = {
    "account_changes": "events",
    "assets__fungible_token_events": "events",
}


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every table as a temp view, plus the deprecated-name
    aliases; returns the registered view names."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    for old, canonical in DEPRECATED_ALIASES.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY VIEW `{old}` "
            f"AS SELECT * FROM `{canonical}`"
        )
    return list(TABLES) + list(DEPRECATED_ALIASES)


def register_renamed_lake_table(
    spark: SparkSession,
    path: str,
    canonical: str,
    deprecated_names: tuple[str, ...] = (),
) -> DataFrame:
    """Register an evolved lake read under its canonical name AND any
    deprecated aliases -- ALTER TABLE SET SCHEMA replayed lake-side.

    The files at ``path`` may span schema versions
    (read_parquet_evolved merges them); every alias is a view OVER the
    canonical view, so all names resolve to one relation and a rename
    is one catalog call, never a data rewrite."""
    df = read_parquet_evolved(spark, path)
    df.createOrReplaceTempView(canonical)
    for old in deprecated_names:
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY VIEW `{old}` "
            f"AS SELECT * FROM `{canonical}`"
        )
    return df


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run ANSI SQL against the registered catalog (registering it
    first if needed)."""
    register_views(spark, sf_dir)
    return spark.sql(query)
