"""Bucketed table layout: shuffle-free co-located fact-fact joins.

SURVEY.md section 6 commits every fact-fact join to the natural FK
(orderkey) precisely so a bucketed layout can co-locate them; this
module materializes that layout.  The reference's analog is its
PostgreSQL clustered primary keys (receipts/transactions keyed by
hash, database/src/schema.rs) — the engine-side equivalent of "reads
of the same key land together".

``write_bucketed`` writes orders and lineitem as Spark bucketed tables
(hash-bucketed AND sorted by the join key); ``order_lines_bucketed_join``
then joins them with ZERO Exchange in the plan — each bucket pair
sort-merges locally.  At 100 TB this turns the biggest repeated
shuffle (the orders⋈lineitem backbone every enrichment query pays)
into a one-time layout cost amortized across every downstream query;
bucket counts scale with cluster width (pick ~2-4x executor count).

tests/test_plans.py::test_bucketed_join_has_no_exchange asserts the
Exchange-free plan with broadcast disabled, which is the whole point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from near_indexer_for_explorer_spark.sources.tables import load_table

BUCKETS = 8


def write_bucketed(
    spark: SparkSession, sf_dir: str, path: str, buckets: int = BUCKETS
) -> None:
    """Materialize orders + lineitem as bucketed/sorted parquet tables
    (catalog tables `orders_b` / `lineitem_b` stored under `path`)."""
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .format("parquet")
            .option("path", f"{path}/{name}_b")
            .bucketBy(buckets, key)
            .sortBy(key)
            .saveAsTable(f"{name}_b")
        )


def order_lines_bucketed_join(spark: SparkSession) -> DataFrame:
    """orders⋈lineitem over the bucketed layout — Exchange-free."""
    orders = spark.table("orders_b")
    lines = spark.table("lineitem_b")
    return orders.join(
        lines, orders.o_orderkey == lines.l_orderkey
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
    )
