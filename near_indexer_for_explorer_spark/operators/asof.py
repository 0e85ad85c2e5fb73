"""As-of join — a custom operator Spark lacks natively, built as a
composition of union + window (no range-join explosion, single keyed
shuffle), plus SCD lifecycle tracking.

Reference analog: receipts are attributed to the most recent
originating transaction (database/src/receipts_cache.rs — a
time-ordered lookup of 'the latest tx hash at or before this receipt');
access_keys carry nullable created_by/deleted_by receipt ids
(database/src/models/access_keys.rs:9).

Scale design: the union-window as-of is O(n log n) within each key
partition and shuffles ONCE on the join key — unlike the naive
range-join (t1.ts >= t2.ts) which Spark would plan as a broadcast
nested loop.  This is the standard large-scale as-of pattern.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from near_indexer_for_explorer_spark.sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_value_cols: list[str],
    tie_break: str,
) -> DataFrame:
    """Backward-inclusive as-of join: for every left row, attach the
    most recent right row with right.ts <= left.ts, matching on `on`.

    Implementation: tag both sides, union, and carry the last non-null
    right values forward with an ignore-nulls window — at equal
    timestamps the right row sorts first (inclusive semantics, matching
    DuckDB's ASOF `>=`)."""
    l_tagged = left.withColumn("__is_right", F.lit(0))
    for c in right_value_cols:
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.select(
        on, ts, tie_break, *[c for c in right_value_cols if c not in (on, ts, tie_break)]
    ).withColumn("__is_right", F.lit(1))
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(dict(l_tagged.dtypes)[c])
            )
    merged = l_tagged.unionByName(r_tagged.select(l_tagged.columns))
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("__is_right").desc(), F.col(tie_break).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged
    for c in right_value_cols:
        carried = carried.withColumn(
            f"__asof_{c}",
            F.last(F.when(F.col("__is_right") == 1, F.col(c)), ignorenulls=True).over(
                w
            ),
        )
    out = carried.where(F.col("__is_right") == 0)
    for c in right_value_cols:
        out = out.drop(c).withColumnRenamed(f"__asof_{c}", c)
    return out.drop("__is_right")


# ---------------------------------------------------------------------------
# A19: as-of attribution (receipts_cache.rs analog): every purchase is
# attributed to the user's most recent click at-or-before it.
# ---------------------------------------------------------------------------
ORACLES["asof_purchase_attribution"] = """
    WITH purchases AS (SELECT * FROM events WHERE event_type = 'purchase'),
    clicks AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.event_id AS click_event_id,
           c.value AS click_value
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_event_id"),
        F.col("value").alias("click_value"),
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        ts="ts",
        right_value_cols=["click_event_id", "click_value"],
        tie_break="click_event_id",
    ).select("event_id", "user_id", "ts", "value", "click_event_id", "click_value")


QUERIES["asof_purchase_attribution"] = asof_purchase_attribution


# ---------------------------------------------------------------------------
# A20: SCD lifecycle (access_keys.rs analog: nullable created_by /
# deleted_by, latest-state flag).
# ---------------------------------------------------------------------------
ORACLES["user_lifecycle"] = """
    SELECT user_id,
           MIN(CASE WHEN event_type = 'signup' THEN event_id END) AS first_signup_event_id,
           MAX(CASE WHEN event_type = 'error' THEN event_id END) AS last_error_event_id,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts,
           arg_max(event_type, ts) <> 'error' AS is_active
    FROM events
    GROUP BY user_id
"""


def user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nullable created-by/deleted-by lifecycle per key, one aggregation
    pass (conditional aggs + max_by for the latest state)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("event_id"))).alias(
            "first_signup_event_id"
        ),
        F.max(F.when(F.col("event_type") == "error", F.col("event_id"))).alias(
            "last_error_event_id"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(F.lit(0))
        ).alias("n_purchases"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        (F.max_by("event_type", F.col("ts")) != "error").alias("is_active"),
    )


QUERIES["user_lifecycle"] = user_lifecycle
