"""Batch sink surface (the reference's PostgreSQL write path,
re-expressed for a data-lake engine).

The reference sinks every normalized table into PostgreSQL with
idempotent inserts (ON CONFLICT DO NOTHING) and guarded upserts
(database/src/adapters/*.rs).  At 100 TB the equivalent catalog is
partitioned/bucketed parquet:

- ``write_partitioned``: date-partitioned append (blocks/chunks
  analog) — partition pruning serves the time-range queries the
  reference indexes by block_timestamp.
- ``write_bucketed``: bucketed-by-key table (transactions/receipts
  analog) — co-locates future joins on the bucket key so the
  orderkey-style fact-fact join needs no shuffle.
- ``upsert_parquet``: last-write-wins merge by key, the batch twin of
  streaming.pipelines.foreach_batch_keyed_upsert.
- ``write_jdbc``: the literal PostgreSQL path, gated on a JDBC URL —
  this container has no database server or driver jar, so it stays
  unexercised here but keeps the reference's deployment shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, out_dir: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Date/key-partitioned parquet append — partition pruning is the
    lake's index."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(out_dir)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table: joins/aggregations keyed on bucket_col
    skip the shuffle entirely (Spark reads co-located buckets)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table_name)


def upsert_parquet(
    batch: DataFrame,
    snapshot_dir: str,
    key_cols: list[str],
    order_cols: list[str],
    n_buckets: int = 16,
) -> None:
    """Last-write-wins keyed merge into a hash-partitioned parquet
    snapshot (the batch twin of the streaming foreachBatch sink;
    semantics mirror adapters/accounts.rs:93 guarded updates).

    The snapshot is partitioned on __bucket = xxhash64(keys) %
    n_buckets; a merge reads only the buckets holding the batch's keys
    (partition-pruned) and commits them via dynamic partition
    overwrite, so the cost is O(touched state) — no full-snapshot
    rewrite, no driver-local directory swaps."""
    spark = batch.sparkSession
    snapshot = os.path.join(snapshot_dir, "state")
    batch = batch.withColumn(
        "__bucket",
        F.pmod(F.xxhash64(*key_cols), F.lit(n_buckets)).cast("int"),
    )
    current = batch
    if os.path.exists(snapshot):
        touched = [
            r["__bucket"] for r in batch.select("__bucket").distinct().collect()
        ]
        existing = spark.read.parquet(snapshot).where(
            F.col("__bucket").isin(touched)
        )
        current = existing.unionByName(batch)
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    merged = (
        current.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    ).localCheckpoint(eager=True)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__bucket")
        .parquet(snapshot)
    )


def write_jdbc(
    df: DataFrame,
    table: str,
    url: str | None = None,
    mode: str = "append",
    **options: str,
) -> bool:
    """PostgreSQL sink, gated: returns False (no-op) when no JDBC URL
    is configured — this container has neither a server nor a driver
    jar.  With SPARK_GRAFT_JDBC_URL set (e.g.
    jdbc:postgresql://host/db) it performs the reference's actual sink.
    """
    url = url or os.environ.get("SPARK_GRAFT_JDBC_URL")
    if not url:
        return False
    df.write.mode(mode).options(**options).jdbc(url, table)
    return True


def compact_parquet(
    spark, src_dir: str, out_dir: str, target_mb: int = 128
) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    ~target_mb.  The reference never needs this (PostgreSQL), but every
    streaming lake sink accumulates micro-batch files and 100 TB scans
    die on file-listing + tiny-row-group overhead; nightly compaction
    is part of the sink's contract.  Returns the output file count."""
    import glob
    import os

    df = spark.read.parquet(src_dir)
    size_bytes = sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(src_dir, "**", "*.parquet"), recursive=True)
    )
    n_files = max(1, round(size_bytes / (target_mb * 1024 * 1024)))
    df.repartition(n_files).write.mode("overwrite").parquet(out_dir)
    return len(glob.glob(os.path.join(out_dir, "*.parquet")))


def compact_parquet_zorder(
    spark,
    src_dir: str,
    out_dir: str,
    zcols: tuple[str, str],
    n_files: int = 16,
) -> int:
    """Z-ORDERED compaction: rewrite a parquet directory into
    `n_files` files clustered on the bit-interleave of two columns —
    the writer side of sources/layout.py's analysis (Delta OPTIMIZE
    ZORDER BY analog).  After this rewrite, per-file min/max footer
    stats are tight in BOTH columns, so scans filtered on EITHER key
    prune most files (the lake's answer to the reference keeping two
    btree indexes per fact table).

    Layout mechanics: each key is scaled to a 16-bit grid against its
    observed max (exact integer arithmetic), interleaved with the
    layout module's generated shift/mask expression, and the frame is
    `repartitionByRange(zvalue)` — Spark's range partitioner samples
    boundaries, so file SIZES are approximate but the CLUSTERING is
    exact, which is what pruning needs.  Returns the output file
    count.

    Precondition: both key columns must be NON-NEGATIVE integers.
    The scaling runs in BIGINT (cast below) so an INT32 key above
    ~32767 cannot silently overflow `key * 65536`; negative keys
    would still produce garbage z-values (clustering degrades, no
    error), so they are rejected up front."""
    import glob
    import os

    from pyspark.sql import functions as F

    from near_indexer_for_explorer_spark.sources.layout import (
        _interleave_spark,
    )

    df = spark.read.parquet(src_dir)
    a, b = zcols
    # ONE stats scan serves both the negative-key guard and the
    # scaling: the collected extremes are inlined as literals, so the
    # rewrite is exactly two jobs (stats scan + clustered write) — no
    # second aggregation riding a crossJoin
    stats = df.agg(
        F.max(F.col(a).cast("bigint")).alias("ma"),
        F.max(F.col(b).cast("bigint")).alias("mb"),
        F.min(F.col(a).cast("bigint")).alias("mina"),
        F.min(F.col(b).cast("bigint")).alias("minb"),
    ).first()
    if (stats["mina"] is not None and stats["mina"] < 0) or (
        stats["minb"] is not None and stats["minb"] < 0
    ):
        raise ValueError(
            f"compact_parquet_zorder requires non-negative integer keys; "
            f"got min({a})={stats['mina']}, min({b})={stats['minb']}"
        )
    ma = 0 if stats["ma"] is None else stats["ma"]
    mb = 0 if stats["mb"] is None else stats["mb"]
    # mirror the negative-key guard for the other silent-garbage edge:
    # a BIGINT key above (2^63-1)/65536 would overflow `key * 65536`
    # under non-ANSI Spark (wraps, no error) and destroy the clustering
    _Z_MAX = (2**63 - 1) // 65536
    if ma > _Z_MAX or mb > _Z_MAX:
        raise ValueError(
            f"compact_parquet_zorder keys must be <= {_Z_MAX} "
            f"(BIGINT overflow in the 16-bit grid scaling); "
            f"got max({a})={ma}, max({b})={mb}"
        )
    z = (
        df.withColumn(
            "__bx", F.expr(f"(CAST({a} AS BIGINT) * 65536) div ({ma} + 1)")
        )
        .withColumn(
            "__by", F.expr(f"(CAST({b} AS BIGINT) * 65536) div ({mb} + 1)")
        )
        .withColumn("__z", F.expr(_interleave_spark("__bx", "__by")))
        .drop("ma", "mb", "__bx", "__by")
    )
    (
        z.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return len(glob.glob(os.path.join(out_dir, "*.parquet")))


def convert_parquet_to_orc(
    spark: SparkSession, src_dir: str, out_dir: str
) -> int:
    """Rewrite a parquet table as ORC (Spark's other built-in columnar
    format — ORC-native warehouses read the lake directly, and ORC's
    row-group indexes serve the same min/max pruning parquet footers
    do).  Returns the row count written; the round-trip is tested
    value-identical."""
    df = spark.read.parquet(src_dir)
    df.write.mode("overwrite").orc(out_dir)
    return spark.read.orc(out_dir).count()


def publish_atomic(
    df: DataFrame,
    out_dir: str,
    audit=None,
) -> str:
    """Write-audit-publish (WAP): write the frame to a staging
    directory, run the audit callback against the STAGED files, and
    only then atomically rename it into place as a new immutable
    version — readers (``read_published``) never see a half-written
    or audit-failed snapshot.  This is the lakehouse publication
    discipline (Iceberg/Delta's WAP pattern) on plain parquet:
    versioned dirs ``v=<n>`` + a ``_PUBLISHED`` marker written AFTER
    the rename, so a crash at any point leaves either the old version
    readable or the new one fully live, never a torn state.

    ``audit``: optional callable(staged_df) -> bool; a False/raise
    rejects the publish and removes the staging dir.  Returns the
    published version directory path (or raises).
    """
    import glob
    import shutil
    import uuid

    spark = df.sparkSession
    # number past EVERY existing version dir, marked or not: a crash
    # between rename and marker leaves an unmarked v=<n> that readers
    # ignore but the next publish must not collide with
    versions = [
        int(p.rsplit("=", 1)[1])
        for p in glob.glob(os.path.join(out_dir, "v=*"))
    ]
    next_v = max(versions, default=-1) + 1
    staging = os.path.join(out_dir, f"_staging_{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").parquet(staging)
    try:
        if audit is not None and not audit(spark.read.parquet(staging)):
            raise ValueError("publish_atomic: audit rejected the snapshot")
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    final = os.path.join(out_dir, f"v={next_v}")
    os.rename(staging, final)  # atomic on one filesystem
    with open(os.path.join(final, "_PUBLISHED"), "w") as fh:
        fh.write("ok\n")
    return final


def read_published(spark, out_dir: str) -> DataFrame:
    """Read the newest fully-published WAP version; raises if nothing
    has ever been published (staged/torn versions are invisible)."""
    import glob

    versions = [
        (int(p.rsplit("=", 1)[1]), p)
        for p in glob.glob(os.path.join(out_dir, "v=*"))
        if os.path.exists(os.path.join(p, "_PUBLISHED"))
    ]
    if not versions:
        raise FileNotFoundError(f"no published version under {out_dir}")
    return spark.read.parquet(max(versions)[1])
