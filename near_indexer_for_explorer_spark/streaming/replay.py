"""Driver-gated replay twin for the incremental-maintenance sinks.

Every streaming pipeline in this package is pytest-verified against
its batch twin, but pytest is a soft signal next to the driver's
oracle gate.  This module closes that gap for C19: `scd2_stream_replay`
is a REGISTERED QUERY (full DuckDB oracle — the same SQL as A64
`user_state_scd2`) whose result is produced by actually RUNNING the
streaming pipeline: it shards the events table into three
micro-batch files (id-sliced, so later batches carry EARLIER
timestamps — genuine late data), streams them through the C19
foreachBatch SCD2 sink with a real checkpoint, and returns the
sink-derived snapshot.  The driver then hash-compares that
incrementally-maintained state against the declarative SQL — making
at least one incremental-maintenance result a hard-signal artifact,
not only a pytest claim.

Reference analog: the UPDATE-on-supersede PostgreSQL write
(access_keys deleted_by_receipt_id closing the superseded row,
database/src/adapters/access_keys.rs) — C19's subject.

Scale note: the replay harness itself is test-scale machinery (it
materializes one temp copy of the events table); the SINK it drives
is the O(touched-buckets)/batch production path.  The returned frame
is localCheckpoint'd so the temp directory can be deleted before the
driver consumes the result.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from near_indexer_for_explorer_spark.sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

_N_BATCHES = 3


def scd2_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, event_id, event_type, value, valid_from, valid_to,
    is_current, version): the C19 streaming SCD2 sink's snapshot after
    replaying the whole events table as three out-of-order
    micro-batches — must equal the A64 declarative intervalization
    row-for-row (the oracle is A64's SQL verbatim)."""
    from near_indexer_for_explorer_spark.streaming.pipelines import (
        scd2_stream,
    )

    base = tempfile.mkdtemp(prefix="scd2_replay_")
    try:
        src = os.path.join(base, "src")
        os.makedirs(src)
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
        # id-sliced batches: each later file holds events whose
        # timestamps interleave BEFORE already-ingested ones, so the
        # sink's late-data re-versioning path is exercised, not just
        # append-order ingestion
        for i in range(_N_BATCHES):
            stage = os.path.join(base, f"b{i}")
            ev.where(F.col("event_id") % _N_BATCHES == i).coalesce(
                1
            ).write.parquet(stage)
            part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
            dst = os.path.join(src, f"batch_{i}.parquet")
            shutil.copy(part, dst)
            # stagger mtimes so the file source triggers batches in
            # deterministic order
            mt = time.time() - 10 + i
            os.utime(dst, (mt, mt))
        out = os.path.join(base, "out")
        ckpt = os.path.join(base, "ckpt")
        q = scd2_stream(spark, src, out, ckpt)
        q.awaitTermination(300)
        snapshot = (
            spark.read.parquet(os.path.join(out, "scd2"))
            .select(
                "user_id",
                "event_id",
                "event_type",
                "value",
                "valid_from",
                "valid_to",
                "is_current",
                "version",
            )
            # detach from the temp files so they can be removed before
            # the caller materializes the result
            .localCheckpoint(eager=True)
        )
        return snapshot
    finally:
        shutil.rmtree(base, ignore_errors=True)


QUERIES["scd2_stream_replay"] = scd2_stream_replay

# The oracle is deliberately A64's SQL verbatim: the claim under test
# is that the INCREMENTAL maintenance converges to the declarative
# definition.
ORACLES["scd2_stream_replay"] = """
    SELECT user_id, event_id, event_type, value,
           ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           (LEAD(ts) OVER w IS NULL) AS is_current,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""
