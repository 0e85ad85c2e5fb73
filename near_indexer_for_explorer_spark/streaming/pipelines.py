"""Structured Streaming pipelines (SURVEY.md section 2C).

The reference indexer is a continuous loop: poll NEAR Lake for new
block files -> normalize -> write to PostgreSQL with idempotent inserts
and keyed upserts (/root/reference/indexer/src/main.rs,
database/src/adapters/*.rs).  Here that becomes:

- a file-source ``readStream`` (new parquet files = new block batches),
- declarative normalization (same column logic as the batch plans),
- watermarked windowed aggregation for late data,
- ``dropDuplicatesWithinWatermark`` for at-least-once dedup,
- a ``foreachBatch`` last-write-wins keyed sink (JDBC stand-in: the
  container has no database server, so the sink targets a parquet
  "table" with the same merge semantics the reference implements in
  SQL: insert-or-update guarded by the ordering column, accounts.rs:93),
- ``applyInPandasWithState`` stateful sessionization (sessions span
  micro-batches; state carries the open session).

Scale notes: every stateful stage is keyed on user_id (high
cardinality, so state shards evenly); watermarks bound state size;
sinks write partitioned parquet and are idempotent per batch_id, which
is what makes restarts exactly-once at 100 TB.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from near_indexer_for_explorer_spark.operators.corpus import (
    _PACK_BUDGET,
    _SPLIT_MOD,
    _hash_bucket,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, "
    "event_type string, value double, props string"
)

SESSION_GAP_S = 1800.0


def read_event_stream(
    spark: SparkSession,
    src_dir: str,
    max_files_per_trigger: int | None = None,
    start_ts: str | None = None,
) -> DataFrame:
    """File-source stream: each new parquet file in src_dir is a batch
    of events (the NEAR Lake 'new block object landed in S3' analog).

    ``start_ts`` mirrors the reference's sync-mode config
    (indexer/src/configs.rs: FromLatest / FromBlockHeight /
    FromInterruption): FromInterruption is the checkpoint; a 'from
    height' start is an event-time lower bound pushed into every
    batch's scan."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src_dir)
    if start_ts is not None:
        stream = stream.where(F.col("ts") >= F.lit(start_ts).cast("timestamp_ntz"))
    return stream


def normalize_events(stream: DataFrame) -> DataFrame:
    """The streaming twin of the batch normalization: date bucket +
    JSON payload extraction (adapters/receipts.rs arg parsing analog)."""
    return stream.withColumn("event_date", F.to_date("ts")).withColumn(
        "k", F.get_json_object("props", "$.k").cast("long")
    )


def ingest_to_parquet(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
):
    """C1: continuous ingest -> normalized parquet sink, exactly-once
    via checkpointed file-source offsets."""
    stream = normalize_events(read_event_stream(spark, src_dir))
    return (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    spark: SparkSession, src_dir: str, query_name: str
):
    """C2: 10-minute tumbling-window counts with a 1-hour watermark —
    the per-block-interval stats rollup, late-data-safe."""
    stream = read_event_stream(spark, src_dir)
    # watermarks require TIMESTAMP (ltz); session tz is pinned UTC so
    # the ntz->ltz cast is value-preserving, and the window start is
    # cast back to ntz to match the batch twin's output type
    agg = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )


def dedup_event_stream(
    spark: SparkSession, src_dir: str, query_name: str
):
    """C3: at-least-once -> exactly-once by key within the watermark
    horizon (ON CONFLICT (event_id) DO NOTHING, streaming edition)."""
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    deduped = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "30 days")
        .dropDuplicatesWithinWatermark(["event_id"])
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    )
    return (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


N_STATE_BUCKETS = 16


def foreach_batch_keyed_upsert(
    out_dir: str, n_buckets: int = N_STATE_BUCKETS
) -> Callable[[DataFrame, int], None]:
    """C4: last-write-wins keyed sink for foreachBatch, partitioned so a
    micro-batch only rewrites the state partitions it touches.

    Merge semantics mirror accounts.rs:93: keep the row with the
    greatest (ts, event_id) per user_id; re-delivering a batch cannot
    change the outcome (idempotent), which is the exactly-once contract
    a JDBC sink needs.

    Scale design: the snapshot is hash-partitioned on
    bucket = user_id % n_buckets.  Each batch reads ONLY the buckets
    containing its keys (partition pruning on the snapshot scan), merges
    them with the batch, and commits via dynamic partition overwrite —
    untouched buckets' files are never read or rewritten, so the
    per-batch cost is O(touched state), not O(total state).  The merged
    buckets are localCheckpoint'ed before the write to cut the lineage
    back to the files being overwritten.  On a real deployment the same
    shape becomes MERGE INTO an Iceberg/Delta table keyed on user_id."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        spark = batch_df.sparkSession
        snapshot = os.path.join(out_dir, "state")
        batch = batch_df.withColumn(
            "bucket", F.pmod(F.col("user_id"), F.lit(n_buckets)).cast("int")
        )
        current = batch
        if os.path.exists(snapshot):
            touched = [
                r["bucket"] for r in batch.select("bucket").distinct().collect()
            ]
            existing = spark.read.parquet(snapshot).where(
                F.col("bucket").isin(touched)
            )
            current = existing.unionByName(batch)
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        merged = (
            current.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        ).localCheckpoint(eager=True)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(snapshot)
        )

    return sink


def upsert_user_state(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
):
    """C4 driver: stream -> foreachBatch last-write-wins user state."""
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    return (
        stream.writeStream.foreachBatch(foreach_batch_keyed_upsert(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start double, session_end double, "
    "n_events long, session_value double"
)
SESSION_STATE_SCHEMA = "start double, last double, n bigint, total double"


def make_session_kernel():
    """applyInPandasWithState kernel (by-value closure: executors need
    no package on PYTHONPATH).  State = the open session; rows arrive
    per micro-batch, sessions that close (gap > 30 min) are emitted,
    the trailing open session survives in state for the next batch."""
    gap = SESSION_GAP_S

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0
        closed = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for ts, value in zip(rows["ts"], rows["value"]):
            es = ts.timestamp()
            if last is not None and es < last:
                # late arrival (older than the open session's frontier):
                # absorb into the open session without moving time
                # backward — the deterministic analog of the reference
                # accepting late receipts into the already-open block
                n += 1
                total += float(value)
                continue
            if last is not None and es - last > gap:
                closed.append((user_id, start, last, n, round(total, 2)))
                start, n, total = es, 0, 0.0
            if start is None:
                start = es
            last = es
            n += 1
            total += float(value)
        state.update((start, last, n, round(total, 2)))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_start",
                    "session_end",
                    "n_events",
                    "session_value",
                ],
            )

    return update


def stateful_sessionize(
    spark: SparkSession, src_dir: str, query_name: str
):
    """C5: custom stateful operator — gap-based sessionization where
    sessions span micro-batches via explicit group state."""
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        make_session_kernel(),
        SESSION_OUTPUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    return (
        sessions.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def enrich_stream_with_dim(
    spark: SparkSession,
    src_dir: str,
    dim_df: DataFrame,
    query_name: str,
):
    """C6: stream-static join — enrich the event stream with a slowly-
    changing dimension snapshot (the reference joins every receipt to
    its originating transaction metadata the same way; here the static
    side is broadcast per micro-batch, so the stream never shuffles)."""
    stream = read_event_stream(spark, src_dir)
    enriched = stream.join(F.broadcast(dim_df), on="user_id", how="left")
    return (
        enriched.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def foreach_batch_daily_rollup(out_dir: str) -> Callable[[DataFrame, int], None]:
    """C7: incremental continuous aggregate (hypertable-rollup analog,
    and the incremental twin of aggregated__circulating_supply).

    Each micro-batch is aggregated to per-day partials which MERGE into
    the snapshot by summing with the existing partials — the rollup is
    always query-ready without rescanning history.  Partials use exact
    decimals so merge order never changes the result.

    Scale design: the snapshot is partitioned by event_date; a batch
    reads only the dates it touches (partition-pruned scan) and commits
    them via dynamic partition overwrite, leaving every other day's
    files untouched — per-batch cost is O(days in batch), not O(all
    history)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        snapshot = os.path.join(out_dir, "rollup")
        partial = (
            batch_df.groupBy(F.to_date("ts").alias("event_date"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(12,2)"))
                .cast("decimal(20,2)")
                .alias("total_value_dec"),
            )
        )
        if os.path.exists(snapshot):
            touched = [
                r["event_date"]
                for r in partial.select("event_date").distinct().collect()
            ]
            existing = spark.read.parquet(snapshot).where(
                F.col("event_date").isin(touched)
            )
            partial = (
                existing.unionByName(partial)
                .groupBy("event_date")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("total_value_dec")
                    .cast("decimal(20,2)")
                    .alias("total_value_dec"),
                )
            )
        partial = partial.localCheckpoint(eager=True)
        (
            partial.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("event_date")
            .parquet(snapshot)
        )

    return sink


def incremental_daily_rollup(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
):
    """C7 driver: stream -> incrementally-maintained daily rollup."""
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    return (
        stream.writeStream.foreachBatch(foreach_batch_daily_rollup(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def foreach_batch_jdbc(table: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch -> JDBC sink (the reference's literal PostgreSQL
    write path).  Gated like sources.sinks.write_jdbc: a no-op without
    SPARK_GRAFT_JDBC_URL (this container has no server/driver jar);
    with the URL set, each micro-batch appends to the table and the
    gated integration test in tests/test_streaming.py exercises the
    full stream -> JDBC path."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from near_indexer_for_explorer_spark.sources.sinks import write_jdbc

        write_jdbc(batch_df, table)

    return sink


ATTRIBUTION_WINDOW = "30 minutes"


def stream_stream_attribution(
    spark: SparkSession,
    src_dir: str,
    query_name: str,
    join_type: str = "inner",
):
    """C8: watermarked stream-stream join — the true Spark analog of the
    reference's receipts_cache (database/src/receipts_cache.rs:1-16,
    adapters/receipts.rs:40): receipts must be matched to transactions
    that arrived in EARLIER streamed blocks, so the match state must
    persist across micro-batches with bounded memory.

    Purchases (receipts) join to every click (transaction) by the same
    user within the preceding ATTRIBUTION_WINDOW.  Both sides carry a
    1-hour watermark and the join condition bounds c_ts to
    [p_ts - window, p_ts], so Spark evicts click state once the
    purchase-side watermark passes p_ts, and drops events arriving more
    than 1 hour late — the late policy is explicit, not accidental.
    join_type='left_outer' additionally emits unmatched purchases with
    null click columns once the watermark proves no match can arrive."""
    purchases = (
        read_event_stream(spark, src_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("ts").cast("timestamp").alias("p_ts"),
            "user_id",
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        read_event_stream(spark, src_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_event_id"),
            F.col("ts").cast("timestamp").alias("c_ts"),
            F.col("user_id").alias("c_user_id"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "user_id = c_user_id "
            f"AND c_ts >= p_ts - INTERVAL {ATTRIBUTION_WINDOW} "
            "AND c_ts <= p_ts"
        ),
        join_type,
    ).select("p_event_id", "user_id", "p_ts", "p_value", "c_event_id", "c_ts")
    return (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def bootstrap_user_state(
    genesis_df: DataFrame, out_dir: str, n_buckets: int = N_STATE_BUCKETS
) -> None:
    """C9: genesis-style bootstrap (database/src/adapters/genesis.rs:
    1-132 analog): bulk-load an initial keyed state snapshot in the
    exact partitioned layout foreach_batch_keyed_upsert maintains, so a
    stream started afterwards continues merging into it WITHOUT
    reprocessing history — batch backfill and streaming tail compose
    through the shared last-write-wins contract."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    state = (
        genesis_df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
        .withColumn(
            "bucket", F.pmod(F.col("user_id"), F.lit(n_buckets)).cast("int")
        )
    )
    (
        state.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(os.path.join(out_dir, "state"))
    )


def soak_user_state(
    spark: SparkSession,
    out_dir: str,
    checkpoint_dir: str,
    rows_per_batch: int = 1000,
    n_users: int = 200,
    timings: list | None = None,
):
    """C10: rate-source soak of the C4 partitioned upsert sink — the
    load-shaped analog of the reference's months-long poll loop
    (indexer/src/main.rs): an unbounded deterministic source
    (rate-micro-batch: `rows_per_batch` rows per trigger, monotonic
    value/timestamp) feeds the last-write-wins keyed sink continuously.

    The contract under soak is FLATNESS: the key space is bounded
    (user_id = value % n_users), so state size must stay at n_users
    rows forever, and because the sink reads only touched buckets and
    dynamically overwrites only those, per-batch wall time must not
    trend upward with batch count.  `timings` (if given) collects each
    batch's sink seconds for slope assertions in the soak test."""
    import time

    stream = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .load()
        .select(
            F.col("value").alias("event_id"),
            F.col("timestamp").cast("timestamp_ntz").alias("ts"),
            (F.col("value") % n_users).alias("user_id"),
            F.lit("soak").alias("event_type"),
            ((F.col("value") % 97) / 10.0).alias("value"),
            F.to_json(F.struct((F.col("value") % 7).alias("k"))).alias("props"),
        )
    )
    inner = foreach_batch_keyed_upsert(out_dir)

    def timed_sink(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.monotonic()
        inner(batch_df, batch_id)
        if timings is not None:
            timings.append(time.monotonic() - t0)

    return (
        stream.writeStream.foreachBatch(timed_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="0 seconds")
        .start()
    )


DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_document_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of document batches (new corpus shards)."""
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)


def foreach_batch_incremental_dedup(out_dir: str) -> Callable[[DataFrame, int], None]:
    """C11: incremental near-dup screening of NEW documents against a
    STANDING MinHash-LSH index — the streaming form of dedup at corpus
    scale, where re-deduplicating 100 TB per arriving shard is not an
    option.  (Reference shape: the indexer's idempotent keyed ingest —
    only never-seen keys produce effects; here the 'key' is the
    document's LSH fingerprint.)

    Per micro-batch:
      1. shingle -> minhash -> band the batch (operators/dedup.py, the
         exact same expressions as the batch operator);
      2. a doc is NOVEL iff none of its 16 band buckets collides with
         the standing index or with an earlier (smaller doc_id) doc of
         the same batch — the LSH screening stage of the batch
         operator (exact-Jaccard verification of flagged pairs stays a
         batch job over the tiny flagged set);
      3. append (doc_id, is_novel, batch_id) to `novel/`, and append
         ALL batch docs' banded rows to `index/` (duplicates included:
         novelty is 'no collision with anything seen before', so the
         index must contain everything seen — it grows linearly with
         the corpus, like any dedup index).

    Scale notes: the index is parquet partitioned by band_id (16
    partitions, each internally sorted by bucket at write); the batch
    side joins it on (band_id, bucket) — an equi-join Spark executes
    sort-merge with the batch side tiny, and on a real deployment the
    index would be a bucketed table making the probe shuffle-free.
    Appends are blind (no read-modify-write of old index files)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from near_indexer_for_explorer_spark.operators.dedup import (
            banded_minhash,
            minhash_signatures,
            shingles_of,
        )

        spark = batch_df.sparkSession
        index_dir = os.path.join(out_dir, "index")
        novel_dir = os.path.join(out_dir, "novel")
        banded = banded_minhash(
            minhash_signatures(shingles_of(batch_df))
        ).localCheckpoint(eager=True)
        intra = (
            banded.alias("a")
            .join(
                banded.alias("b"),
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") > F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_id"))
            .distinct()
        )
        dup_ids = intra
        if os.path.exists(index_dir):
            standing = spark.read.parquet(index_dir)
            hits = (
                banded.join(standing.hint("shuffle_merge"), ["band_id", "bucket"])
                .select(banded["doc_id"])
                .distinct()
            )
            dup_ids = dup_ids.unionByName(hits).distinct()
        flagged = batch_df.select("doc_id").join(dup_ids, "doc_id", "left_semi")
        out = (
            batch_df.select("doc_id")
            .join(flagged.withColumn("dup", F.lit(True)), "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(~F.col("dup"), F.lit(True)).alias("is_novel"),
                F.lit(batch_id).alias("batch_id"),
            )
        )
        out.write.mode("append").parquet(novel_dir)
        banded.write.mode("append").partitionBy("band_id").parquet(index_dir)

    return sink


def incremental_dedup_stream(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
):
    """C11 driver: document shards -> incremental LSH dedup screen."""
    stream = read_document_stream(spark, src_dir, max_files_per_trigger=1)
    return (
        stream.writeStream.foreachBatch(foreach_batch_incremental_dedup(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# C12: streaming corpus intake with the B25 quality filter
# ---------------------------------------------------------------------------
DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def quality_filter_stream(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
):
    """C12: document shards land as files -> the EXACT B25 rule columns
    (operators/textops.py::quality_filter_columns, shared code, so the
    stream can never drift from the batch filter) -> parquet sink
    partitioned by lang with the kept flag and per-rule audit columns.

    The filter is stateless per-row arithmetic, so the stream needs no
    watermark and no state store — at 100 TB this is the
    shards-as-they-land intake path, and restart safety is the file
    source's checkpointed offsets + per-batch-id idempotent sink, the
    same contract as C1."""
    from near_indexer_for_explorer_spark.operators.textops import (
        quality_filter_columns,
    )

    stream = spark.readStream.schema(DOC_SCHEMA).parquet(src_dir)
    scored = quality_filter_columns(stream)
    return (
        scored.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("lang")
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# C13: streaming shard packing (stateful continuation of B29)
# ---------------------------------------------------------------------------
PACK_OUTPUT_SCHEMA = (
    "doc_id long, split string, n_tokens long, shard_id long, "
    "offset_in_shard long"
)
PACK_STATE_SCHEMA = "next_off long"
# Imported, not duplicated (see module imports): the C13==B29
# batch-twin contract depends on the stream and batch paths agreeing
# on the budget and split hash; a local copy could drift silently.
PACK_BUDGET = _PACK_BUDGET


def make_pack_kernel() -> Callable:
    """Per-split packing state: the running token offset survives
    across micro-batches, so shard boundaries are identical to the
    one-shot batch packing when shards land in ingest order."""

    def pack(key, pdfs, state) -> "Iterator":
        import pandas as pd

        (split,) = key
        start = state.get[0] if state.exists else 0
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id")
            for doc_id, n_tokens in zip(pdf["doc_id"], pdf["n_tokens"]):
                n = int(n_tokens)
                rows.append(
                    (int(doc_id), split, n, start // PACK_BUDGET,
                     start % PACK_BUDGET)
                )
                start += n
        state.update((start,))
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "split", "n_tokens", "shard_id", "offset_in_shard"
            ],
        )

    return pack


def shard_pack_stream(
    spark: SparkSession, src_dir: str, query_name: str
):
    """C13: document shards land as files -> deterministic md5 split ->
    token counts (JVM-side) -> per-split stateful packing that carries
    the running token offset across micro-batches (the reference's
    months-long poll loop writes blocks with exactly this kind of
    monotone continuation state).

    Equals the batch B29 packing row-for-row when files arrive in
    ingest (doc_id) order — asserted by the batch-twin test.  State is
    one long per split: O(splits) state total, forever."""
    from near_indexer_for_explorer_spark.functions.text import tokens

    stream = spark.readStream.schema(DOC_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src_dir)
    sb = _hash_bucket(F.col("doc_id"), "split:", _SPLIT_MOD)
    split = F.when(sb < 32, "train").when(sb < 36, "val").otherwise("test")
    d = stream.select(
        "doc_id",
        split.alias("split"),
        F.size(tokens("text")).cast("long").alias("n_tokens"),
    )
    packed = d.groupBy("split").applyInPandasWithState(
        make_pack_kernel(),
        PACK_OUTPUT_SCHEMA,
        PACK_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    return (
        packed.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# C14: streaming vector ingestion into the IVF index
# ---------------------------------------------------------------------------
EMBEDDING_SCHEMA = "vec_id long, embedding array<float>, label int"


def _ivf_cand_structs_sql(centroids: list) -> str:
    """array<struct<d, c>> of (distance, centroid_id) against literal
    centroids, as ONE SQL text (r15: the per-centroid Python-lambda
    loop cost ~3 HOF round-trips x k centroids of py4j latency per
    micro-batch plan; the parsed text is the identical expression)."""
    emb = "transform(embedding, x -> CAST(x AS DOUBLE))"
    cands = []
    for cid, comp in centroids:
        w = "array(" + ", ".join(f"{float(c)!r}D" for c in comp) + ")"
        dist = (
            f"aggregate(zip_with({emb}, {w}, "
            f"(x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x)"
        )
        cands.append(f"struct({dist} AS d, {int(cid)} AS c)")
    return "array(" + ", ".join(cands) + ")"


def make_ivf_assign_expr(centroids: list) -> F.Column:
    """Stream-safe nearest-centroid assignment: the trained centroids
    are inlined as literals, so the argmin is a pure column expression
    (array_min over (dist, centroid_id) structs — struct ordering gives
    the same dist-then-id tie-break as the batch window/ROW_NUMBER).
    No shuffle, no state: exactly how a serving-side quantizer runs.

    `centroids` is [(centroid_id, [comp, ...]), ...] as collected from
    operators/similarity.py::_kmeans_centroids."""
    return F.expr(f"array_min({_ivf_cand_structs_sql(centroids)}).c")


def ivf_ingest_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    centroids: list,
):
    """C14: new embedding shards stream in, are assigned to their IVF
    list against the FROZEN coarse quantizer, and append to a
    centroid_id-partitioned parquet index — the vector-side analog of
    C4's keyed sink: blind partitioned appends, no index rewrite, so
    per-batch cost is O(batch), never O(index).

    At 100 TB: the quantizer retrains offline on a sample (B13 trains
    on a deterministic 1/5 sample for exactly this reason); the stream
    only ever ASSIGNS.  Batch-twin test proves streamed assignments ==
    the batch ivf_assignments under the same centroids."""
    stream = spark.readStream.schema(EMBEDDING_SCHEMA).parquet(src_dir)
    assigned = stream.select(
        "vec_id",
        "embedding",
        make_ivf_assign_expr(centroids).alias("centroid_id"),
    )
    return (
        assigned.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("centroid_id")
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# C16 true sequential debounce (emit-if-gap-from-last-EMITTED)
# ---------------------------------------------------------------------------
DEBOUNCE_GAP_S = 3600.0

DEBOUNCE_OUTPUT_SCHEMA = (
    "event_id long, user_id long, event_type string, es double"
)
DEBOUNCE_STATE_SCHEMA = "last_emitted double"


def make_debounce_kernel():
    """applyInPandasWithState kernel for debounce-against-KEPT: an
    event is emitted only when >= 1h has passed since the last EMITTED
    event of the same (user, type).  This is a sequential fold —
    emitted_i depends on emitted_{i-1} — which plain batch windows
    cannot express (the batch twin A59 `events_debounce_1h` pins the
    weaker lag-vs-previous contract and documents exactly this gap);
    group state makes it one long-lived decision per key.  State is a
    single double per key: bounded forever."""
    gap = DEBOUNCE_GAP_S

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        user_id, event_type = key
        last = state.get[0] if state.exists else None
        out = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for eid, ts in zip(rows["event_id"], rows["ts"]):
            es = ts.timestamp()
            if last is None or es - last >= gap:
                out.append((int(eid), int(user_id), event_type, es))
                last = es
        state.update((last,))
        if out:
            yield pd.DataFrame(
                out, columns=["event_id", "user_id", "event_type", "es"]
            )

    return update


def debounce_stream(spark: SparkSession, src_dir: str, query_name: str):
    """C16: alert-storm suppression with sequential semantics, keyed
    state spanning micro-batches."""
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    kept = stream.groupBy("user_id", "event_type").applyInPandasWithState(
        make_debounce_kernel(),
        DEBOUNCE_OUTPUT_SCHEMA,
        DEBOUNCE_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    return (
        kept.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# C17 incremental cohort maintenance (non-additive view maintenance)
# ---------------------------------------------------------------------------
# The cohort-retention matrix (A57) is NOT an additive aggregate: a
# late-arriving EARLIER order moves a customer's cohort month, which
# retracts their contribution from one matrix row and adds it to
# another.  Incremental maintenance therefore keeps the minimal
# sufficient state — the distinct (customer, month) activity set,
# bucket-partitioned like C4 so each micro-batch merges only touched
# buckets — and derives the matrix from state on demand: first month
# = min over the set, so cohort reassignment falls out of the merge
# with no retraction bookkeeping.  Per-batch cost is O(touched
# buckets); the derivation reads compact state, never order history.
ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp_ntz"
)
COHORT_BUCKETS = 8


def foreach_batch_cohort_state(
    out_dir: str, n_buckets: int = COHORT_BUCKETS
) -> Callable[[DataFrame, int], None]:
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        snapshot = os.path.join(out_dir, "cohort_state")
        batch = (
            batch_df.select(
                "o_custkey",
                F.date_trunc("month", "o_orderdate").alias("m"),
            )
            .distinct()
            .withColumn(
                "bucket", F.pmod(F.col("o_custkey"), F.lit(n_buckets)).cast("int")
            )
        )
        current = batch
        if os.path.exists(snapshot):
            touched = [
                r["bucket"] for r in batch.select("bucket").distinct().collect()
            ]
            existing = spark.read.parquet(snapshot).where(
                F.col("bucket").isin(touched)
            )
            current = existing.unionByName(batch)
        merged = current.dropDuplicates(["o_custkey", "m"]).localCheckpoint(
            eager=True
        )
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(snapshot)
        )

    return sink


def cohort_stream(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
):
    """C17 driver: orders stream -> incrementally maintained cohort
    activity state."""
    stream = (
        spark.readStream.schema(ORDERS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    return (
        stream.writeStream.foreachBatch(foreach_batch_cohort_state(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def cohort_matrix_from_state(spark: SparkSession, out_dir: str) -> DataFrame:
    """Derive the A57 matrix from maintained state (no history scan):
    identical columns, identical decimal-quantized retention."""
    state = spark.read.parquet(os.path.join(out_dir, "cohort_state"))
    first_m = state.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    sizes = first_m.groupBy("cohort_m").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cells = (
        state.join(first_m, "o_custkey")
        .groupBy(
            "cohort_m",
            F.months_between(F.col("m"), F.col("cohort_m"))
            .cast("long")
            .alias("months_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    retention = (
        (F.col("n_active").cast("decimal(20,14)") / F.col("cohort_size"))
        .cast("decimal(24,6)")
        .cast("double")
    )
    return cells.join(F.broadcast(sizes), "cohort_m").select(
        F.col("cohort_m").cast("date").alias("cohort_month"),
        "months_since",
        F.col("n_active").cast("long").alias("n_active"),
        F.col("cohort_size").cast("long").alias("cohort_size"),
        retention.alias("retention"),
    )


# ---------------------------------------------------------------------------
# C18 streaming ANN recall monitor (serving-quality observability)
# ---------------------------------------------------------------------------
_MONITOR_TOP_K = 10
_MONITOR_NPROBE = 4


def make_ivf_probe_expr(centroids: list, nprobe: int = _MONITOR_NPROBE) -> F.Column:
    """Top-`nprobe` nearest centroid ids as an array — the query-side
    probe set under the same frozen-quantizer-as-literals discipline as
    make_ivf_assign_expr (struct ordering = dist-then-id tie-break)."""
    return F.expr(
        f"transform(slice(array_sort({_ivf_cand_structs_sql(centroids)}), "
        f"1, {nprobe}), st -> st.c)"
    )


def recall_against_index(
    queries: DataFrame, index: DataFrame, centroids: list
) -> DataFrame:
    """(q_id, n_hit, recall): per query, recall@k of the IVF-probed
    top-k against the exact top-k over the SAME frozen index.  One
    function serves the streaming monitor and its batch twin, so the
    monitored metric cannot drift from the offline evaluation (the
    C12/C13 shared-kernel discipline).

    Scale shape: the exact leg broadcasts the (small) query batch
    against the index scan; the probe leg explodes each query to its
    nprobe lists and equi-joins on centroid_id — against the C14
    partitioned index layout that join is partition-pruned, so the
    probe leg reads only nprobe/k of the index per query batch."""
    k = _MONITOR_TOP_K
    qn = queries.select(
        F.col("vec_id").alias("q_id"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias(
            "q_emb"
        ),
        make_ivf_probe_expr(centroids).alias("probes"),
    )
    cn = index.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("emb"),
        "centroid_id",
    )
    dot = (
        "aggregate(zip_with(q_emb, emb, (x, y) -> x * y), 0.0D, "
        "(acc, x) -> acc + x)"
    )

    def nrm(c: str) -> str:
        return (
            f"SQRT(aggregate(transform({c}, x -> x * x), 0.0D, "
            f"(a, x) -> a + x))"
        )

    cos = F.round(
        F.expr(f"{dot} / ({nrm('q_emb')} * {nrm('emb')})"), 6
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )

    def topk(pairs: DataFrame) -> DataFrame:
        return (
            pairs.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("q_id", "vec_id")
        )

    exact_pairs = (
        cn.crossJoin(F.broadcast(qn.select("q_id", "q_emb")))
        .where(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", cos.alias("cos_sim"))
    )
    probe_pairs = (
        qn.select("q_id", "q_emb", F.explode("probes").alias("centroid_id"))
        .join(cn, "centroid_id")
        .where(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", cos.alias("cos_sim"))
    )
    hits = topk(exact_pairs).join(topk(probe_pairs), ["q_id", "vec_id"])
    return (
        topk(exact_pairs)
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .join(
            hits.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_hit")),
            "q_id",
            "left",
        )
        .select(
            "q_id",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            (
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
                / F.col("n_exact")
            ).alias("recall"),
        )
    )


def ann_recall_monitor_stream(
    spark: SparkSession,
    src_dir: str,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    centroids: list,
):
    """C18: query vectors stream in; each micro-batch's IVF recall@k
    against the frozen C14 index is appended to a monitoring table
    (batch_id, q_id, n_hit, recall).  This is the serving-side quality
    loop the r5 SURVEY flagged as the open ivfpq follow-up: recall
    regressions (e.g. after centroid drift) surface within one batch
    of query traffic, computed by the SAME kernel as the offline
    evaluation."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        index = batch_df.sparkSession.read.parquet(index_dir)
        (
            recall_against_index(batch_df, index, centroids)
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("append").parquet(out_dir)
        )

    stream = spark.readStream.schema(EMBEDDING_SCHEMA).parquet(src_dir)
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# C19 streaming SCD2 maintenance (UPDATE-on-supersede as a lake sink)
# ---------------------------------------------------------------------------
def foreach_batch_scd2_upsert(out_dir: str, n_buckets: int = 8):
    """foreachBatch sink maintaining the A64 SCD2 table incrementally:
    each state-change event is a versioned [valid_from, valid_to) row,
    and a new event CLOSES the previously-current interval of its key —
    the reference's UPDATE-on-supersede PostgreSQL write
    (access_keys deleted_by_receipt_id, adapters/access_keys.rs)
    re-expressed as a partitioned-lake merge.

    Like C17, the view is non-additive (a LATE event re-opens and
    re-versions every later interval of that user), so the sink keeps
    the minimal sufficient state — the touched buckets' event history —
    and RE-DERIVES intervals from it: read only the buckets the batch
    touches (partition-pruned), union the new rows, dedup by event_id
    (replay/idempotence), one window pass re-intervalizes, dynamic
    partition overwrite commits.  Per-batch cost is O(touched
    buckets), never O(table); late and replayed input land exactly.
    Batch-twin: the snapshot always equals A64 `user_state_scd2` over
    the events ingested so far (pytest, including an out-of-order
    event and a checkpoint-wipe replay)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        snapshot = os.path.join(out_dir, "scd2")
        batch = batch_df.select(
            "user_id", "event_id", "event_type", "value", "ts"
        ).withColumn(
            "bucket", F.pmod(F.col("user_id"), F.lit(n_buckets)).cast("int")
        )
        current = batch
        if os.path.exists(snapshot):
            touched = [
                r["bucket"] for r in batch.select("bucket").distinct().collect()
            ]
            existing = (
                spark.read.parquet(snapshot)
                .where(F.col("bucket").isin(touched))
                .select(
                    "user_id",
                    "event_id",
                    "event_type",
                    "value",
                    F.col("valid_from").alias("ts"),
                    "bucket",
                )
            )
            current = existing.unionByName(batch)
        current = current.dropDuplicates(["event_id"])
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").asc(), F.col("event_id").asc()
        )
        merged = current.select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.lead("ts").over(w).isNull().alias("is_current"),
            F.row_number().over(w).cast("long").alias("version"),
            "bucket",
        ).localCheckpoint(eager=True)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(snapshot)
        )

    return sink


def scd2_stream(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
):
    """C19 driver: stream -> incrementally-maintained SCD2 table."""
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    return (
        stream.writeStream.foreachBatch(foreach_batch_scd2_upsert(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# C22 incremental Bloom maintenance (the streaming side of B60)
# ---------------------------------------------------------------------------
def foreach_batch_bloom_merge(out_dir: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink maintaining the standing (word_idx, bits)
    bloom relation as APPEND-ONLY per-batch deltas, merged on read.

    Replay-idempotence here needs NO dedup bookkeeping at all — OR is
    idempotent and commutative, so a crash-replayed micro-batch simply
    appends a duplicate delta and the merged bits are unchanged; the
    pytest proves that plus bit-for-bit equality with the one-shot
    batch bloom (shared `bloom_positions` expressions — no
    stream/batch drift possible).  Blind appends also close the
    crash window a read-then-overwrite design would have (losing the
    only state copy mid-rewrite would manufacture false negatives —
    the one failure mode a bloom must never have); `bloom_bits_read`
    performs the O(deltas) bit_or fold, and `compact_bloom_deltas`
    bounds the fold by periodically merging entry-listed deltas into
    one file (write-before-delete, replay-safe — see its docstring)."""
    from near_indexer_for_explorer_spark.operators.corpus import (
        bloom_bits_of,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        snapshot = os.path.join(out_dir, "bloom")
        batch_bits = bloom_bits_of(
            batch_df.select("user_id").distinct()
        )
        batch_bits.coalesce(1).write.mode("append").parquet(snapshot)

    return sink


def bloom_bits_read(spark: SparkSession, out_dir: str) -> DataFrame:
    """(word_idx, bits): the maintained filter — bit_or fold of every
    appended delta (duplicates from replays OR away)."""
    return (
        spark.read.parquet(os.path.join(out_dir, "bloom"))
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )


def compact_bloom_deltas(
    spark: SparkSession, out_dir: str, _fail_before_prune: bool = False
) -> tuple[int, int]:
    """Fold-and-replace compaction for the C22 delta dir: merge the
    deltas present at entry into ONE new delta file, then prune only
    those entry-listed files.  Returns (n_folded, n_files_after).

    Crash safety comes from OR-idempotence plus write-before-delete
    ordering — at every intermediate state the directory's fold is the
    correct filter:

    - crash before the merged file lands: directory unchanged;
    - crash after it lands, before pruning: old deltas coexist with
      their own merge — duplicates OR away (``_fail_before_prune``
      simulates exactly this state for the test);
    - crash mid-prune: a subset of merged-away files remain — same OR;
    - a replayed/concurrent micro-batch appending mid-compaction is
      never touched: the prune list was snapshotted at entry, so new
      deltas always survive.

    No rename-swap of the whole directory is needed (and none would be
    atomic on object stores anyway); the merged file is just another
    delta.  The one invariant a bloom must never break — no false
    negatives — cannot be broken by any interleaving, because no bit
    is ever dropped, only re-OR'd."""
    import glob
    import shutil
    import uuid

    snapshot = os.path.join(out_dir, "bloom")
    old = sorted(glob.glob(os.path.join(snapshot, "*.parquet")))
    if len(old) <= 1:
        return 0, len(old)
    merged = (
        spark.read.parquet(*old)
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    # stage the merged relation beside the delta dir, then move the one
    # part file in — never overwrite-in-place the only state copy
    stage = os.path.join(out_dir, f"bloom_compact_tmp_{uuid.uuid4().hex}")
    try:
        merged.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(snapshot, f"compacted-{uuid.uuid4().hex}.parquet")
        os.replace(part, dst)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    if _fail_before_prune:
        raise RuntimeError("injected crash between merge and prune")
    for p in old:
        os.remove(p)
    return len(old), len(glob.glob(os.path.join(snapshot, "*.parquet")))


def bloom_stream(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
):
    """C22 driver: event stream -> incrementally maintained bloom."""
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    return (
        stream.writeStream.foreachBatch(foreach_batch_bloom_merge(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# C23: NATIVE session windows (Spark's built-in session_window) — the
# declarative counterpart of C5's applyInPandasWithState sessionizer.
# The engine maintains gap-merged event-time intervals in the state
# store itself (merging sessions when a new event lands within the gap
# of an existing interval), so the operator needs zero custom state
# code and inherits watermark-driven state eviction — at 100 TB this is
# the preferred sessionization path, with C5's kernel reserved for
# session logic session_window cannot express (e.g. per-session
# early-emission rules).
#
# Boundary semantics, pinned in pytest: session_window merges ADJACENT
# intervals — an event at exactly prev + gap lands where the previous
# event's [ts, ts+gap) window closes and still merges — so its rule is
# "new session only when gap > threshold", IDENTICAL to A12/C5's cumsum
# rule (verified empirically at gap and gap+1s; the agreement is what
# makes the three sessionizers interchangeable).
# ---------------------------------------------------------------------------
def session_window_agg(events: DataFrame) -> DataFrame:
    """The shared session aggregation (stream and batch twins run this
    same function, so they cannot drift): 30-min-gap session windows
    per user with event count and exact-decimal session value."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("session_value"),
        )
        .select(
            F.col("user_id"),
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def session_window_stream(spark: SparkSession, src_dir: str, query_name: str):
    """C23 driver: file-source events -> native session_window agg ->
    memory sink (complete mode: the twin test reads final merged
    sessions; production runs the same agg append-mode and lets the
    watermark finalize sessions)."""
    stream = read_event_stream(spark, src_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).withWatermark("ts", "1 hour")
    agg = session_window_agg(stream)
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# C24: EXACT-recursion EWMA stream — the stateful twin of A77's batch
# kernel.  The textbook recursion s_i = a*x_i + (1-a)*s_{i-1} is a
# sequential fold over each user's full history: batch windows can
# only truncate it (A77 keeps 20 dyadic terms and renormalizes), but
# group state carries s across micro-batches forever, so the stream
# computes the INFINITE-horizon value exactly — one double per user,
# bounded state, the C16 discipline.  With a = 1/2 every step is two
# exact binary shifts and one add, so the streamed value is a pure
# function of the value sequence (bit-stable across replays), and the
# batch-kernel divergence is bounded by the truncated tail:
# |exact - A77| <= max|x| * 2^-19-ish, pinned in pytest.
# ---------------------------------------------------------------------------
EWMA_OUTPUT_SCHEMA = (
    "event_id long, user_id long, es double, value double, ewma double"
)
EWMA_STATE_SCHEMA = "s double"


def make_ewma_kernel():
    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        s = state.get[0] if state.exists else None
        out = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for eid, ts, x in zip(rows["event_id"], rows["ts"], rows["value"]):
            x = float(x)
            s = x if s is None else 0.5 * x + 0.5 * s
            out.append((int(eid), int(user_id), ts.timestamp(), x, s))
        state.update((s,))
        if out:
            yield pd.DataFrame(
                out, columns=["event_id", "user_id", "es", "value", "ewma"]
            )

    return update


def ewma_stream(spark: SparkSession, src_dir: str, query_name: str):
    """C24 driver: file-source events -> per-user exact EWMA fold with
    one double of state per user."""
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    out = stream.groupBy("user_id").applyInPandasWithState(
        make_ewma_kernel(),
        EWMA_OUTPUT_SCHEMA,
        EWMA_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# C25: streaming CUSUM change detection — the ONLINE twin of A78's
# batch statistic.  A78 answers "did the mean shift somewhere in this
# history"; the operational question is "raise an alarm AS the shift
# happens", which is Page's one-sided recursion
#
#   S+_i = max(0, S+_{i-1} + (x_i - mu) - k)     (upward shifts)
#   S-_i = max(0, S-_{i-1} - (x_i - mu) - k)     (downward shifts)
#
# — a sequential fold (each S depends on the previous), so it is group
# state, not a window.  The per-user baseline mu comes from a STATIC
# batch-computed relation joined per micro-batch (the C6 stream-static
# enrichment pattern: at 100 TB the baseline is a nightly batch
# artifact and the detector never rescans history).  State: two
# doubles per user, bounded forever (C16/C24 discipline).  Alarm when
# either side exceeds h; k (slack) and h are the standard CUSUM
# tuning knobs.
# ---------------------------------------------------------------------------
CUSUM_SLACK_K = 0.5
CUSUM_ALARM_H = 5.0
CUSUM_OUTPUT_SCHEMA = (
    "event_id long, user_id long, es double, value double, "
    "s_pos double, s_neg double, alarm boolean"
)
CUSUM_STATE_SCHEMA = "sp double, sn double"


def user_value_baseline(events: DataFrame) -> DataFrame:
    """Per-user mean value in exact decimal — the batch artifact the
    streaming detector joins against (and the same mu definition A78
    uses)."""
    return events.groupBy("user_id").agg(
        (
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    )


def make_cusum_kernel():
    k, h = CUSUM_SLACK_K, CUSUM_ALARM_H

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        sp, sn = state.get if state.exists else (0.0, 0.0)
        out = []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for eid, ts, x, mu in zip(
            rows["event_id"], rows["ts"], rows["value"], rows["mu"]
        ):
            x = float(x)
            dev = x - float(mu)
            sp = max(0.0, sp + dev - k)
            sn = max(0.0, sn - dev - k)
            out.append(
                (int(eid), int(user_id), ts.timestamp(), x, sp, sn,
                 sp > h or sn > h)
            )
        state.update((sp, sn))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "event_id", "user_id", "es", "value",
                    "s_pos", "s_neg", "alarm",
                ],
            )

    return update


def cusum_stream(
    spark: SparkSession, src_dir: str, baseline: DataFrame, query_name: str
):
    """C25 driver: events stream joined to the static per-user baseline
    (broadcast per micro-batch), folded through the two-sided CUSUM
    recursion with two doubles of state per user."""
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1).join(
        F.broadcast(baseline), "user_id"
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        make_cusum_kernel(),
        CUSUM_OUTPUT_SCHEMA,
        CUSUM_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# C26: streaming Space-Saving heavy hitters (Metwally et al. 2005) —
# the ONLINE side of the A69 sketch story: a bounded set of counters
# per key shard, maintained across micro-batches, with the classic
# guarantees (no false negatives above n/k; est >= true >= est - err).
# Sharding by item hash PARTITIONS the key space, so each item's whole
# count lives in one shard and the per-shard guarantee carries to the
# merged summary: true count > n/k >= n_shard/k implies the item
# survives its shard's evictions.  State per shard: k (item, count,
# err) counters + a monotone seq — bounded forever regardless of
# stream length (the A69 sketch contract, C16/C24 state discipline).
# Each batch emits the shard's full summary stamped with seq; readers
# take the max-seq snapshot per shard (memory/update sinks append
# every trigger's rows).
# ---------------------------------------------------------------------------
TOPK_COUNTERS = 8  # k counters per shard
TOPK_SHARDS = 4
TOPK_OUTPUT_SCHEMA = "shard int, seq long, item long, est long, err long"
TOPK_STATE_SCHEMA = "items string, counts string, errs string, seq long"


def make_space_saving_kernel(k: int = TOPK_COUNTERS):
    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (shard,) = key
        if state.exists:
            items_s, counts_s, errs_s, seq = state.get
            items = [int(x) for x in items_s.split(",")] if items_s else []
            counts = [int(x) for x in counts_s.split(",")] if counts_s else []
            errs = [int(x) for x in errs_s.split(",")] if errs_s else []
        else:
            items, counts, errs, seq = [], [], [], 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for item in rows["user_id"]:
            item = int(item)
            if item in items:
                counts[items.index(item)] += 1
            elif len(items) < k:
                items.append(item)
                counts.append(1)
                errs.append(0)
            else:
                # evict the min-count counter (ties: lowest item id,
                # deterministic across replays/engines)
                j = min(range(k), key=lambda i: (counts[i], items[i]))
                errs[j] = counts[j]
                counts[j] = counts[j] + 1
                items[j] = item
        seq += 1
        state.update(
            (
                ",".join(str(x) for x in items),
                ",".join(str(x) for x in counts),
                ",".join(str(x) for x in errs),
                seq,
            )
        )
        yield pd.DataFrame(
            [
                (int(shard), int(seq), items[i], counts[i], errs[i])
                for i in range(len(items))
            ],
            columns=["shard", "seq", "item", "est", "err"],
        )

    return update


def topk_stream(spark: SparkSession, src_dir: str, query_name: str):
    """C26 driver: events keyed by user-hash shard -> Space-Saving
    summaries maintained in bounded state, snapshot emitted per
    batch."""
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1).withColumn(
        "shard", F.pmod(F.col("user_id"), F.lit(TOPK_SHARDS)).cast("int")
    )
    out = stream.groupBy("shard").applyInPandasWithState(
        make_space_saving_kernel(),
        TOPK_OUTPUT_SCHEMA,
        TOPK_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def topk_snapshot(spark: SparkSession, query_name: str) -> DataFrame:
    """Latest (max-seq) Space-Saving summary per shard from the memory
    sink's appended trigger snapshots."""
    return spark.sql(
        f"""
        SELECT shard, seq, item, est, err FROM (
          SELECT *, MAX(seq) OVER (PARTITION BY shard) AS mx
          FROM {query_name}
        ) WHERE seq = mx
        """
    )


# ---------------------------------------------------------------------------
# C27: streaming weighted sample — the online twin of B58
# (corpus_weighted_sample).  A-ES keys are pure functions of
# (doc_id, n_chars), so "reservoir" state is just the running top-K by
# key: bounded, merge-idempotent (re-delivered docs dedupe by doc_id),
# and EXACTLY equal to the batch sample over everything ingested — the
# union of per-shard top-Ks provably contains the global top-K, the
# same key-space-partition argument as the C26 Space-Saving shards.
# ---------------------------------------------------------------------------
WSAMPLE_SHARDS = 4
WSAMPLE_OUTPUT_SCHEMA = "shard int, seq long, doc_id long, n_chars long, skey double"
WSAMPLE_STATE_SCHEMA = "doc_ids string, n_chars string, skeys string, seq long"


def make_wsample_kernel(k: int):
    """Per-shard kernel: merge the batch's (doc_id, n_chars, skey) rows
    into the state's top-k by (skey desc, doc_id asc).  Idempotent under
    replay: doc_id dedup before the cut, and the cut itself is a pure
    function of the merged set."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (shard,) = key
        if state.exists:
            ids_s, nc_s, sk_s, seq = state.get
            rows = {
                int(i): (int(n), float(s))
                for i, n, s in zip(
                    ids_s.split(",") if ids_s else [],
                    nc_s.split(",") if nc_s else [],
                    sk_s.split(",") if sk_s else [],
                )
            }
        else:
            rows, seq = {}, 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        for doc_id, n_chars, skey in zip(
            batch["doc_id"], batch["n_chars"], batch["skey"]
        ):
            rows[int(doc_id)] = (int(n_chars), float(skey))
        top = sorted(rows.items(), key=lambda kv: (-kv[1][1], kv[0]))[:k]
        seq += 1
        state.update(
            (
                ",".join(str(d) for d, _ in top),
                ",".join(str(v[0]) for _, v in top),
                ",".join(repr(v[1]) for _, v in top),
                seq,
            )
        )
        yield pd.DataFrame(
            [(int(shard), int(seq), d, v[0], v[1]) for d, v in top],
            columns=["shard", "seq", "doc_id", "n_chars", "skey"],
        )

    return update


def weighted_sample_stream(spark: SparkSession, src_dir: str, query_name: str):
    """C27 driver: document shards -> JVM-side A-ES keys (the exact B58
    expression) -> per-shard bounded top-K state -> per-batch snapshot
    into a memory sink."""
    from near_indexer_for_explorer_spark.operators.corpus import _SAMPLE_K, _U32

    stream = read_document_stream(spark, src_dir, max_files_per_trigger=1)
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    x = _hash_bucket(F.col("doc_id"), "wsample:", _U32)
    u = (x + F.lit(1)).cast("double") / F.lit(float(_U32))
    keyed = stream.select(
        F.pmod(F.col("doc_id"), F.lit(WSAMPLE_SHARDS)).cast("int").alias("shard"),
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round(F.log(u) / w, 6).alias("skey"),
    )
    out = keyed.groupBy("shard").applyInPandasWithState(
        make_wsample_kernel(_SAMPLE_K),
        WSAMPLE_OUTPUT_SCHEMA,
        WSAMPLE_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def weighted_sample_snapshot(spark: SparkSession, query_name: str) -> DataFrame:
    """Global sample from the latest per-shard snapshots: merge the
    max-seq rows of every shard and take the top-K by (skey desc,
    doc_id asc) with the B58 rank column."""
    from near_indexer_for_explorer_spark.operators.corpus import _SAMPLE_K

    merged = spark.sql(
        f"""
        SELECT doc_id, n_chars, skey FROM (
          SELECT *, MAX(seq) OVER (PARTITION BY shard) AS mx
          FROM {query_name}
        ) WHERE seq = mx
        """
    )
    rank_w = Window.orderBy(F.col("skey").desc(), F.col("doc_id").asc())
    return (
        merged.orderBy(F.col("skey").desc(), F.col("doc_id").asc())
        .limit(_SAMPLE_K)
        .withColumn("sample_rank", F.row_number().over(rank_w).cast("long"))
    )


# ---------------------------------------------------------------------------
# C28 incremental approximate-distinct maintenance (the streaming side
# of A54): per-type Datasketches-HLL deltas appended per micro-batch,
# merged on read.  The same algebra as the C22 bloom: HLL union is a
# register-wise MAX — idempotent, commutative, associative — so a
# crash-replayed batch appends a duplicate sketch that merges away, no
# dedup bookkeeping, and compaction is the same fold-and-replace.  At
# 100 TB this is THE way distinct-counting state survives: per-batch
# sketches are KB-sized regardless of cardinality and the fold is one
# tiny aggregate.
# ---------------------------------------------------------------------------
def foreach_batch_hll_merge(out_dir: str) -> Callable[[DataFrame, int], None]:
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        deltas = batch_df.groupBy("event_type").agg(
            F.hll_sketch_agg("user_id").alias("sketch")
        )
        deltas.coalesce(1).write.mode("append").parquet(
            os.path.join(out_dir, "hll")
        )

    return sink


def hll_distinct_read(spark: SparkSession, out_dir: str) -> DataFrame:
    """(event_type, approx_distinct_users): union-fold of every
    appended sketch delta (replay duplicates max-merge away)."""
    return (
        spark.read.parquet(os.path.join(out_dir, "hll"))
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
                "approx_distinct_users"
            )
        )
    )


def compact_hll_deltas(
    spark: SparkSession, out_dir: str, _fail_before_prune: bool = False
) -> tuple[int, int]:
    """Fold-and-replace compaction for the C28 delta dir — the
    compact_bloom_deltas protocol verbatim (snapshot the entry list,
    write the merged delta, then prune only entry-listed files), safe
    under the same idempotent-merge algebra (register-wise max instead
    of bitwise OR)."""
    import glob

    snapshot = os.path.join(out_dir, "hll")
    entry_files = sorted(glob.glob(os.path.join(snapshot, "*.parquet")))
    if len(entry_files) <= 1:
        return (0, len(entry_files))
    merged = (
        spark.read.parquet(*entry_files)
        .groupBy("event_type")
        .agg(F.hll_union_agg("sketch").alias("sketch"))
    )
    merged.coalesce(1).write.mode("append").parquet(snapshot)
    if _fail_before_prune:
        raise RuntimeError("injected crash between merge and prune")
    for f in entry_files:
        os.remove(f)
    remaining = glob.glob(os.path.join(snapshot, "*.parquet"))
    return (len(entry_files), len(remaining))


def hll_distinct_stream(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
):
    """C28 driver: event stream -> incrementally maintained per-type
    distinct-user sketches."""
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    return (
        stream.writeStream.foreachBatch(foreach_batch_hll_merge(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# C29 incremental trend maintenance.  The A90 closed-form OLS trend is
# a pure function of the (event_type, day) daily-value rollup, whose
# partials are exact decimals — so the streaming side maintains ONLY
# that rollup (the minimal sufficient state, merge-order free) and the
# read path calls the SAME trend_from_daily kernel as the batch query.
# Scale design: state is O(types x days) regardless of event volume.
#
# Delivery (C29/C30/C31, upgraded r8): these additive rollups ride the
# C32 batch-id-keyed delta log — each micro-batch writes ITS OWN delta
# file, so a replay after a crash between the state write and the
# checkpoint commit OVERWRITES the same delta instead of adding to a
# merged snapshot (exactly-once under crash-replay, the SUM
# non-idempotence the earlier read-modify-overwrite sinks documented
# as an at-most-once caveat).  The fold is O(deltas) at read; the C32
# compaction protocol applies verbatim when the log grows.
# ---------------------------------------------------------------------------
def foreach_batch_trend_rollup(out_dir: str) -> Callable[[DataFrame, int], None]:
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from near_indexer_for_explorer_spark.plans.relational import (
            daily_value_rollup,
        )

        daily_value_rollup(batch_df).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "deltas", f"batch={batch_id}"))
        _maybe_auto_compact(
            batch_df.sparkSession, out_dir, ["event_type", "d"],
            {"y": "decimal(14,2)"},
        )

    return sink


def trend_stream(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
):
    """C29 driver: event stream -> incrementally maintained daily
    rollup; read the trend with read_stream_trend()."""
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    return (
        stream.writeStream.foreachBatch(foreach_batch_trend_rollup(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_stream_trend(spark: SparkSession, out_dir: str) -> DataFrame:
    """The C29 read path: fold the daily-rollup delta log (exact
    decimal partials — merge-order free) into the SAME closed-form
    kernel as A90."""
    from near_indexer_for_explorer_spark.plans.relational import (
        trend_from_daily,
    )

    daily = (
        _read_delta_log(spark, out_dir, TREND_CELL_SCHEMA)
        .groupBy("event_type", "d")
        .agg(F.sum("y").cast("decimal(14,2)").alias("y"))
    )
    return trend_from_daily(daily)


# ---------------------------------------------------------------------------
# C30 streaming Benford monitor.  Digit counts are additive longs —
# the canonical mergeable sketch — riding the C32 batch-id-keyed
# delta log (each delta is <= 9 rows; replays overwrite their own
# file, exactly-once under crash-replay — the r8 upgrade from the
# earlier read-merge-overwrite snapshot).  The digit expression is
# SHARED with the A86 batch audit (benford_digit_counts) so stream ==
# batch is a kernel invariant, not a coincidence.
# ---------------------------------------------------------------------------
def foreach_batch_benford(out_dir: str) -> Callable[[DataFrame, int], None]:
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from near_indexer_for_explorer_spark.plans.relational import (
            benford_digit_counts,
        )

        benford_digit_counts(batch_df, "value").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "deltas", f"batch={batch_id}"))
        _maybe_auto_compact(
            batch_df.sparkSession, out_dir, ["digit"], {"n": "long"}
        )

    return sink


def read_stream_benford(spark: SparkSession, out_dir: str) -> DataFrame:
    """The C30 read path: fold the digit-count delta log to the
    9-row-bounded (digit, n) state."""
    return (
        _read_delta_log(spark, out_dir, BENFORD_CELL_SCHEMA)
        .groupBy("digit")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def benford_stream(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
):
    """C30 driver: event stream -> incrementally maintained Benford
    first-digit counts over `value`."""
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    return (
        stream.writeStream.foreachBatch(foreach_batch_benford(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# C31 incremental market-concentration maintenance.  The A87 HHI is a
# pure function of the (p_type, l_suppkey) micro-unit revenue cells,
# whose partials are exact integers — so the stream maintains ONLY
# that cell relation (C29's minimal-sufficient-state discipline over
# a LINEITEM stream with the part dim broadcast per batch, the C6
# stream-static pattern) and the read path calls the SAME
# hhi_from_cells kernel as the batch query.  State is
# O(types x suppliers) regardless of fact volume; the cells ride the
# C32 batch-id-keyed delta log (replays overwrite their own delta —
# exactly-once under crash-replay, the r8 upgrade from dynamic
# partition overwrite).
# ---------------------------------------------------------------------------
LINEITEM_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
    "l_quantity double, l_extendedprice double, l_discount double, "
    "l_tax double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp"
)


def foreach_batch_hhi_cells(
    out_dir: str, part_df: DataFrame
) -> Callable[[DataFrame, int], None]:
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from near_indexer_for_explorer_spark.plans.relational import (
            market_cells,
        )

        market_cells(batch_df, part_df).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "deltas", f"batch={batch_id}"))
        _maybe_auto_compact(
            batch_df.sparkSession, out_dir, ["p_type", "l_suppkey"],
            {"micros": "decimal(19,0)"},
        )

    return sink


def hhi_stream(
    spark: SparkSession,
    src_dir: str,
    part_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """C31 driver: lineitem stream + broadcast part dim ->
    incrementally maintained concentration cells; read the HHI with
    read_stream_hhi()."""
    stream = (
        spark.readStream.schema(LINEITEM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            foreach_batch_hhi_cells(out_dir, part_df)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_stream_hhi(spark: SparkSession, out_dir: str) -> DataFrame:
    """The C31 read path: fold the concentration-cell delta log
    (exact integer micro-units — merge-order free) into the SAME
    kernel as A87."""
    from near_indexer_for_explorer_spark.plans.relational import (
        hhi_from_cells,
    )

    cells = (
        _read_delta_log(spark, out_dir, HHI_CELL_SCHEMA)
        .groupBy("p_type", "l_suppkey")
        .agg(F.sum("micros").cast("decimal(19,0)").alias("micros"))
    )
    return hhi_from_cells(cells)


# ---------------------------------------------------------------------------
# C32 additive count maintenance via batch-id-keyed deltas — the
# delta-log write path for aggregations whose merge is NOT idempotent.
# C22/C28 survive replay because OR/register-max absorb duplicates;
# SUM does not, so the sink derives idempotency from the TRANSACTION
# ID instead: each micro-batch OVERWRITES its own
# ``deltas/batch=<batch_id>`` directory (foreachBatch batch ids are
# stable across restarts within a checkpoint lineage), making a
# crash-replayed batch rewrite the identical delta rather than
# double-count.  This is the reference's ON-CONFLICT idempotency
# transplanted to an algebra Postgres upserts cannot give for SUM —
# and the write path is PURE APPEND: unlike the C7 read-modify-write
# snapshot merge, a batch never reads existing state, so per-batch
# cost is O(batch) regardless of state size (the LSM/delta-log shape
# real lakehouse formats use).
#
# Read = fold (SUM over base + uncovered deltas); compaction folds
# into a versioned ``base/upto=<B>`` snapshot and prunes deltas <= B.
# Crash safety: the reader picks the HIGHEST base version and ignores
# deltas at-or-below its coverage, so a crash between base write and
# prune double-counts nothing, and a replayed batch <= B is ignored
# outright.  Counts are BIGINTs and value sums exact DECIMALs, so the
# fold is merge-order free (the C7/C29 discipline).
# ---------------------------------------------------------------------------
def foreach_batch_count_deltas(out_dir: str) -> Callable[[DataFrame, int], None]:
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # sum_value is pinned to the log's one decimal type at write:
        # SUM(decimal(12,2)) plans as decimal(22,2) and would give the
        # delta files a different parquet physical type than the
        # compacted base (schema drift across the fold's file set)
        deltas = batch_df.groupBy(
            "event_type", F.to_date("ts").alias("event_date")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("decimal(14,2)")
            .alias("sum_value"),
        )
        deltas.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "deltas", f"batch={batch_id}")
        )
        _maybe_auto_compact(
            batch_df.sparkSession, out_dir, ["event_type", "event_date"],
            {"n_events": "long", "sum_value": "decimal(14,2)"},
        )

    return sink


def _count_delta_sources(out_dir: str) -> tuple[list[str], int]:
    """(paths to fold, covered-through batch id): the newest base
    snapshot plus every delta ABOVE its coverage.  Deltas at-or-below
    the coverage are replay ghosts or compaction leftovers — ignored
    by construction."""
    import glob

    bases = glob.glob(os.path.join(out_dir, "base", "upto=*"))
    covered = max((int(d.rsplit("=", 1)[1]) for d in bases), default=-1)
    srcs = [os.path.join(out_dir, "base", f"upto={covered}")] if covered >= 0 else []
    srcs += [
        d
        for d in sorted(glob.glob(os.path.join(out_dir, "deltas", "batch=*")))
        if int(d.rsplit("=", 1)[1]) > covered
    ]
    return srcs, covered


# Sink-driven compaction cadence (r8 advice): without it the delta log
# grows one parquet directory per micro-batch FOREVER in an unattended
# deployment — read cost and small-file count unbounded.  Each additive
# sink calls _maybe_auto_compact after writing its delta; when the
# uncovered-delta count crosses the threshold, the C32 fold-and-replace
# runs inline.  Safe inside foreachBatch: the protocol tolerates a
# crash at any point (write-before-delete; the reader prefers the
# newest base and ignores covered deltas), and a crash-replayed batch
# rewrites an already-covered delta that the next prune sweeps.
_AUTO_COMPACT_EVERY = 64


def _maybe_auto_compact(
    spark: SparkSession,
    out_dir: str,
    key_cols: list[str],
    sum_cols: dict[str, str],
    agg_fn: str = "sum",
) -> None:
    srcs, _ = _count_delta_sources(out_dir)
    n_deltas = sum(1 for s in srcs if f"{os.sep}deltas{os.sep}" in s)
    if n_deltas >= _AUTO_COMPACT_EVERY:
        compact_cell_deltas(spark, out_dir, key_cols, sum_cols, agg_fn=agg_fn)


def _read_delta_log(
    spark: SparkSession, out_dir: str, empty_schema: str
) -> DataFrame:
    """Fold sources of a delta log, or an EMPTY frame with the log's
    schema when no batch has committed yet (r8 advice: a fresh out_dir
    used to hand spark.read.parquet an empty path list and surface a
    confusing reader error instead of empty state).

    Legacy-layout guard (r10 advice): the pre-r10 closes log appended
    flat part-*.parquet files directly under the log dir; the
    base/deltas reader would silently fold such a dir as EMPTY (every
    order reads as never-closed).  Stale-layout state must fail
    loudly, not drop rows."""
    import glob

    legacy = glob.glob(os.path.join(out_dir, "part-*"))
    if legacy:
        raise ValueError(
            f"delta log {out_dir!r} contains {len(legacy)} flat "
            "part-* files (pre-base/deltas layout); re-ingest from the "
            "checkpoint or move them under deltas/batch=<n>/ — refusing "
            "to silently read stale-layout state as empty"
        )
    srcs, _ = _count_delta_sources(out_dir)
    if not srcs:
        return spark.createDataFrame([], empty_schema)
    return spark.read.parquet(*srcs)


# one declared schema per additive cell log: the empty-read frame and
# the compaction spec must match what the sink actually writes
TREND_CELL_SCHEMA = "event_type string, d date, y decimal(14,2)"
BENFORD_CELL_SCHEMA = "digit int, n long"
HHI_CELL_SCHEMA = "p_type string, l_suppkey bigint, micros decimal(19,0)"
COUNT_CELL_SCHEMA = (
    "event_type string, event_date date, n_events long, "
    "sum_value decimal(14,2)"
)
PII_CELL_SCHEMA = (
    "source string, n_docs long, docs_with_pii long, n_emails long, "
    "n_urls long, n_ipv4 long, n_phones long, docs_with_email long, "
    "docs_with_url long, docs_with_ipv4 long, docs_with_phone long"
)
READINESS_INPUT_SCHEMA = "receipt_id long, o_orderpriority string, data_id long"
READINESS_PRODUCED_SCHEMA = "data_id long"
OPENS_CELL_SCHEMA = "day date, n_opened long"
CLOSES_CELL_SCHEMA = "l_orderkey long, close_d date"
MIX_CELL_SCHEMA = "w long, event_type string, obs long"
AMOUNT_CELL_SCHEMA = "w long, bucket long, n long"


def count_rollup_read(spark: SparkSession, out_dir: str) -> DataFrame:
    """(event_type, event_date, n_events, sum_value): the fold of the
    newest base snapshot + uncovered deltas — exactly the batch
    rollup over everything ingested."""
    return (
        _read_delta_log(spark, out_dir, COUNT_CELL_SCHEMA)
        .groupBy("event_type", "event_date")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("sum_value").cast("decimal(14,2)").alias("sum_value"),
        )
    )


def compact_cell_deltas(
    spark: SparkSession,
    out_dir: str,
    key_cols: list[str],
    sum_cols: dict[str, str],
    _fail_before_prune: bool = False,
    agg_fn: str = "sum",
) -> tuple[int, int]:
    """Generic C32 fold-and-replace compaction for ANY mergeable cell
    delta log: fold (base + deltas) grouped on ``key_cols`` with
    ``agg_fn`` over ``sum_cols`` (each cast back to its declared
    type), write ``base/upto=<max folded batch>``, then prune covered
    deltas and stale bases.  ``agg_fn="sum"`` is the additive family
    (count rollup, trend daily cells, Benford digits, HHI micro-units,
    PII source cells); ``agg_fn="max"`` is the register-max family
    (the C33 closes log), whose fold is idempotent so replay ghosts
    merge away even before the prune.  Write-before-delete: a crash
    between the two steps leaves a state every read still folds
    correctly (the new base wins, covered deltas are ignored), and the
    prune doubles as the replay-ghost sweep."""
    import glob
    import shutil

    srcs, covered = _count_delta_sources(out_dir)
    delta_ids = [
        int(d.rsplit("=", 1)[1]) for d in srcs if "/deltas/" in d
    ]
    n_folded = 0
    new_covered = covered
    if delta_ids:
        n_folded = len(srcs)
        new_covered = max(delta_ids)
        fold = {"sum": F.sum, "max": F.max}[agg_fn]
        folded = spark.read.parquet(*srcs).groupBy(*key_cols).agg(
            *[
                fold(c).cast(t).alias(c)
                for c, t in sum_cols.items()
            ]
        )
        folded.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "base", f"upto={new_covered}")
        )
        if _fail_before_prune:
            raise RuntimeError("injected crash between base write and prune")
    # the prune doubles as the ghost sweep: covered deltas (replay
    # leftovers, crashed-compaction remnants) and stale bases go even
    # when there was nothing new to fold
    for d in glob.glob(os.path.join(out_dir, "deltas", "batch=*")):
        if int(d.rsplit("=", 1)[1]) <= new_covered:
            shutil.rmtree(d)
    for d in glob.glob(os.path.join(out_dir, "base", "upto=*")):
        if int(d.rsplit("=", 1)[1]) < new_covered:
            shutil.rmtree(d)
    remaining = glob.glob(os.path.join(out_dir, "deltas", "batch=*")) + glob.glob(
        os.path.join(out_dir, "base", "upto=*")
    )
    return (n_folded, len(remaining))


def compact_count_deltas(
    spark: SparkSession, out_dir: str, _fail_before_prune: bool = False
) -> tuple[int, int]:
    """C32's compaction — the count-rollup instance of
    :func:`compact_cell_deltas` (kept as a named entry point; the
    crash-protocol pytest drives it)."""
    return compact_cell_deltas(
        spark,
        out_dir,
        ["event_type", "event_date"],
        {"n_events": "long", "sum_value": "decimal(14,2)"},
        _fail_before_prune=_fail_before_prune,
    )


def count_delta_stream(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
):
    """C32 driver: event stream -> per-(type, day) additive counts
    maintained as batch-id-keyed append-only deltas."""
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    return (
        stream.writeStream.foreachBatch(foreach_batch_count_deltas(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# C33 incremental backlog maintenance — A98's two sufficient relations
# are each MERGEABLE under one of the proven delta algebras, so the
# stream composes them: per-day open counts are additive (the C32
# batch-id-keyed delta log — replays overwrite their own delta), and
# per-order close dates are a register-MAX delta log (batch-id-keyed
# like C32 but folded with MAX — a replayed batch overwrites its own
# delta and a late-arriving shipment max-merges away; compacted on
# the same cadence knob as the additive logs, r9 advice).
# The read path feeds both folds to the SAME backlog_from_deltas
# kernel as the A98 batch query, so stream == batch is a kernel
# invariant, not a re-implementation.  A late lineitem file that
# pushes an order's close date forward is handled by the max fold
# with no retraction bookkeeping — the kernel re-derives the leaving
# deltas from state, never from history.
# ---------------------------------------------------------------------------
def foreach_batch_backlog_opens(out_dir: str) -> Callable[[DataFrame, int], None]:
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        deltas = batch_df.groupBy(F.to_date("o_orderdate").alias("day")).agg(
            F.count(F.lit(1)).cast("long").alias("n_opened")
        )
        deltas.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "opens", "deltas", f"batch={batch_id}")
        )
        _maybe_auto_compact(
            batch_df.sparkSession, os.path.join(out_dir, "opens"),
            ["day"], {"n_opened": "long"},
        )

    return sink


def foreach_batch_backlog_closes(out_dir: str) -> Callable[[DataFrame, int], None]:
    """Register-max delta log: one batch-id-keyed delta per
    micro-batch (a replay overwrites its own delta) compacted on the
    same cadence knob as the additive logs but with a MAX fold — the
    r9 advice's missing compaction for the closes leg, which used to
    append one parquet dir per micro-batch forever."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        closes_dir = os.path.join(out_dir, "closes")
        deltas = batch_df.groupBy("l_orderkey").agg(
            F.max(F.to_date("l_shipdate")).alias("close_d")
        )
        deltas.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(closes_dir, "deltas", f"batch={batch_id}")
        )
        _maybe_auto_compact(
            batch_df.sparkSession, closes_dir,
            ["l_orderkey"], {"close_d": "date"}, agg_fn="max",
        )

    return sink


def backlog_stream(
    spark: SparkSession,
    orders_src: str,
    lineitem_src: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """C33 driver: orders + lineitem streams -> the two mergeable
    backlog relations.  Returns both streaming queries."""
    q_opens = (
        spark.readStream.schema(ORDERS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(orders_src)
        .writeStream.foreachBatch(foreach_batch_backlog_opens(out_dir))
        .option("checkpointLocation", os.path.join(checkpoint_dir, "opens"))
        .trigger(availableNow=True)
        .start()
    )
    q_closes = (
        spark.readStream.schema(LINEITEM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(lineitem_src)
        .writeStream.foreachBatch(foreach_batch_backlog_closes(out_dir))
        .option("checkpointLocation", os.path.join(checkpoint_dir, "closes"))
        .trigger(availableNow=True)
        .start()
    )
    return q_opens, q_closes


def read_stream_backlog(spark: SparkSession, out_dir: str) -> DataFrame:
    """The C33 read path: fold both delta logs (additive opens,
    register-max closes) and run the SAME backlog_from_deltas kernel
    as the A98 batch query."""
    from near_indexer_for_explorer_spark.plans.relational import (
        backlog_from_deltas,
    )

    opened = (
        _read_delta_log(spark, os.path.join(out_dir, "opens"), OPENS_CELL_SCHEMA)
        .groupBy("day")
        .agg(F.sum("n_opened").cast("long").alias("n_opened"))
    )
    closes = (
        _read_delta_log(spark, os.path.join(out_dir, "closes"), CLOSES_CELL_SCHEMA)
        .groupBy("l_orderkey")
        .agg(F.max("close_d").alias("close_d"))
    )
    return backlog_from_deltas(opened, closes)


# ---------------------------------------------------------------------------
# C34: streaming inter-arrival regularity — the stateful twin of
# A99's batch kernel.  The gap sequence is a sequential fold (each
# gap needs the PREVIOUS event's timestamp, across micro-batch
# boundaries), so the sufficient state per user is exactly four
# integers: (last_us, n_gaps, s1, s2) — the same two-exact-sums
# moment state A99 aggregates, carried forever in O(1) per user (the
# C16/C24 discipline; like C24 this assumes the lake stream is
# time-ordered per key across batches, the NEAR Lake block-order
# property).  Gap seconds and both moment sums are EXACT python ints,
# so the streamed statistics are pure functions of the event sequence
# — bit-stable across replays and equal to the batch aggregate, not
# approximately equal.  The emitted cv is rounded HALF_UP at 6
# decimals via Decimal (matching Spark's F.round on doubles) so the
# regular-cadence flag agrees with A99 row-for-row.
# ---------------------------------------------------------------------------
INTERARRIVAL_OUTPUT_SCHEMA = (
    "user_id long, n_gaps long, mean_gap_s double, cv double, "
    "is_regular boolean"
)
INTERARRIVAL_STATE_SCHEMA = "last_us long, n long, s1 long, s2 long"


def make_interarrival_kernel():
    def update(key, pdfs, state: GroupState):
        from decimal import ROUND_HALF_UP, Decimal

        import pandas as pd

        (user_id,) = key
        last_us, n, s1, s2 = (
            state.get if state.exists else (None, 0, 0, 0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for ts in rows["ts"]:
            us = int(ts.value) // 1000  # pandas ns -> integer micros
            if last_us is not None:
                gap = (us - last_us) // 1000000
                n += 1
                s1 += gap
                s2 += gap * gap
            last_us = us
        state.update((last_us, n, s1, s2))
        if n >= 2:
            def r6(x: float) -> float:
                return float(
                    Decimal(x).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)
                )

            mean = s1 / n
            var = max(s2 / n - mean * mean, 0.0)
            cv = r6(var**0.5 / mean) if mean != 0.0 else None
            yield pd.DataFrame(
                [
                    (
                        int(user_id),
                        int(n),
                        r6(mean),
                        cv,
                        bool(cv is not None and cv < 0.2 and n >= 20),
                    )
                ],
                columns=["user_id", "n_gaps", "mean_gap_s", "cv", "is_regular"],
            )

    return update


def interarrival_stream(spark: SparkSession, src_dir: str, query_name: str):
    """C34 driver: file-source events -> per-user exact gap-moment
    state, emitting the A99 statistics per touched user per batch."""
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    out = stream.groupBy("user_id").applyInPandasWithState(
        make_interarrival_kernel(),
        INTERARRIVAL_OUTPUT_SCHEMA,
        INTERARRIVAL_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# C35: online duplicate-payment alerts — the streaming twin of A102.
# The batch audit self-joins history; the operational need is an
# alert AS the duplicate lands, which is keyed state: per (custkey,
# exact decimal amount), the orders seen inside the trailing window.
# State is bounded by construction (entries older than the window
# prune on every update — the same-key stream is time-ordered, the
# C24/C34 lake-order assumption), alerts are emitted exactly once per
# pair (when the LATER order arrives), and the pair columns match
# A102's batch relation row-for-row: the alert key is (min, max)
# orderkey and the amount is the RAW double of the lower-key side
# (A102's a.raw_amt), carried through state.  Downstream delivery is
# at-least-once under replay — alerting semantics, like the
# reference's notification paths.
# ---------------------------------------------------------------------------
DUPPAY_OUTPUT_SCHEMA = (
    "o_custkey long, orderkey_1 long, orderkey_2 long, amount double, "
    "days_apart long"
)
DUPPAY_STATE_SCHEMA = "ks array<long>, ds array<long>, raws array<double>"
_DUPPAY_WINDOW = 3


def make_duppay_kernel():
    def update(key, pdfs, state: GroupState):
        import pandas as pd

        custkey = int(key[0])
        ks, ds, raws = state.get if state.exists else ([], [], [])
        ks, ds, raws = list(ks), list(ds), list(raws)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["day", "o_orderkey"])
        out = []
        for okey, day, raw in zip(
            rows["o_orderkey"], rows["day"], rows["o_totalprice"]
        ):
            okey, day, raw = int(okey), int(day), float(raw)
            for pk, pdy, praw in zip(ks, ds, raws):
                if abs(day - pdy) <= _DUPPAY_WINDOW:
                    k1, k2 = (pk, okey) if pk < okey else (okey, pk)
                    a_raw = praw if pk < okey else raw
                    out.append(
                        (custkey, k1, k2, a_raw, abs(day - pdy))
                    )
            ks.append(okey)
            ds.append(day)
            raws.append(raw)
            keep = [i for i, dd in enumerate(ds) if dd >= day - _DUPPAY_WINDOW]
            ks = [ks[i] for i in keep]
            ds = [ds[i] for i in keep]
            raws = [raws[i] for i in keep]
        state.update((ks, ds, raws))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "o_custkey",
                    "orderkey_1",
                    "orderkey_2",
                    "amount",
                    "days_apart",
                ],
            )

    return update


def duppay_stream(spark: SparkSession, src_dir: str, query_name: str):
    """C35 driver: orders stream -> online duplicate-payment alerts."""
    stream = (
        spark.readStream.schema(ORDERS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.col("o_totalprice").cast("decimal(12,2)").alias("amt"),
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day"),
        )
    )
    out = stream.groupBy("o_custkey", "amt").applyInPandasWithState(
        make_duppay_kernel(),
        DUPPAY_OUTPUT_SCHEMA,
        DUPPAY_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# C36: streaming mix-drift maintenance — A101's sufficient relation is
# ADDITIVE (w, event_type, obs) count cells, so the stream rides the
# C32 batch-id-keyed delta log verbatim (a replayed batch overwrites
# its own delta; pure-append writes, O(batch) per batch at any state
# size) and the read path folds the cells into the SAME
# mix_drift_from_cells kernel as the A101 batch query.  Note the
# statistic itself is NON-additive (every week's chi-square moves when
# the all-time mix moves) — which is exactly why the stream maintains
# the cells, never the chi-squares (the C17/C29 minimal-sufficient-
# state discipline).
# ---------------------------------------------------------------------------
def foreach_batch_mix_cells(out_dir: str) -> Callable[[DataFrame, int], None]:
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from near_indexer_for_explorer_spark.plans.relational import (
            weekly_type_cells,
        )

        deltas = weekly_type_cells(batch_df).select(
            "w", "event_type", F.col("obs").cast("long").alias("obs")
        )
        deltas.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "deltas", f"batch={batch_id}")
        )
        _maybe_auto_compact(
            batch_df.sparkSession, out_dir, ["w", "event_type"],
            {"obs": "long"},
        )

    return sink


def mix_drift_stream(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
):
    """C36 driver: event stream -> incrementally maintained weekly
    mix cells; read the drift with read_stream_mix_drift()."""
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    return (
        stream.writeStream.foreachBatch(foreach_batch_mix_cells(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_stream_mix_drift(spark: SparkSession, out_dir: str) -> DataFrame:
    """The C36 read path: fold the cell delta log and run the SAME
    mix_drift_from_cells kernel as A101."""
    from near_indexer_for_explorer_spark.plans.relational import (
        mix_drift_from_cells,
    )

    cells = (
        _read_delta_log(spark, out_dir, MIX_CELL_SCHEMA)
        .groupBy("w", "event_type")
        .agg(F.sum("obs").cast("long").alias("obs"))
    )
    return mix_drift_from_cells(cells)


# ---------------------------------------------------------------------------
# C37: streaming amount-distribution drift — A106 against a FROZEN
# reference, which is the operationally right monitor: the batch
# query compares each week to the pooled history (boundaries move as
# data arrives — fine for an audit, wrong for an alert); the online
# monitor freezes the decile boundaries from a calibration batch
# (C25's static-baseline pattern) and scores each week's ECDF against
# the frozen reference ECDF (exactly 1/10 per bucket by construction)
# as orders stream in.  The (week, bucket) cells are additive, so the
# write path is C32's batch-id-keyed delta log verbatim; read folds
# the cells and evaluates the KS gap against the uniform reference —
# state O(weeks x 10) at any volume.
# ---------------------------------------------------------------------------
def amount_drift_baseline(orders: DataFrame) -> DataFrame:
    """1-row frozen decile boundaries (b1..b9, round-6) — the
    calibration artifact the streaming monitor scores against."""
    return orders.agg(
        *[
            F.round(F.percentile("o_totalprice", F.lit(i / 10)), 6).alias(
                f"b{i}"
            )
            for i in range(1, 10)
        ]
    )


def foreach_batch_amount_cells(
    out_dir: str, baseline: DataFrame
) -> Callable[[DataFrame, int], None]:
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        bucket = None
        for i in range(1, 10):
            term = F.when(F.col("o_totalprice") > F.col(f"b{i}"), 1).otherwise(0)
            bucket = term if bucket is None else bucket + term
        epoch = F.datediff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        )
        deltas = (
            batch_df.crossJoin(F.broadcast(baseline))
            .select(
                F.floor((epoch.cast("long") + 3) / 7).cast("long").alias("w"),
                bucket.cast("long").alias("bucket"),
            )
            .groupBy("w", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        deltas.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "deltas", f"batch={batch_id}")
        )
        _maybe_auto_compact(
            batch_df.sparkSession, out_dir, ["w", "bucket"], {"n": "long"}
        )

    return sink


def amount_drift_stream(
    spark: SparkSession,
    src_dir: str,
    baseline: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """C37 driver: orders stream + frozen boundary artifact ->
    incrementally maintained weekly bucket cells."""
    stream = (
        spark.readStream.schema(ORDERS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            foreach_batch_amount_cells(out_dir, baseline)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_stream_amount_drift(spark: SparkSession, out_dir: str) -> DataFrame:
    """(week_start, n_orders, ks_stat, drifted): each week's ECDF vs
    the frozen reference's uniform 1/10-per-bucket ECDF, from the
    folded cells."""
    cells = (
        _read_delta_log(spark, out_dir, AMOUNT_CELL_SCHEMA)
        .groupBy("w", "bucket")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    weeks = cells.groupBy("w").agg(F.sum("n").cast("long").alias("wt"))
    spine = weeks.crossJoin(
        F.broadcast(
            spark.range(10).select(F.col("id").alias("bucket"))
        )
    )
    cw_w = (
        Window.partitionBy("w")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = spine.join(cells, ["w", "bucket"], "left").select(
        "w",
        "wt",
        "bucket",
        F.sum(F.coalesce(F.col("n"), F.lit(0)))
        .over(cw_w)
        .cast("long")
        .alias("cw"),
    )
    # reference ECDF at boundary j is exactly (j+1)/10 by construction
    gap = F.abs(
        F.col("cw").cast("double") / F.col("wt")
        - (F.col("bucket") + 1).cast("double") / 10.0
    )
    return (
        cum.where(F.col("bucket") < 9)
        .groupBy("w", "wt")
        .agg(F.round(F.max(gap), 6).alias("ks_stat"))
        .select(
            F.date_add(
                F.lit("1970-01-01").cast("date"),
                (F.col("w") * 7 - 3).cast("int"),
            ).alias("week_start"),
            F.col("wt").alias("n_orders"),
            "ks_stat",
            (F.col("ks_stat") > 0.1).alias("drifted"),
        )
    )


# ---------------------------------------------------------------------------
# C38 incremental data-availability maintenance — the streaming twin
# of A110's receipt readiness (reference analog: adapters/receipts.rs
# routes DataId rows through the tx-hash cache precisely because the
# producer may land in an EARLIER block than the consumer; the live
# question "which receipts are still waiting on input data" is an
# incrementally maintained join, not a batch audit).
#
# Both sufficient relations are append-only SETS keyed by unique ids
# (input edges per receipt, produced data ids), so each micro-batch
# writes its contribution as a batch-id-keyed delta (the C32 overwrite
# discipline: a replayed batch rewrites ITS OWN delta instead of
# appending a duplicate — exactly-once state from at-least-once
# delivery with no read-modify-write races).  The read path folds the
# deltas and feeds the IDENTICAL readiness_from_edges kernel as the
# A110 batch query — stream == batch is a kernel invariant.  A
# receipt flips blocked -> ready the moment a later batch delivers its
# missing producer; no retraction bookkeeping, because readiness is
# re-derived from state, never incremented.
#
# State is O(edges), the relation itself — the minimal sufficient
# state for a join whose verdict can flip on either side's arrival.
# At 100 TB both delta logs partition by data_id/receipt_id and the
# fold compacts under the C32 versioned fold-and-replace.
# ---------------------------------------------------------------------------
# C38 reads only the two columns the edge derivation needs -- the
# streaming schema IS the column pruning (parquet reads nothing else).
RECEIPT_ORDERS_SCHEMA = "o_orderkey long, o_orderpriority string"


def foreach_batch_receipt_edges(out_dir: str) -> Callable[[DataFrame, int], None]:
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from near_indexer_for_explorer_spark.plans.relational import (
            receipt_input_edges,
            receipt_produced_ids,
        )

        orders = batch_df.select("o_orderkey", "o_orderpriority")
        receipt_input_edges(orders).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "inputs", "deltas", f"batch={batch_id}"))
        receipt_produced_ids(orders).coalesce(1).write.mode(
            "overwrite"
        ).parquet(
            os.path.join(out_dir, "produced", "deltas", f"batch={batch_id}")
        )

    return sink


def receipt_readiness_stream(
    spark: SparkSession, orders_src: str, out_dir: str, checkpoint_dir: str
):
    """C38 driver: an orders (action-receipt) stream -> the two
    batch-id-keyed edge delta logs."""
    return (
        spark.readStream.schema(RECEIPT_ORDERS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(orders_src)
        .writeStream.foreachBatch(foreach_batch_receipt_edges(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_stream_receipt_readiness(spark: SparkSession, out_dir: str) -> DataFrame:
    """The C38 read path: fold both edge delta logs and run the SAME
    readiness kernel as the A110 batch query."""
    from near_indexer_for_explorer_spark.plans.relational import (
        readiness_from_edges,
    )

    return readiness_from_edges(
        _read_delta_log(
            spark, os.path.join(out_dir, "inputs"), READINESS_INPUT_SCHEMA
        ),
        _read_delta_log(
            spark, os.path.join(out_dir, "produced"),
            READINESS_PRODUCED_SCHEMA,
        ),
    )


# ---------------------------------------------------------------------------
# C39: streaming PII-exposure monitor — B113 as a LIVE intake signal.
# The per-source exposure profile is the quantity a crawl operator
# watches DURING ingestion (a source whose PII rate spikes gets cut
# off before the corpus absorbs it), and every B113 cell is additive,
# so the state is the C32 batch-id-keyed delta log verbatim: each
# micro-batch writes its own per-source cell delta (replays overwrite
# their own file — idempotent), the read path folds cells through the
# IDENTICAL pii_report_from_cells kernel as the batch report.  State
# is O(sources x batches) before compaction, never O(corpus).
# ---------------------------------------------------------------------------
def foreach_batch_pii_cells(out_dir: str) -> Callable[[DataFrame, int], None]:
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from near_indexer_for_explorer_spark.operators.textops import (
            pii_source_cells,
        )

        pii_source_cells(batch_df).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "deltas", f"batch={batch_id}"))
        _maybe_auto_compact(
            batch_df.sparkSession,
            out_dir,
            ["source"],
            {c: "long" for c in (
                "n_docs", "docs_with_pii", "n_emails", "n_urls", "n_ipv4",
                "n_phones", "docs_with_email", "docs_with_url",
                "docs_with_ipv4", "docs_with_phone",
            )},
        )

    return sink


def pii_exposure_stream(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
):
    """C39 driver: document shards -> per-batch additive PII cells."""
    stream = read_document_stream(spark, src_dir, max_files_per_trigger=1)
    return (
        stream.writeStream.foreachBatch(foreach_batch_pii_cells(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_stream_pii_exposure(spark: SparkSession, out_dir: str) -> DataFrame:
    """The C39 read path: fold the cell delta log through the SAME
    rate projection as the B113 batch report."""
    from near_indexer_for_explorer_spark.operators.textops import (
        pii_report_from_cells,
    )

    return pii_report_from_cells(
        _read_delta_log(spark, out_dir, PII_CELL_SCHEMA)
    )


# ---------------------------------------------------------------------------
# C40: streaming IMAGE-intake dedup monitor — the real-codec dHash
# (B122/B123) as a LIVE signal.  A multimodal crawl flags incoming
# images whose perceptual fingerprint collides with anything already
# ingested; the state is an append-only (doc_id, dhash, band, bucket)
# fingerprint log whose rows are PURE FUNCTIONS of the document, so a
# crash-replayed batch appends byte-identical rows that DISTINCT-on-
# read absorbs — the C22/C28 idempotent-merge algebra with set-union
# instead of OR/max, no batch-id bookkeeping needed.  Per-batch cost
# is O(batch) (map-only hash + append); the read path's band-bucket
# join is the B123 blocking shape, linear at any corpus size.  At
# 100 TB the log partitions by bucket and compacts by plain
# DISTINCT-rewrite (idempotent, crash-safe like compact_hll_deltas).
# ---------------------------------------------------------------------------
IMAGE_HASH_LOG_SCHEMA = (
    "doc_id long, dhash long, band_id int, bucket long"
)


def image_fingerprint_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, dhash, band_id, bucket): the banded fingerprint rows of
    any (doc_id, text) frame — MODULE-LEVEL and shared by the C40 sink
    and the batch derivation so stream == batch is a kernel invariant
    (the C13 shared-constants lesson)."""
    from near_indexer_for_explorer_spark.multimodal.decode import (
        _DHASH_BAND_BITS,
        _DHASH_BANDS,
        IMAGE_DHASH_SCHEMA,
        make_image_dhash_kernel,
    )

    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    hashes = payloads.mapInPandas(
        make_image_dhash_kernel(), schema=IMAGE_DHASH_SCHEMA
    ).select("doc_id", "dhash")
    mask = (1 << _DHASH_BAND_BITS) - 1
    return hashes.select(
        "doc_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("int").alias("band_id"),
                        (
                            F.shiftright(F.col("dhash"), _DHASH_BAND_BITS * k)
                            % F.lit(mask + 1)
                        ).alias("bucket"),
                    )
                    for k in range(_DHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "dhash", "b.band_id", "b.bucket")


def foreach_batch_image_fingerprints(
    out_dir: str,
) -> Callable[[DataFrame, int], None]:
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        image_fingerprint_rows(batch_df).coalesce(1).write.mode(
            "append"
        ).parquet(os.path.join(out_dir, "fingerprints"))

    return sink


def image_intake_stream(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
):
    """C40 driver: document shards -> append-only banded fingerprint
    log (idempotent under replay: rows are pure functions of the doc)."""
    stream = read_document_stream(spark, src_dir, max_files_per_trigger=1)
    return (
        stream.writeStream.foreachBatch(foreach_batch_image_fingerprints(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_stream_image_dups(spark: SparkSession, out_dir: str) -> DataFrame:
    """The C40 read path: (doc_id, dup_of_earlier) for every ingested
    document — TRUE iff some EARLIER doc (smaller doc_id, the intake
    order key) sits within the B123 hamming radius.  DISTINCT absorbs
    replay-appended duplicate rows before the band join."""
    from near_indexer_for_explorer_spark.multimodal.decode import (
        _DHASH_HAMMING_MAX,
    )

    fp_dir = os.path.join(out_dir, "fingerprints")
    raw = (
        spark.read.parquet(fp_dir)
        if os.path.isdir(fp_dir)
        else spark.createDataFrame([], IMAGE_HASH_LOG_SCHEMA)
    )
    rows = raw.distinct()
    earlier = rows.select(
        "band_id",
        "bucket",
        F.col("doc_id").alias("doc_id_1"),
        F.col("dhash").alias("h1"),
    )
    later = rows.select(
        "band_id",
        "bucket",
        F.col("doc_id").alias("doc_id_2"),
        F.col("dhash").alias("h2"),
    )
    dup_ids = (
        earlier.join(later, ["band_id", "bucket"])
        .where(F.col("doc_id_1") < F.col("doc_id_2"))
        .where(F.bit_count(F.expr("h1 ^ h2")) <= _DHASH_HAMMING_MAX)
        .select(F.col("doc_id_2").alias("doc_id"))
        .distinct()
        .withColumn("dup_of_earlier", F.lit(True))
    )
    docs = rows.select("doc_id").distinct()
    return docs.join(dup_ids, "doc_id", "left").select(
        "doc_id", F.coalesce("dup_of_earlier", F.lit(False)).alias("dup_of_earlier")
    )


# ---------------------------------------------------------------------------
# C41: streaming sample-ratio-mismatch monitor — A113 as a LIVE
# experimentation guardrail (an arm-assignment bug shows up in the
# daily split within hours; waiting for the batch job is how broken
# experiments burn a week).  Every (day, arm) cell is an additive
# count, so the state is the C32 batch-id-keyed delta log verbatim;
# the read path folds cells through the IDENTICAL srm_from_daily
# kernel as the A113 batch query, so stream == batch is a kernel
# invariant.  State is O(days x batches) before compaction, never
# O(events).
# ---------------------------------------------------------------------------
SRM_CELL_SCHEMA = "event_date date, n_a long, n_b long"


def foreach_batch_srm_cells(out_dir: str) -> Callable[[DataFrame, int], None]:
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        deltas = batch_df.groupBy(F.to_date("ts").alias("event_date")).agg(
            F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_a"),
            F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_b"),
        )
        deltas.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "deltas", f"batch={batch_id}")
        )
        _maybe_auto_compact(
            batch_df.sparkSession, out_dir, ["event_date"],
            {"n_a": "long", "n_b": "long"},
        )

    return sink


def srm_stream(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
):
    """C41 driver: event stream -> per-(day, arm) additive count cells."""
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    return (
        stream.writeStream.foreachBatch(foreach_batch_srm_cells(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_stream_srm(spark: SparkSession, out_dir: str) -> DataFrame:
    """The C41 read path: fold the arm-count cells and score with the
    SAME srm_from_daily kernel as the A113 batch check."""
    from near_indexer_for_explorer_spark.plans.relational import (
        srm_from_daily,
    )

    daily = (
        _read_delta_log(spark, out_dir, SRM_CELL_SCHEMA)
        .groupBy("event_date")
        .agg(
            F.sum("n_a").cast("long").alias("n_a"),
            F.sum("n_b").cast("long").alias("n_b"),
        )
    )
    return srm_from_daily(daily)


# ---------------------------------------------------------------------------
# C42: streaming forecast backtest — A112 served LIVE off the C32
# count log with ZERO new state: the (type, day, n_events) cells the
# count-rollup sink already maintains are exactly the daily relation
# the backtest kernel consumes, so this is a read path over an
# existing log, not another sink (the strongest form of the
# stream == batch discipline: one state, many derived monitors).
# ---------------------------------------------------------------------------
def read_stream_forecast_backtest(spark: SparkSession, out_dir: str) -> DataFrame:
    """Fold the C32 count cells and run the SAME
    forecast_backtest_from_daily kernel as the A112 batch query."""
    from near_indexer_for_explorer_spark.plans.relational import (
        forecast_backtest_from_daily,
    )

    daily = (
        _read_delta_log(spark, out_dir, COUNT_CELL_SCHEMA)
        .groupBy("event_type", F.col("event_date").alias("d"))
        .agg(F.sum("n_events").cast("long").alias("n"))
    )
    return forecast_backtest_from_daily(daily)


# ---------------------------------------------------------------------------
# C43: streaming changepoint localization — A115 served LIVE off the
# C32 count log, the second zero-new-state read path (C42's
# discipline): the count cells already hold the daily series, so
# "where did the level shift" is a fold + the shared binseg kernel.
# ---------------------------------------------------------------------------
def read_stream_changepoint(spark: SparkSession, out_dir: str) -> DataFrame:
    """Fold the C32 count cells and run the SAME changepoint_from_daily
    kernel as the A115 batch query."""
    from near_indexer_for_explorer_spark.plans.relational import (
        changepoint_from_daily,
    )

    daily = (
        _read_delta_log(spark, out_dir, COUNT_CELL_SCHEMA)
        .groupBy("event_type", F.col("event_date").alias("d"))
        .agg(F.sum("n_events").cast("long").alias("n"))
    )
    return changepoint_from_daily(daily)


# ---------------------------------------------------------------------------
# C44: orphan-receipt park-and-redrive — the reference's non-strict
# mode warn-and-skips receipts whose parent transaction has not landed
# yet (indexer/src/configs.rs:31-33; database/src/receipts_cache.rs is
# the two-phase tx-hash lookup that usually prevents it), and
# TROUBLESHOOTING.md documents re-indexing the skipped ones later.
# This sink makes that loop a PROTOCOL instead of an ops runbook:
# receipts (lineitem rows) whose parent tx (order) is not yet in the
# ingested relation are PARKED in a quarantine state, every subsequent
# receipt batch re-joins the parked set against the grown parent
# relation (the redrive), and matched rows are emitted IDENTICALLY to
# the normal enrichment path — an empty "tick" batch redrives parked
# rows with no new data.
#
# State discipline:
# - parents: C32 batch-id-keyed set deltas (a replayed orders batch
#   overwrites its own delta);
# - parked: a VERSIONED state snapshot parked/upto=<batch>; batch N
#   reads the newest snapshot with upto < N (never its own crashed
#   write, so a replay recomputes from exactly the pre-batch state),
#   writes upto=N, then prunes upto < N-1 (two newest retained: N for
#   batch N+1's read, and the one N+1 itself needs under replay);
# - matched: batch-id-keyed deltas; with the strict parked-read rule a
#   committed row lands in exactly one delta, and the fold dedups by
#   line key as a belt-and-braces invariant.
# At 100 TB: the parked relation is the orphan backlog (tiny in a
# healthy ingest), the parent relation folds under the C32 compaction
# cadence, and the per-batch join is parked+batch vs parents on the
# order key — partition-pruned by join key, never a rescan of history.
# ---------------------------------------------------------------------------
ORPHAN_ORDERS_SCHEMA = (
    "o_orderkey long, o_orderdate timestamp_ntz, o_orderpriority string"
)
# the receipt identity is the full carried column set: neither
# (orderkey, linenumber) nor the part/supp 4-tuple is unique in this
# synthetic lake, so parking/dedup/redrive key on all five carried
# columns (verified unique at every SF) — the stand-in for the
# reference's unique receipt_id
ORPHAN_LINE_KEY = [
    "l_orderkey",
    "l_linenumber",
    "l_partkey",
    "l_suppkey",
    "l_extendedprice",
]
ORPHAN_LINE_SCHEMA = (
    "l_orderkey long, l_linenumber long, l_partkey long, l_suppkey long, "
    "l_extendedprice double"
)
ORPHAN_MATCHED_SCHEMA = (
    "l_orderkey long, l_linenumber long, l_partkey long, l_suppkey long, "
    "l_extendedprice double, o_orderdate date, o_orderpriority string"
)


def orphan_enrich_join(lines: DataFrame, orders: DataFrame) -> DataFrame:
    """The ONE enrichment kernel both the batch oracle and the
    streaming redrive emit through: receipts joined to their parent
    transactions."""
    return lines.join(
        orders, lines["l_orderkey"] == orders["o_orderkey"]
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_extendedprice",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_orderpriority",
    )


def foreach_batch_parent_intake(out_dir: str) -> Callable[[DataFrame, int], None]:
    """Parent (orders/tx) stream sink: append the batch's parent set
    as a C32 batch-id-keyed delta."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.select(
            "o_orderkey", "o_orderdate", "o_orderpriority"
        ).dropDuplicates(["o_orderkey"]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(
            os.path.join(out_dir, "parents", "deltas", f"batch={batch_id}")
        )

    return sink


# parked rows carry the batch id that first quarantined them, so a
# dead-letter TTL is a pure column comparison (no per-row timers)
ORPHAN_PARKED_SCHEMA = ORPHAN_LINE_SCHEMA + ", parked_since long"


def _read_parked(spark: SparkSession, out_dir: str, below: int) -> DataFrame:
    import glob as _glob

    snaps = [
        (int(p.rsplit("=", 1)[1]), p)
        for p in _glob.glob(os.path.join(out_dir, "parked", "upto=*"))
        if int(p.rsplit("=", 1)[1]) < below
    ]
    if not snaps:
        return spark.createDataFrame([], ORPHAN_PARKED_SCHEMA)
    return spark.read.parquet(max(snaps)[1])


def foreach_batch_orphan_redrive(
    out_dir: str, dead_letter_after: int | None = None
) -> Callable[[DataFrame, int], None]:
    """Receipt (lineitem) stream sink: park-and-redrive per batch.

    ``dead_letter_after``: with a value N, a receipt still unmatched N
    batches after it was first parked moves to a batch-id-keyed
    dead-letter log instead of riding the parked state forever — the
    100 TB guard for parents that NEVER arrive (the reference's
    non-strict warn-and-skip, but kept re-drivable: dead-letter rows
    are in the stream's own input schema, so the TROUBLESHOOTING
    re-index is "replay this directory as a new source file").  None
    (default) parks indefinitely."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        import shutil as _shutil
        import glob as _glob

        spark = batch_df.sparkSession
        parents = _read_delta_log(
            spark, os.path.join(out_dir, "parents"), ORPHAN_ORDERS_SCHEMA
        ).dropDuplicates(["o_orderkey"])
        pending = (
            _read_parked(spark, out_dir, below=batch_id)
            .unionByName(
                batch_df.select(
                    "l_orderkey",
                    "l_linenumber",
                    "l_partkey",
                    "l_suppkey",
                    "l_extendedprice",
                ).withColumn("parked_since", F.lit(batch_id).cast("long"))
            )
            # a replayed row keeps its ORIGINAL parked_since: the
            # full carried column set is the key, so min() is the
            # deterministic dedup (never dropDuplicates' arbitrary row)
            .groupBy(*ORPHAN_LINE_KEY)
            .agg(F.min("parked_since").alias("parked_since"))
            .localCheckpoint(eager=True)
        )
        orphan_enrich_join(pending, parents).coalesce(1).write.mode(
            "overwrite"
        ).parquet(
            os.path.join(out_dir, "matched", "deltas", f"batch={batch_id}")
        )
        still_parked = pending.join(
            parents, pending["l_orderkey"] == parents["o_orderkey"], "left_anti"
        )
        if dead_letter_after is not None:
            expired = F.col("parked_since") <= F.lit(
                batch_id - dead_letter_after
            )
            still_parked.where(expired).drop("parked_since").coalesce(
                1
            ).write.mode("overwrite").parquet(
                os.path.join(
                    out_dir, "dead_letter", "deltas", f"batch={batch_id}"
                )
            )
            still_parked = still_parked.where(~expired)
        still_parked.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "parked", f"upto={batch_id}")
        )
        # write-before-delete: retain the two newest snapshots
        for p in _glob.glob(os.path.join(out_dir, "parked", "upto=*")):
            if int(p.rsplit("=", 1)[1]) < batch_id - 1:
                _shutil.rmtree(p, ignore_errors=True)

    return sink


def orphan_parent_stream(
    spark: SparkSession, orders_src: str, out_dir: str, checkpoint_dir: str
):
    """C44 parent leg: orders stream -> parent set deltas."""
    return (
        spark.readStream.schema(ORPHAN_ORDERS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(orders_src)
        .writeStream.foreachBatch(foreach_batch_parent_intake(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def orphan_redrive_stream(
    spark: SparkSession,
    lineitem_src: str,
    out_dir: str,
    checkpoint_dir: str,
    dead_letter_after: int | None = None,
):
    """C44 receipt leg: lineitem stream -> park-and-redrive sink.
    Single-writer discipline: only THIS stream touches parked/matched;
    the parent leg only appends its own delta log, so the two streams
    may run concurrently — a receipt whose parent lands mid-batch is
    redriven by the next tick at the latest."""
    return (
        spark.readStream.schema(ORPHAN_LINE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(lineitem_src)
        .writeStream.foreachBatch(
            foreach_batch_orphan_redrive(out_dir, dead_letter_after)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_orphan_matched(spark: SparkSession, out_dir: str) -> DataFrame:
    """The emitted enrichment table: fold the matched deltas, dedup by
    line key (belt-and-braces; the strict parked-read rule already
    puts each committed row in exactly one delta)."""
    matched_dir = os.path.join(out_dir, "matched")
    import glob as _glob

    srcs = sorted(
        _glob.glob(os.path.join(matched_dir, "deltas", "batch=*"))
    )
    if not srcs:
        return spark.createDataFrame([], ORPHAN_MATCHED_SCHEMA)
    return spark.read.parquet(*srcs).dropDuplicates(ORPHAN_LINE_KEY)


def read_orphan_parked(spark: SparkSession, out_dir: str) -> DataFrame:
    """The quarantine relation: receipts still waiting on a parent."""
    return _read_parked(spark, out_dir, below=1 << 62)


def read_orphan_dead_letter(spark: SparkSession, out_dir: str) -> DataFrame:
    """Receipts that aged out of the parked state (parent never
    arrived within the TTL).  Emitted in the stream's own input
    schema: re-driving them is copying this directory's rows back in
    as a new source file — the reference's re-index runbook as a
    one-liner."""
    import glob as _glob

    srcs = sorted(
        _glob.glob(os.path.join(out_dir, "dead_letter", "deltas", "batch=*"))
    )
    if not srcs:
        return spark.createDataFrame([], ORPHAN_LINE_SCHEMA)
    return spark.read.parquet(*srcs).dropDuplicates(ORPHAN_LINE_KEY)


# ---------------------------------------------------------------------------
# C45: streaming stratified-sample maintenance — B142 kept live as the
# corpus streams in ("the standing review sample" every QA dashboard
# reads).  The state algebra is a composition of two proven families:
# per-source EXACT counts ride the C32 batch-id-keyed additive delta
# log (replays overwrite their own delta), and per-source candidates
# ride a bounded top-N delta log — each batch contributes only its own
# top-_STRAT_BUDGET rows per source, which is sufficient because no
# allocation can ever take more than _STRAT_BUDGET from one source
# (n_prop <= N and n_equal <= N by construction), so the union of
# per-batch top-Ns contains the global top-take (the C26/C27
# key-space-partition argument applied per source).  Candidate rows
# are pure functions of the doc (doc_id, salted-md5 skey), so the fold
# dedups replays by doc_id (C40 idempotent set algebra).  The read
# path recomputes allocations from the folded counts and cuts ranks
# through the IDENTICAL stratified_cut kernel as B142 — stream ==
# batch is a kernel invariant.  Candidate deltas fold-and-replace on
# the shared cadence knob with a rank-cut compaction (the C32
# protocol, top-N fold instead of sum).
# ---------------------------------------------------------------------------
STRAT_COUNT_SCHEMA = "source string, n_source long"
STRAT_CAND_SCHEMA = "doc_id long, source string, skey string"


def foreach_batch_stratified(out_dir: str) -> Callable[[DataFrame, int], None]:
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window as W

        from near_indexer_for_explorer_spark.operators.corpus import (
            _STRAT_BUDGET,
            stratified_skey,
        )

        spark = batch_df.sparkSession
        docs = batch_df.select("doc_id", "source")
        docs.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_source")
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "counts", "deltas", f"batch={batch_id}")
        )
        _maybe_auto_compact(
            spark, os.path.join(out_dir, "counts"),
            ["source"], {"n_source": "long"},
        )
        w = W.partitionBy("source").orderBy(
            F.col("skey").asc(), F.col("doc_id").asc()
        )
        cands = (
            docs.withColumn("skey", stratified_skey(F.col("doc_id")))
            .withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= _STRAT_BUDGET)
            .drop("__rk")
        )
        cands.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "cands", "deltas", f"batch={batch_id}")
        )
        _maybe_compact_topk_cands(spark, os.path.join(out_dir, "cands"))

    return sink


def _fold_strat_cands(spark: SparkSession, cands_dir: str) -> DataFrame:
    """Fold the candidate log: doc_id-dedup (replay absorption) then
    per-source top-_STRAT_BUDGET cut."""
    from pyspark.sql import Window as W

    from near_indexer_for_explorer_spark.operators.corpus import (
        _STRAT_BUDGET,
    )

    w = W.partitionBy("source").orderBy(
        F.col("skey").asc(), F.col("doc_id").asc()
    )
    return (
        _read_delta_log(spark, cands_dir, STRAT_CAND_SCHEMA)
        .dropDuplicates(["doc_id"])
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= _STRAT_BUDGET)
        .drop("__rk")
    )


def _maybe_compact_topk_cands(spark: SparkSession, cands_dir: str) -> None:
    """The C32 fold-and-replace with a rank-cut fold: when uncovered
    deltas cross the cadence knob, fold them into base/upto=<max>
    (write-before-delete; the reader prefers the newest base and
    ignores covered deltas)."""
    import glob as _glob
    import shutil as _shutil

    srcs, _ = _count_delta_sources(cands_dir)
    deltas = [s for s in srcs if f"{os.sep}deltas{os.sep}" in s]
    if len(deltas) < _AUTO_COMPACT_EVERY:
        return
    covered = max(int(d.rsplit("=", 1)[1]) for d in deltas)
    folded = _fold_strat_cands(spark, cands_dir).localCheckpoint(eager=True)
    folded.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(cands_dir, "base", f"upto={covered}")
    )
    for d in _glob.glob(os.path.join(cands_dir, "deltas", "batch=*")):
        if int(d.rsplit("=", 1)[1]) <= covered:
            _shutil.rmtree(d, ignore_errors=True)
    for b in _glob.glob(os.path.join(cands_dir, "base", "upto=*")):
        if int(b.rsplit("=", 1)[1]) < covered:
            _shutil.rmtree(b, ignore_errors=True)


def stratified_sample_stream(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
):
    """C45 driver: document shards -> count + bounded-candidate logs."""
    stream = read_document_stream(spark, src_dir, max_files_per_trigger=1)
    return (
        stream.writeStream.foreachBatch(foreach_batch_stratified(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_stream_stratified_sample(
    spark: SparkSession, out_dir: str
) -> DataFrame:
    """The C45 read path: folded counts -> allocations, folded
    candidates -> ranks, cut through the SAME stratified_cut kernel as
    B142."""
    from pyspark.sql import Window as W

    from near_indexer_for_explorer_spark.operators.corpus import (
        stratified_allocations,
        stratified_cut,
    )

    counts = (
        _read_delta_log(spark, os.path.join(out_dir, "counts"), STRAT_COUNT_SCHEMA)
        .groupBy("source")
        .agg(F.sum("n_source").cast("long").alias("n_source"))
    )
    w = W.partitionBy("source").orderBy(
        F.col("skey").asc(), F.col("doc_id").asc()
    )
    ranked = (
        _fold_strat_cands(spark, os.path.join(out_dir, "cands"))
        .withColumn("stratum_rank", F.row_number().over(w).cast("long"))
        .select("doc_id", "source", "stratum_rank")
    )
    return stratified_cut(ranked, stratified_allocations(counts))


# ---------------------------------------------------------------------------
# C46: streaming access-keys state maintenance — A126 kept LIVE as the
# action log streams in, which is exactly what the reference's adapter
# IS: a per-block guarded upsert into the access_keys current-state
# table (database/src/adapters/access_keys.rs — AccessKeyUpdate
# upserts, AccessKeyDeletion marks deleted_by, last_update_block_height
# guards every write so out-of-order/replayed work cannot regress
# state).  The state algebra here is the cleanest of the delta-log
# families: the last-writer-wins fold is a per-key MAX SEMILATTICE
# (max add event, max delete event, struct-argmax permission) —
# commutative, idempotent, associative — so each micro-batch writes
# its per-key PARTIAL to a batch-id-keyed delta and the read path (and
# the C32 fold-and-replace compaction with agg_fn="max") merges
# partials with the SAME max expressions.  Idempotence means replay
# ghosts merge away even before the prune; out-of-order batches (a
# later file carrying EARLIER event_ids) are absorbed by the max fold
# — the streaming form of the reference's block-height guard.
# ---------------------------------------------------------------------------
ACCESS_KEYS_DELTA_SCHEMA = (
    "account_id string, public_key string, last_add long, last_del long, "
    "addrec struct<event_id: long, ak_permission_kind: string>"
)
_ACCESS_KEYS_COLS = {
    "last_add": "long",
    "last_del": "long",
    "addrec": "struct<event_id: long, ak_permission_kind: string>",
}


def foreach_batch_access_keys(out_dir: str) -> Callable[[DataFrame, int], None]:
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from near_indexer_for_explorer_spark.operators.assets import (
            access_keys_partial,
            access_keys_rows,
            parse_typed_actions,
            synthesize_actions_from,
        )

        spark = batch_df.sparkSession
        typed = parse_typed_actions(
            synthesize_actions_from(
                batch_df.select("event_id", "user_id", "value")
            )
        )
        access_keys_partial(access_keys_rows(typed)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "deltas", f"batch={batch_id}"))
        _maybe_auto_compact(
            spark, out_dir, ["account_id", "public_key"],
            _ACCESS_KEYS_COLS, agg_fn="max",
        )

    return sink


def access_keys_stream(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
):
    """C46 driver: event shards -> typed action log -> per-key
    max-partial deltas."""
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    return (
        stream.writeStream.foreachBatch(foreach_batch_access_keys(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_stream_access_keys(spark: SparkSession, out_dir: str) -> DataFrame:
    """The C46 read path: merge the per-batch partials with the same
    max fold, then finalize through the IDENTICAL projection as A126
    — stream == batch is a kernel invariant."""
    from near_indexer_for_explorer_spark.operators.assets import (
        access_keys_finalize,
        access_keys_merge,
    )

    partials = _read_delta_log(spark, out_dir, ACCESS_KEYS_DELTA_SCHEMA)
    return access_keys_finalize(access_keys_merge(partials))


# ---------------------------------------------------------------------------
# C47: streaming account-balances state maintenance — A132 kept LIVE
# as account changes stream in (the reference's adapter shape: a
# per-block guarded upsert into the accounts state, with
# last_update_block_height absorbing out-of-order work,
# database/src/adapters/accounts.rs).  Same delta-log algebra as C46:
# the balances fold is a per-account MAX SEMILATTICE (the arg-max
# struct leads with event_id, so struct-max IS last-writer-wins) —
# each micro-batch writes its per-account partial to a batch-id-keyed
# delta; the read path and the C32 fold-and-replace compaction
# (agg_fn="max") merge partials with the same max expression.
# Idempotent + commutative: replay ghosts merge away, id-sliced
# out-of-order batches are absorbed.
# ---------------------------------------------------------------------------
_BALANCES_LATEST_TYPE = (
    "struct<event_id: bigint, nonstaked: bigint, "
    "staked: bigint, storage_usage: bigint, is_deletion: boolean>"
)
ACCOUNT_BALANCES_DELTA_SCHEMA = (
    f"account_id string, latest {_BALANCES_LATEST_TYPE}"
)
_ACCOUNT_BALANCES_COLS = {"latest": _BALANCES_LATEST_TYPE}


def foreach_batch_account_balances(
    out_dir: str,
) -> Callable[[DataFrame, int], None]:
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from near_indexer_for_explorer_spark.operators.assets import (
            account_balances_partial,
            account_changes_rows,
        )

        spark = batch_df.sparkSession
        ch = account_changes_rows(batch_df)
        account_balances_partial(ch).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "deltas", f"batch={batch_id}"))
        _maybe_auto_compact(
            spark, out_dir, ["account_id"], _ACCOUNT_BALANCES_COLS,
            agg_fn="max",
        )

    return sink


def account_balances_stream(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
):
    """C47 driver: event shards -> typed account changes -> per-account
    max-partial deltas."""
    stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
    return (
        stream.writeStream.foreachBatch(foreach_batch_account_balances(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_stream_account_balances(spark: SparkSession, out_dir: str) -> DataFrame:
    """The C47 read path: merge the per-batch partials with the same
    max fold, then finalize through the IDENTICAL projection as A132
    — stream == batch is a kernel invariant."""
    from near_indexer_for_explorer_spark.operators.assets import (
        account_balances_finalize,
        account_balances_merge,
    )

    partials = _read_delta_log(spark, out_dir, ACCOUNT_BALANCES_DELTA_SCHEMA)
    return account_balances_finalize(account_balances_merge(partials))
