"""Streaming observability (reference analog: indexer/src/metrics.rs —
prometheus counters for blocks/receipts processed and lag).

Spark's StreamingQueryListener carries the same signals: rows per
batch, batch duration, input vs processing rate.  ``MetricsListener``
accumulates them in-process; a production deployment would forward
them to its metrics backend from the same callbacks.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    """Accumulates per-query progress counters (the reference's
    BLOCKS_PROCESSED_TOTAL / LATEST_BLOCK_HEIGHT analog)."""

    def __init__(self) -> None:
        self.batches: list[dict] = []
        self.rows_total = 0
        self.state_rows_dropped_total = 0
        self.started: set[str] = set()
        self.terminated: set[str] = set()

    def onQueryStarted(self, event) -> None:
        self.started.add(event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        n = p.numInputRows
        self.rows_total += n
        # first source's description identifies the ingest path (the
        # reference's per-stream gauge label); file sources render as
        # FileStreamSource[path]
        src = p.sources[0].description if p.sources else ""
        # watermark/lateness observability (the reference's lag counters,
        # metrics.rs): numRowsDroppedByWatermark populates for
        # stream-stream joins and state eviction; aggregation/dedup
        # pre-filter late rows WITHOUT that counter, so the listener
        # also records each batch's watermark and state totals — input
        # rows minus state admissions under a progressed watermark IS
        # the late-arrival signal a lag dashboard alerts on.
        dropped = sum(
            (op.numRowsDroppedByWatermark or 0) for op in p.stateOperators
        )
        self.state_rows_dropped_total += dropped
        self.batches.append(
            {
                "query_id": str(p.id),
                "source": src,
                "batch_id": p.batchId,
                "num_input_rows": n,
                "duration_ms": p.durationMs.get("triggerExecution"),
                "state_rows_dropped": dropped,
                # default "" so consumers comparing watermarks across
                # batches (lexicographic on the ISO string) never hit a
                # None < str TypeError on pre-watermark batches
                "watermark": p.eventTime.get("watermark", "") or "",
                # max observed event time this batch (populated for
                # watermarked queries) — the "latest ingested event ts"
                # gauge; lexicographic max on the ISO string is
                # chronological
                "event_time_max": p.eventTime.get("max", "") or "",
                "state_rows_total": sum(
                    (op.numRowsTotal or 0) for op in p.stateOperators
                ),
            }
        )

    def onQueryTerminated(self, event) -> None:
        self.terminated.add(event.id)

    def onQueryIdle(self, event) -> None:  # pragma: no cover - optional hook
        pass


HEALTH_SCHEMA = (
    "query_id string, source string, n_batches long, rows_total long, "
    "latest_batch_id long, last_batch_rows long, latest_event_ts string, "
    "latest_watermark string, watermark_lag_batches long, "
    "avg_batch_duration_ms double, state_rows_dropped_total long, "
    "state_rows_total long, is_active boolean"
)


def health_relation(spark, listener: MetricsListener):
    """The QUERYABLE pipeline-health table over a listener's
    accumulated progress — the reference's metrics.rs gauge surface
    (LATEST_BLOCK_HEIGHT / BLOCKS_PROCESSED_TOTAL / lag) as ONE
    dimension-sized relation an operator can join, alert on, or
    register as a SQL view (``register_health_view``).

    One row per (query_id, source): batch/row totals, the latest
    ingested event ts and watermark (the lag pair — a watermark that
    stops advancing while event ts grows IS the alert), how many
    trailing batches the watermark has failed to advance for, mean
    batch duration, watermark-dropped and state-row totals, and
    whether the query is still active.

    Scale note: listener progress is ops metadata (one dict per
    micro-batch); building the relation from the driver-side list is
    the metrics-scrape path, not a data path."""
    rows = []
    by_key: dict[tuple[str, str], list[dict]] = {}
    for b in listener.batches:
        by_key.setdefault((b["query_id"], b["source"]), []).append(b)
    for (qid, src), bs in by_key.items():
        bs = sorted(bs, key=lambda b: b["batch_id"])
        last = bs[-1]
        wm = max(b["watermark"] for b in bs)
        # batches since the watermark last advanced (0 = it advanced
        # on the latest batch): the staleness half of the lag signal;
        # 0 for non-watermarked queries (no lag concept)
        if wm:
            stale = 0
            for b in reversed(bs):
                if b["watermark"] < wm:
                    break
                stale += 1
            lag = stale - 1
        else:
            lag = 0
        durations = [b["duration_ms"] for b in bs if b["duration_ms"] is not None]
        rows.append(
            {
                "query_id": qid,
                "source": src,
                "n_batches": len(bs),
                "rows_total": sum(b["num_input_rows"] for b in bs),
                "latest_batch_id": last["batch_id"],
                "last_batch_rows": last["num_input_rows"],
                "latest_event_ts": max(b["event_time_max"] for b in bs),
                "latest_watermark": wm,
                "watermark_lag_batches": lag,
                "avg_batch_duration_ms": (
                    sum(durations) / len(durations) if durations else None
                ),
                "state_rows_dropped_total": sum(
                    b["state_rows_dropped"] for b in bs
                ),
                "state_rows_total": last["state_rows_total"],
                "is_active": qid in {str(i) for i in listener.started}
                and qid not in {str(i) for i in listener.terminated},
            }
        )
    return spark.createDataFrame(rows, HEALTH_SCHEMA)


def register_health_view(
    spark, listener: MetricsListener, name: str = "pipeline_health"
):
    """Expose the health relation as a temp view so dashboards can
    ``SELECT ... FROM pipeline_health`` (re-register to refresh the
    snapshot)."""
    df = health_relation(spark, listener)
    df.createOrReplaceTempView(name)
    return df
