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
                "batch_id": p.batchId,
                "num_input_rows": n,
                "duration_ms": p.durationMs.get("triggerExecution"),
                "state_rows_dropped": dropped,
                # default "" so consumers comparing watermarks across
                # batches (lexicographic on the ISO string) never hit a
                # None < str TypeError on pre-watermark batches
                "watermark": p.eventTime.get("watermark", "") or "",
                "state_rows_total": sum(
                    (op.numRowsTotal or 0) for op in p.stateOperators
                ),
            }
        )

    def onQueryTerminated(self, event) -> None:
        self.terminated.add(event.id)

    def onQueryIdle(self, event) -> None:  # pragma: no cover - optional hook
        pass
