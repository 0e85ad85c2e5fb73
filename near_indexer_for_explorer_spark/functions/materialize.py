"""Size-gated lazy materialization for multi-referenced relations.

``localCheckpoint(eager=False)`` on a relation referenced N times in
one plan trades N subtree re-evaluations for one materialize + N
re-reads.  That trade is unambiguously right when the subtree re-scans
a large fact (the 100 TB shape), and measurably WRONG when the whole
subtree is a sub-second recompute: the materialization round-trip
(block manager write + N reads + the checkpoint's plan barrier) costs
more than it saves.  r14 added the checkpoints unconditionally and the
r14 driver pass regressed the three linearized queries 0.43-0.65x;
the r15 interleaved A/B (tools/ab_ckpt.py, medians of alternating
same-session runs) confirmed a consistent ~7-8 pct loss at sf0.1:

    parts_abc_pareto         ckpt 2.698 s  vs  recompute 2.512 s
    orders_basket_rules      ckpt 3.010 s  vs  recompute 2.713 s
    embedding_top_component  ckpt 4.628 s  vs  recompute 4.276 s

The gate mirrors ``functions/percentiles.py`` (the repo's established
size-gate pattern): a STATIC row-count threshold compared against the
source fact's parquet footer count — zero Spark jobs driver-side, the
same number a lake catalog serves from table statistics at scale.
Below the threshold the relation is returned as-is (recompute);
at or above it the lazy checkpoint is planted (materialize).  Tests
pin BOTH branches (tests/test_percentile_gate.py pattern): values are
branch-independent because a checkpoint never changes results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from near_indexer_for_explorer_spark.functions.percentiles import (
    table_footer_rows,
)

# Threshold rationale: the gated subtrees are one scan + one or two
# exchanges over the source fact.  At ~5M source rows such a subtree
# re-evaluates in roughly the time the materialization round-trip
# costs on commodity executors; past it, recompute loses linearly
# while the checkpointed relations here stay small (grouped/derived
# grains), so flipping early is safe.  Tests monkeypatch this to 0 to
# pin the materialize branch.
MATERIALIZE_MIN_ROWS = 5_000_000


def gated_lazy_ckpt(df: DataFrame, sf_dir: str, *tables: str) -> DataFrame:
    """Lazy localCheckpoint iff any source fact is at/above the bound.

    Reads ``MATERIALIZE_MIN_ROWS`` at call time so tests (or an
    operator forcing the scale path) can override the module knob.
    """
    if all(
        table_footer_rows(sf_dir, t) < MATERIALIZE_MIN_ROWS for t in tables
    ):
        return df
    return df.localCheckpoint(eager=False)
