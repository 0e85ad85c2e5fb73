"""Size-gated broadcasting for vocabulary-keyed dimension relations.

Several operators join a token-exploded fact against a VOCABULARY-sized
dim (document frequencies, unigram LM counts, bigram marginals, PMI
margins).  At test scale those dims are a few thousand rows and a
broadcast hash join is the right plan; at 100 TB a word-level
vocabulary is tens of millions of types (Heaps' law: V ~ K * N^beta,
K~30-90, beta~0.4-0.6 over token count N), and an unconditional
``F.broadcast`` hint would force a multi-GB relation onto every
executor — past the ~10 MB dim discipline this repo documents
(SURVEY.md section 4) and past what the driver can assemble.

The gate (r8 verdict "What's wrong #1") follows the
``build_sized_bloom`` / ``table_footer_rows`` precedent: decide the
join strategy from CATALOG metadata, never a data scan, and keep the
decision per-plan so both branches are plan-tested.

The proxy is the documents-table rowcount from the parquet footer.
Registered queries must stay lazy at plan-build time (only the replay
twins may run jobs), so counting distinct tokens is not an option; the
footer rowcount is free, monotone in the vocabulary, and conservative:
at the threshold (200k docs, ~2e8 tokens at ~1k tokens/doc) Heaps puts
the vocabulary near ~0.5M types — a hashed relation in the tens of MB,
the upper edge of a comfortable executor-wide broadcast.  Above it the
dim joins as a plain shuffle equi-join on the token key, which is
exactly as correct and keyed on the same column the fact is already
exploded by.

Tests monkeypatch ``VOCAB_BROADCAST_MAX_DOCS`` to 0 to pin the
shuffle branch (the ``EXACT_MAX_ROWS`` percentile-gate pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from near_indexer_for_explorer_spark.functions.percentiles import (
    table_footer_rows,
)

VOCAB_BROADCAST_MAX_DOCS = 200_000


def vocab_dims_fit(sf_dir: str) -> bool:
    """True when vocabulary-keyed dims derived from this corpus are
    safely broadcastable.  Reads the module knob at call time so tests
    can monkeypatch it; callers decide ONCE per query so every dim in
    one plan takes the same branch."""
    return table_footer_rows(sf_dir, "documents") <= VOCAB_BROADCAST_MAX_DOCS


def dim_join(dim: DataFrame, fits: bool) -> DataFrame:
    """The dim wrapped for joining: broadcast-hinted under the gate,
    bare (planner picks the shuffle equi-join) above it."""
    return F.broadcast(dim) if fits else dim
