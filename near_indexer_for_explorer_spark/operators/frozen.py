"""Session-scoped frozen-artifact memo (the serve-twin machinery).

Expensive deterministic training/index legs (ANN codebooks, the
MinHash/LSH candidate relation) are built once per (name, sf_dir,
SparkSession) and eagerly localCheckpoint'd; every later consumer
plans against the frozen relations.  Because the builds are fully
deterministic, results composed from frozen legs are bit-identical
to recomputing them, so the composed queries' DuckDB oracles remain
valid verbatim.

Production shape at 100 TB: these artifacts are written once to the
lake (parquet) and served many times; the in-session memo is the
local[*] stand-in for that persisted-artifact read, sized by the
artifact (signatures/codebooks), never by the corpus.

Contract: the data under ``sf_dir`` is immutable within a session —
a rewrite mid-session would serve results from a stale frozen
artifact.  Entries belonging to a dead SparkSession (applicationId
no longer active) are evicted on the next call so a long-lived
process that restarts its session doesn't pin dead checkpoint
blocks forever.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_FROZEN: dict[tuple[str, str, str], tuple[DataFrame, ...]] = {}


def frozen(
    name: str,
    spark: SparkSession,
    sf_dir: str,
    build: Callable[[], tuple[DataFrame, ...]],
) -> tuple[DataFrame, ...]:
    """Return the memoized eagerly-checkpointed artifact tuple for
    (name, sf_dir) in the active session, building it on first use."""
    app_id = spark.sparkContext.applicationId
    for k in [k for k in _FROZEN if k[2] != app_id]:
        del _FROZEN[k]
    key = (name, sf_dir, app_id)
    if key not in _FROZEN:
        _FROZEN[key] = tuple(df.localCheckpoint(eager=True) for df in build())
    return _FROZEN[key]


def persist_artifacts(dfs: tuple[DataFrame, ...], path: str) -> None:
    """Write a frozen-artifact tuple to the lake — the production form
    of the in-session memo (the module docstring's 'written once,
    served many times').  Plain parquet, one subdirectory per tuple
    member: artifacts are small relational outputs (signatures,
    candidate pairs, codebooks), so an overwrite per member is the
    whole protocol."""
    import os

    for i, df in enumerate(dfs):
        df.write.mode("overwrite").parquet(os.path.join(path, f"part{i}"))


def load_artifacts(
    name: str, spark: SparkSession, sf_dir: str, path: str, arity: int
) -> tuple[DataFrame, ...]:
    """Register a persisted artifact tuple under the session memo key,
    so every consumer that calls frozen(name, ...) serves from the
    DISK artifact instead of rebuilding.  Returns the registered
    tuple.

    Because builds are deterministic, a reloaded artifact is
    bit-identical to a rebuilt one — pinned by
    tests/test_operators.py::test_frozen_artifact_roundtrip — so
    composed queries and their oracles are unaffected by WHERE the
    artifact came from."""
    import os

    app_id = spark.sparkContext.applicationId
    key = (name, sf_dir, app_id)
    _FROZEN[key] = tuple(
        spark.read.parquet(os.path.join(path, f"part{i}")).localCheckpoint(
            eager=True
        )
        for i in range(arity)
    )
    return _FROZEN[key]
