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
local[*] stand-in for that persisted-artifact read.  Most artifacts
are sized by the MODEL (signatures/codebooks); four are CORPUS-GRAIN
skinny relations (frozen quality metrics, B20 component labels, B3
verified pairs, IVF list assignments — a handful of narrow columns
per document/vector, the same relations a deployment would persist to
the lake).  localCheckpoint stores them MEMORY_AND_DISK, so an
artifact that outgrows executor storage spills rather than OOMs; at
true 100 TB scale the persist_artifacts/load_artifacts path below is
the intended home for the corpus-grain four, with the memo holding
only the parquet-backed reads.

Contract: the data under ``sf_dir`` is immutable within a session —
a rewrite mid-session would serve results from a stale frozen
artifact.  Entries belonging to a dead SparkSession (applicationId
no longer active) are evicted on the next call so a long-lived
process that restarts its session doesn't pin dead checkpoint
blocks forever.

Persisted artifacts carry a MANIFEST (name, sf_dir, arity, member
schemas) written beside the parts; ``load_artifacts`` validates it
before registering, so a mismatched or stale directory fails loudly
instead of silently poisoning every ``frozen(name, ...)`` consumer
in the session (r7 advice).
"""

from __future__ import annotations

import json
import os
import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_FROZEN: dict[tuple[str, str, str], tuple[DataFrame, ...]] = {}

# Serializes memo reads-with-build: concurrent driver threads (guide
# section 2.6 job overlap — the parity suite runs queries through a
# thread pool) must not race the eviction scan or double-build one
# artifact.  Builds are one-time per session, so holding the lock
# across a build costs nothing steady-state.
_FROZEN_LOCK = threading.Lock()

_MANIFEST = "manifest.json"


def frozen(
    name: str,
    spark: SparkSession,
    sf_dir: str,
    build: Callable[[], tuple[DataFrame, ...]],
) -> tuple[DataFrame, ...]:
    """Return the memoized eagerly-checkpointed artifact tuple for
    (name, sf_dir) in the active session, building it on first use."""
    app_id = spark.sparkContext.applicationId
    with _FROZEN_LOCK:
        for k in [k for k in _FROZEN if k[2] != app_id]:
            del _FROZEN[k]
        key = (name, sf_dir, app_id)
        if key not in _FROZEN:
            _FROZEN[key] = tuple(
                df.localCheckpoint(eager=True) for df in build()
            )
        return _FROZEN[key]


def persist_artifacts(
    dfs: tuple[DataFrame, ...],
    path: str,
    name: str = "",
    sf_dir: str = "",
) -> None:
    """Write a frozen-artifact tuple to the lake — the production form
    of the in-session memo (the module docstring's 'written once,
    served many times').  Plain parquet, one subdirectory per tuple
    member, plus a provenance manifest: artifacts are small relational
    outputs (signatures, candidate pairs, codebooks), so an overwrite
    per member is the whole protocol."""
    for i, df in enumerate(dfs):
        df.write.mode("overwrite").parquet(os.path.join(path, f"part{i}"))
    manifest = {
        "name": name,
        "sf_dir": sf_dir,
        "arity": len(dfs),
        "schemas": [df.schema.jsonValue() for df in dfs],
    }
    with open(os.path.join(path, _MANIFEST), "w") as fh:
        json.dump(manifest, fh)


def load_artifacts(
    name: str, spark: SparkSession, sf_dir: str, path: str, arity: int
) -> tuple[DataFrame, ...]:
    """Register a persisted artifact tuple under the session memo key,
    so every consumer that calls frozen(name, ...) serves from the
    DISK artifact instead of rebuilding.  Returns the registered
    tuple.

    The directory's manifest must agree on (name, sf_dir, arity) —
    a mismatch raises instead of registering a poisoned memo entry.
    A manifest-less directory (pre-manifest writer, or hand-assembled
    parts) is accepted for compatibility but still arity-checked
    against the part directories on disk.

    Because builds are deterministic, a reloaded artifact is
    bit-identical to a rebuilt one — pinned by
    tests/test_operators.py::test_frozen_artifact_roundtrip — so
    composed queries and their oracles are unaffected by WHERE the
    artifact came from."""
    mpath = os.path.join(path, _MANIFEST)
    if os.path.exists(mpath):
        with open(mpath) as fh:
            manifest = json.load(fh)
        for field, want in (("name", name), ("sf_dir", sf_dir), ("arity", arity)):
            got = manifest.get(field)
            # a writer that didn't stamp provenance leaves "" — only a
            # CONFLICTING stamp is a poisoning hazard
            if got not in ("", None) and got != want:
                raise ValueError(
                    f"frozen artifact at {path}: manifest {field}={got!r} "
                    f"does not match requested {want!r}"
                )
    else:
        on_disk = sum(
            os.path.isdir(os.path.join(path, f"part{i}")) for i in range(arity)
        )
        if on_disk != arity:
            raise ValueError(
                f"frozen artifact at {path}: expected {arity} part dirs, "
                f"found {on_disk} (and no manifest)"
            )
    app_id = spark.sparkContext.applicationId
    key = (name, sf_dir, app_id)
    _FROZEN[key] = tuple(
        spark.read.parquet(os.path.join(path, f"part{i}")).localCheckpoint(
            eager=True
        )
        for i in range(arity)
    )
    return _FROZEN[key]
