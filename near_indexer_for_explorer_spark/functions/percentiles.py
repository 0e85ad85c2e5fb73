"""Size-gated percentile aggregation (the r7 verdict's weak-row fix).

Spark's exact ``percentile`` buffers every value of a group on one
reducer — correct and cheap at grain-bounded test SFs, but a
scale-killer when one group can hold billions of rows.  The gate
mirrors the bloom broadcast gate in operators/corpus.py
(``_BLOOM_BROADCAST_MAX_BITS``): a STATIC row-count threshold compared
against a scan-free estimate (parquet footer metadata read
driver-side — zero Spark jobs, the same number a lake catalog serves
from table statistics at 100 TB).  At or under the threshold the plan
aggregates with exact interpolated ``percentile`` — the value the
DuckDB oracles compute; above it the SAME call sites plan
``percentile_approx`` (Greenwald-Khanna sketch: fixed-size partials,
map-side combinable, one ordinary shuffle) whose rank-error bound is
the contract pinned by ``approx_percentiles_contract`` (A61) and by
tests/test_percentile_gate.py's forced-approx leg.

The gate keys on the SOURCE FACT's footer row count — an upper bound
for every derived grain fed to the aggregate (latencies per order,
sessions per user), so the flip to the sketch can only happen early,
never late.

Reference analog: the explorer serves latency/dashboard percentiles
from PostgreSQL aggregates sized to its row counts (database/
migrations/2020-12-07-153402_initial_schema/up.sql); re-expressed for
Spark the same query must pick its physical aggregate by input size.
"""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

# One reducer buffering 50M doubles is ~400 MB of raw values plus
# aggregation-buffer overhead — past the edge of a comfortable
# executor heap, so the sketch path takes over there.  Tests
# monkeypatch this to 0 to pin the approx branch.
EXACT_MAX_ROWS = 50_000_000

# Same accuracy knob as A61 (_APPROX_PCT_ACC): true rank of the
# sketch's answer is within max(1, n/accuracy) positions of p*n.
APPROX_ACCURACY = 1000

_footer_rows_cache: dict[str, int] = {}


def table_footer_rows(sf_dir: str, table: str) -> int:
    """Row count from parquet footer metadata — no Spark job.

    Works for a single file or a part-file directory; memoized per
    path.  On a real lake the identical number comes from catalog
    table statistics; the point is the gate costs no data scan.
    """
    path = os.path.join(sf_dir, f"{table}.parquet")
    cached = _footer_rows_cache.get(path)
    if cached is None:
        import pyarrow.dataset as ds

        cached = int(ds.dataset(path, format="parquet").count_rows())
        _footer_rows_cache[path] = cached
    return cached


def exact_percentiles_fit(sf_dir: str, *tables: str) -> bool:
    """True when every named source fact is under the exact-path bound.

    Reads ``EXACT_MAX_ROWS`` at call time so a test (or an operator
    wanting to force the scale path) can override the module knob.
    """
    return all(
        table_footer_rows(sf_dir, t) <= EXACT_MAX_ROWS for t in tables
    )


def gated_percentile(value, frac: float, exact: bool) -> Column:
    """Exact interpolated percentile under the gate, GK sketch above.

    Callers decide ``exact`` ONCE per query via
    :func:`exact_percentiles_fit` so every percentile in one plan
    takes the same branch (mixed branches would interleave
    interpolated and data-value answers in one row).
    """
    if exact:
        return F.percentile(value, F.lit(frac))
    return F.percentile_approx(value, F.lit(frac), F.lit(APPROX_ACCURACY))


def gated_percentiles(value, fracs: list[float], exact: bool) -> Column:
    """All requested percentiles from ONE aggregation buffer.

    ``percentile(col, array(...))`` evaluates every fraction against a
    single buffered multiset (and ``percentile_approx`` against a
    single GK sketch) — N separate ``gated_percentile`` calls in one
    agg each buffer the group's values independently, so a 9-decile
    boundary fit costs 9x the memory and sort work for bit-identical
    answers.  Returns an array column; callers project elements with
    ``element_at`` (1-indexed)."""
    arr = F.array(*[F.lit(f) for f in fracs])
    if exact:
        return F.percentile(value, arr)
    return F.percentile_approx(value, arr, F.lit(APPROX_ACCURACY))
