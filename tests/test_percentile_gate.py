"""Size-gated percentile machinery (functions/percentiles.py).

Pins BOTH branches of the gate for the six percentile queries the r7
verdict flagged as scale-weak (A51, A56, A80, A94, A106, A108):

* default gate at test SF -> the plan aggregates with EXACT
  interpolated ``percentile`` (so every oracle stays valid verbatim);
* gate forced shut (``EXACT_MAX_ROWS = 0``) -> the SAME call sites
  plan ``percentile_approx`` and still execute, and the sketch's
  answer honors the A61 rank-error contract
  (|rank(approx) - p*n| <= max(1, n/accuracy) + 1).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from near_indexer_for_explorer_spark.functions import percentiles as P
from near_indexer_for_explorer_spark.plans import relational as R
from near_indexer_for_explorer_spark.sources.tables import load_table

GATED = [
    "events_value_percentiles",
    "events_value_equidepth",
    "events_funnel_latency",
    "order_ship_latency",
    "weekly_amount_drift",
    "session_duration_stats",
]


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_footer_rows_match_scan(spark, sf_dir):
    footer = P.table_footer_rows(sf_dir, "events")
    assert footer == load_table(spark, sf_dir, "events").count()
    assert footer > 0


@pytest.mark.parametrize("name", GATED)
def test_exact_branch_is_default(spark, sf_dir, name):
    plan = _optimized(R.QUERIES[name](spark, sf_dir))
    assert "percentile(" in plan
    assert "percentile_approx" not in plan


@pytest.mark.parametrize("name", GATED)
def test_approx_branch_plans_and_runs(spark, sf_dir, name, monkeypatch):
    monkeypatch.setattr(P, "EXACT_MAX_ROWS", 0)
    df = R.QUERIES[name](spark, sf_dir)
    plan = _optimized(df)
    assert "percentile_approx" in plan
    # the exact aggregate must be fully swapped out, not mixed in
    # (percentile_approx's own substring contains "percentile_approx(",
    # so strip those before probing for the exact form)
    assert "percentile(" not in plan.replace("percentile_approx", "")
    assert df.count() > 0  # the sketch path executes end-to-end


def test_approx_branch_rank_contract(spark, sf_dir, monkeypatch):
    """A61-style contract on the forced-approx A51: the true rank of
    each sketched percentile sits within max(1, n/accuracy)+1 of p*n
    (the +1 absorbs the boundary <= vs < convention)."""
    monkeypatch.setattr(P, "EXACT_MAX_ROWS", 0)
    got = {
        r["event_type"]: r
        for r in R.QUERIES["events_value_percentiles"](
            spark, sf_dir
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    by_type = {
        r["event_type"]: sorted(x["value"] for x in rows)
        for r, rows in (
            (t, ev.where(F.col("event_type") == t["event_type"]).collect())
            for t in ev.select("event_type").distinct().collect()
        )
    }
    for etype, row in got.items():
        vals = by_type[etype]
        n = len(vals)
        assert row["n_events"] == n
        tol = max(1, math.ceil(n / P.APPROX_ACCURACY)) + 1
        for frac, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            # row[col] is round-6 of an actual data value; its rank is
            # the count of values <= it (nudge for the rounding)
            rank = sum(1 for v in vals if v <= row[col] + 1e-6)
            assert abs(rank - frac * n) <= tol, (etype, col, rank, n)


def test_gate_flips_on_threshold(sf_dir, monkeypatch):
    n = P.table_footer_rows(sf_dir, "events")
    assert P.exact_percentiles_fit(sf_dir, "events")
    monkeypatch.setattr(P, "EXACT_MAX_ROWS", n - 1)
    assert not P.exact_percentiles_fit(sf_dir, "events")
    monkeypatch.setattr(P, "EXACT_MAX_ROWS", n)
    assert P.exact_percentiles_fit(sf_dir, "events")
