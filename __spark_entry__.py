"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``near_indexer_for_explorer_spark``
package; this module only aggregates the registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from near_indexer_for_explorer_spark.plans.relational import (
    ORACLES as _RELATIONAL_ORACLES,
)
from near_indexer_for_explorer_spark.plans.relational import (
    QUERIES as _RELATIONAL_QUERIES,
)
from near_indexer_for_explorer_spark.session import apply_session_conf

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _with_conf(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """The driver calls query fns with ITS OWN SparkSession; pin the
    session conf the plans rely on (UTC timezone for NTZ->epoch casts)
    before building the plan."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        apply_session_conf(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def _all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(_RELATIONAL_QUERIES)
    try:
        from near_indexer_for_explorer_spark.operators.registry import (
            QUERIES as _OP_QUERIES,
        )

        out.update(_OP_QUERIES)
    except ImportError:
        pass
    return {name: _with_conf(fn) for name, fn in out.items()}


def _all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(_RELATIONAL_ORACLES)
    try:
        from near_indexer_for_explorer_spark.operators.registry import (
            ORACLES as _OP_ORACLES,
        )

        out.update(_OP_ORACLES)
    except ImportError:
        pass
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    apply_session_conf(spark)
    from near_indexer_for_explorer_spark.plans.relational import q1_pricing_summary

    return q1_pricing_summary(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _all_queries()


def oracle_sql() -> dict[str, str]:
    return _all_oracles()
