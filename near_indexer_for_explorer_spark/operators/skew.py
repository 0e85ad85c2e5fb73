"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; salting is the explicit tool for the pathological case AQE
can't fix — a broadcast-ineligible build side whose single hot key
overwhelms one task.  Reference analog: a handful of mega-contracts
(exchange accounts) dominate receipts per receiver, the classic
blockchain hot-key distribution.

``salted_join`` replicates the right side SALT_N ways and scatters the
left side deterministically (hash-derived, not random — results must be
reproducible), so the hot key's rows spread over SALT_N tasks.  Results
are provably identical to the plain join (tests/test_operators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_N = 8


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt_n: int = DEFAULT_SALT_N,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the key salted SALT_N ways.

    left rows get salt = pmod(hash(all left columns), n) — deterministic
    but well-scattered; right rows are replicated once per salt value.
    The shuffle key becomes (key, salt), splitting any hot key across
    salt_n partitions at the cost of salt_n x the (small) right side.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt_n))
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    joined = l_salted.join(
        r_salted,
        (F.col(f"{left_key}") == F.col(f"{right_key}"))
        & (l_salted["__salt"] == r_salted["__salt"]),
        how,
    )
    return joined.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    agg_exprs: "dict[str, tuple[str, str]]",
    salt_n: int = DEFAULT_SALT_N,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``agg_exprs`` maps output column -> (input column, fn) with fn in
    {"sum", "count", "min", "max"}.  Phase 1 aggregates on
    (key, salt) — spreading a hot key over salt_n reducers — phase 2
    combines partials on the key alone (counts re-combine with sum).

    Note: Spark's hash aggregate already does map-side partial
    aggregation, which covers most skew; explicit salting is for
    exactly-once-per-key stages downstream of a skewed shuffle (e.g.
    collect_list-style aggregations with no partial form).
    """
    combiner = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_n))
    phase1 = df.withColumn("__salt", salt).groupBy(*key_cols, "__salt").agg(
        *[
            combiner[fn](F.col(src)).alias(f"__p_{out}")
            for out, (src, fn) in agg_exprs.items()
        ]
    )
    return phase1.groupBy(*key_cols).agg(
        *[
            recombine[fn](F.col(f"__p_{out}")).alias(out)
            for out, (src, fn) in agg_exprs.items()
        ]
    )
