"""Numeric helpers for cross-engine bit-stable aggregation.

Floating-point SUM is order-dependent; a Spark plan and the DuckDB
oracle will sum partitions in different orders and disagree in the last
ulps.  The engine therefore aggregates money/quantity measures on tight
DECIMAL casts (exact, order-independent, no precision-loss truncation in
either engine) and casts the exact result back to double at the end —
both engines then round the *same exact decimal* to the *same* double.

Precisions are deliberately tight (money 12,2; rates 7,4) so chained
decimal multiplies stay within precision 38 and are exact in BOTH
engines (Spark truncates scale above 38; DuckDB errors — neither is hit).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"
RATE = "decimal(7,4)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dec_money(c: Column | str) -> Column:
    """Cast a price/quantity double to exact decimal(12,2)."""
    return _col(c).cast(MONEY)


def dec_rate(c: Column | str) -> Column:
    """Cast a discount/tax-style rate to exact decimal(7,4)."""
    return _col(c).cast(RATE)


def dsum(c: Column, alias: str) -> Column:
    """Exact decimal SUM, returned as double (order-independent)."""
    return F.sum(c).cast("double").alias(alias)


def dsum_money(c: Column | str, alias: str) -> Column:
    return dsum(dec_money(c), alias)


def epoch_seconds(c: Column | str) -> Column:
    """Timestamp -> fractional epoch seconds as double (keeps micros;
    matches DuckDB's epoch_us()/1e6).  Parquet timestamps load as
    TIMESTAMP_NTZ which has no direct double cast; hopping through
    TIMESTAMP_LTZ is exact because the session timezone is UTC."""
    return _col(c).cast("timestamp_ltz").cast("double")
