"""Engine-portable md5-derived integer hashing, shared by the batch
operators and the streaming pipelines.

Both sides of every oracle gate use the SAME construction: the first 8
hex digits of md5(salt || value) read as a 32-bit integer.  Spark
evaluates it with base-16 conv(); DuckDB (which has no base-16 conv())
evaluates the identical value as a positional digit sum against
power-of-16 literals — exact integer arithmetic, digit for digit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

POWERS8 = [16 ** (7 - i) for i in range(8)]


def md5_u32(col, salt: str, mod: int):
    """First 8 hex digits of md5(salt || value) as a non-negative long,
    reduced mod `mod`.  32 bits fits a long exactly; Spark-side conv()
    and the oracle's positional digit sum agree digit for digit."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % mod


def md5_u32_sql(expr: str, salt: str, mod: int) -> str:
    """DuckDB replica of md5_u32 (no base-16 conv(): positional digit
    sum against power-of-16 literals, exact)."""
    powers = ",".join(str(p) for p in POWERS8)
    h = f"md5('{salt}' || CAST({expr} AS VARCHAR))"
    return (
        "(list_sum(list_transform(range(1,9), i -> "
        f"CAST(strpos('0123456789abcdef', substring({h}, CAST(i AS INTEGER), 1)) - 1 AS BIGINT)"
        f" * ([{powers}])[i])) % {mod})"
    )
