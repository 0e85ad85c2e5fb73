"""Vector math over array<float> embedding columns — built-in
higher-order functions only (zip_with/aggregate run in the JVM; no
Python round-trip per row).

Floats are widened to double before any arithmetic; the fold is
sequential left-to-right, and consumers round final similarities to 6
decimals so the DuckDB oracle (which may associate sums differently)
lands on the same double.

Each helper has two forms:

- the ``*_sql`` form takes SQL-text fragments and returns SQL text —
  the construction-cost path (r15, guide section 5: the driver is a
  resource).  A ``F.transform``/``F.zip_with``/``F.aggregate`` call
  with a PYTHON lambda costs ~56-70 ms of py4j round-trips building
  the unresolved lambda (measured; one round-trip per gateway
  command), and operators compose these fragments in per-subspace /
  per-iteration loops, so plan CONSTRUCTION dominated several bench
  rows.  One ``F.expr`` over the composed text is a single round-trip
  (~0.5 ms) and parses to the IDENTICAL analyzed expression — same
  zip_with/aggregate tree, same ``0.0D`` double zero, same
  left-to-right fold — so every sum and pick is bit-identical.
- the Column form wraps the ``*_sql`` form for callers that hold a
  plain column NAME; callers composing larger expressions should
  compose the SQL text and pay one ``F.expr`` at the top.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array_sql(c: str) -> str:
    return f"transform({c}, x -> CAST(x AS DOUBLE))"


def dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, "
        f"(acc, x) -> acc + x)"
    )


def l2_norm_sql(a: str) -> str:
    return (
        f"SQRT(aggregate(transform({a}, x -> x * x), 0.0D, "
        f"(acc, x) -> acc + x))"
    )


def cosine_sql(a: str, b: str, a_norm: str, b_norm: str) -> str:
    # NOTE: the fold-based dot measurably beats an unrolled
    # a[0]*b[0]+...+a[63]*b[63] expression (2.5x at 500k pairs):
    # GetArrayItem codegen pays a per-element null check + branch the
    # tight fold loop doesn't.  Keep the HOF form.
    return f"({dot_sql(a, b)} / ({a_norm} * {b_norm}))"


def as_double_array(c: str) -> Column:
    return F.expr(as_double_array_sql(c))


def dot(a: str, b: str) -> Column:
    return F.expr(dot_sql(a, b))


def l2_norm(a: str) -> Column:
    return F.expr(l2_norm_sql(a))


def cosine(a: str, b: str, a_norm: str, b_norm: str) -> Column:
    return F.expr(cosine_sql(a, b, a_norm, b_norm))
