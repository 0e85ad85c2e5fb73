"""Dtype-contract gate between Spark query schemas and DuckDB oracle
output types.

The driver's correctness gate fetches both sides into pandas and hashes
the stringified values.  DuckDB type quirks can make *value-equal*
results hash differently:

- ``SUM(BIGINT)``/``SUM(INTEGER)`` in DuckDB yields HUGEINT (int128),
  which the pandas fetch renders as float64 -> "498.0" vs Spark's
  int64 "498".  (This exact artifact made ``multimodal_feature_stats``
  and ``dedup_common_spans`` driver-red in round 4 while the in-repo
  ``fetchall()``-based parity — Python ints — stayed green.)
- A DECIMAL with a different scale stringifies with different trailing
  zeros than Spark's decimal.

This test planning-checks every oracle with ``DESCRIBE`` (no execution)
against the Spark DataFrame schema and rejects the hazardous pairings,
so new oracles cannot reintroduce the class.
"""

from __future__ import annotations

import re

import pytest

_INTEGRAL_SPARK = {"tinyint", "smallint", "int", "bigint"}
_INTEGRAL_DUCK = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                  "UTINYINT", "USMALLINT", "UINTEGER"}


def _query_items():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    return [(name, qs[name], oracles[name]) for name in sorted(oracles)]


def _duck_types(duck, sql) -> dict[str, str]:
    rows = duck.execute(f"DESCRIBE {sql}").fetchall()
    # DESCRIBE: (column_name, column_type, null, key, default, extra)
    return {r[0]: r[1] for r in rows}


def _decimal_scale(type_str: str) -> int | None:
    m = re.match(r"decimal\((\d+),\s*(\d+)\)", type_str, re.IGNORECASE)
    return int(m.group(2)) if m else None


@pytest.mark.parametrize(
    "name,fn,sql", _query_items(), ids=[n for n, _, _ in _query_items()]
)
def test_oracle_dtype_contract(spark, duck, sf_dir, name, fn, sql):
    s_types = {f.name: f.dataType.simpleString() for f in fn(spark, sf_dir).schema}
    d_types = _duck_types(duck, sql)
    assert set(s_types) == set(d_types), (
        f"{name}: column sets differ spark={sorted(s_types)} "
        f"duck={sorted(d_types)}"
    )
    problems = []
    for col, s_t in s_types.items():
        d_t = d_types[col]
        if s_t in _INTEGRAL_SPARK:
            if d_t.upper() not in _INTEGRAL_DUCK:
                problems.append(
                    f"{col}: spark {s_t} vs duck {d_t} "
                    f"(HUGEINT/DOUBLE -> float64 in pandas fetch)"
                )
        elif s_t == "double":
            if d_t.upper() != "DOUBLE":
                problems.append(f"{col}: spark double vs duck {d_t}")
        elif s_t == "float":
            if d_t.upper() not in {"FLOAT", "REAL"}:
                problems.append(f"{col}: spark float vs duck {d_t}")
        elif s_t.startswith("decimal("):
            # A decimal OUTPUT column is hazardous even when both
            # sides agree on precision and scale: DuckDB's pandas
            # fetch renders DECIMAL as float64 ("26750.0") while
            # Spark's toPandas yields decimal.Decimal objects
            # ("26750"), so value-equal results hash differently.
            # This exact pairing made the five account_changes/
            # balances queries hash-red in CORRECTNESS_r13 — the only
            # decimal-typed outputs in the registry.  Aggregate in
            # DECIMAL, output as BIGINT (exact integers) or DOUBLE.
            problems.append(
                f"{col}: decimal output spark={s_t} duck={d_t} "
                f"(pandas fetch renders Decimal vs float64 -> "
                f"hash-diverges; cast the output to BIGINT or DOUBLE)"
            )
    assert not problems, f"{name}: dtype hazards: {problems}"
