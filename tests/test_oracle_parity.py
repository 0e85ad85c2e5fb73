"""In-process mirror of the driver's t2 correctness gate: every query
with an oracle must match DuckDB row-for-row (order-insensitive,
column-name-sorted) at the test scale factor."""

from __future__ import annotations

import math

import pytest


def _normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return value
    return value


def _rows_to_sorted(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        out.append(tuple(_normalize(row[i]) for i in order))
    return sorted(out, key=repr)


def _spark_result(spark, sf_dir, fn):
    df = fn(spark, sf_dir)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def _duck_result(duck, sql):
    cur = duck.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows


def _query_items():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    return [(name, qs[name], oracles[name]) for name in sorted(oracles)]


@pytest.mark.parametrize(
    "name,fn,sql", _query_items(), ids=[n for n, _, _ in _query_items()]
)
def test_oracle_parity(spark, duck, sf_dir, name, fn, sql):
    s_cols, s_rows = _spark_result(spark, sf_dir, fn)
    d_cols, d_rows = _duck_result(duck, sql)
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_sorted = _rows_to_sorted(s_rows, s_cols)
    d_sorted = _rows_to_sorted(d_rows, d_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns[0] == "l_returnflag"
