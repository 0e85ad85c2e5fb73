"""Strict (type- and rendering-sensitive) parity check between the
driver-contract queries and the DuckDB oracle.

The committed harness (tools/drive_driver_contract.py) compares values
with Python ``==``, under which Decimal('5') == 5, Decimal('1.50') ==
Decimal('1.5') and 1.5 == Decimal('1.5') -- all invisible to it but
visible to any driver that hashes a RENDERING of the values.  This tool
renders every cell as ``type:repr`` and diffs the sorted multisets, so
a scale/type divergence shows up as a concrete cell diff.

Usage: python tools/strict_parity.py [sf_dir] [query ...]
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "America/New_York")
    .appName("strict-parity")
    .getOrCreate()
)
con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

import __spark_entry__ as e  # noqa: E402


def render(v):
    if isinstance(v, float) and math.isnan(v):
        return "float:NaN"
    return f"{type(v).__name__}:{v!r}"


def rendered_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(render(r[i]) for i in order) for r in rows)


qs, osql = e.queries(), e.oracle_sql()
names = sys.argv[2:] or [
    "account_changes_typed",
    "account_balances_state",
    "account_balances_with_genesis",
    "account_balances_stream_replay",
    "account_changes_page_after",
]
fails = 0
for name in names:
    if name not in osql:
        print(name, "SKIP (no oracle)")
        continue
    df = qs[name](spark, SF)
    scols, srows = df.columns, [tuple(r) for r in df.collect()]
    cur = con.execute(osql[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    sr = rendered_rows(srows, scols)
    dr = rendered_rows(drows, dcols)
    ok = sorted(scols) == sorted(dcols) and sr == dr
    print(name, "OK" if ok else "STRICT-FAIL", f"({len(srows)} rows)")
    if not ok:
        fails += 1
        if sorted(scols) != sorted(dcols):
            print("  cols spark:", sorted(scols))
            print("  cols duck: ", sorted(dcols))
        shown = 0
        for a, b in zip(sr, dr):
            if a != b and shown < 4:
                ordered = sorted(set(scols))
                for c, x, y in zip(ordered, a, b):
                    if x != y:
                        print(f"  col {c}: spark={x}  duck={y}")
                shown += 1
        only_s = [r for r in sr if r not in set(dr)]
        only_d = [r for r in dr if r not in set(sr)]
        if shown == 0 and (only_s or only_d):
            print("  spark-only:", only_s[:2])
            print("  duck-only: ", only_d[:2])
print("STRICT FAILS:", fails)
sys.exit(1 if fails else 0)
