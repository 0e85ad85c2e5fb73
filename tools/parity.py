"""Oracle-parity harness: run registered queries and their DuckDB
oracles side by side (the driver's t2 compare, in-process).

Usage: python tools/parity.py [query ...]   (default: first 10)
Env:   PARITY_SF=/root/testdata/sf0.001
"""
import math, sys, os
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
SF = os.environ.get("PARITY_SF", "/root/testdata/sf0.001")
import duckdb
from near_indexer_for_explorer_spark.session import get_spark

def norm(v):
    if isinstance(v, float) and math.isnan(v): return "NaN"
    return v

def sorted_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted([tuple(norm(r[i]) for i in order) for r in rows], key=repr)

spark = get_spark(app_name="parity", shuffle_partitions=8)
con = duckdb.connect(); con.execute("SET TimeZone='UTC'")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
import __spark_entry__ as e
qs, os_ = e.queries(), e.oracle_sql()
fail = 0
for name in sys.argv[1:]:
    try:
        df = qs[name](spark, SF)
        scols = df.columns; srows = [tuple(r) for r in df.collect()]
        cur = con.execute(os_[name]); dcols = [d[0] for d in cur.description]; drows = cur.fetchall()
        ok_c = sorted(scols) == sorted(dcols)
        ok_n = len(srows) == len(drows)
        ss, dd = sorted_rows(srows, scols), sorted_rows(drows, dcols)
        mism = [(a, b) for a, b in zip(ss, dd) if a != b]
        ok = ok_c and ok_n and not mism
        print(name, "OK" if ok else f"FAIL cols={ok_c} rows={len(srows)}/{len(drows)} mism={mism[:2]}")
        if not ok_c: print("  spark:", sorted(scols), "duck:", sorted(dcols))
        fail += 0 if ok else 1
    except Exception as ex:
        print(name, "ERROR", type(ex).__name__, str(ex)[:300]); fail += 1
sys.exit(1 if fail else 0)
