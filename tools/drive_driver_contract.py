"""Drive the driver contract the way the grading driver does: a plain
externally-built SparkSession with a HOSTILE non-UTC session timezone."""
import math, sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import duckdb
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "America/New_York")
    .appName("driver-contract")
    .getOrCreate()
)
con = duckdb.connect(); con.execute("SET TimeZone='UTC'")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

import __spark_entry__ as e

def norm(v):
    if isinstance(v, float) and math.isnan(v): return "NaN"
    return v

def sorted_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted([tuple(norm(r[i]) for i in order) for r in rows], key=repr)

# smoke: entry()
df = e.entry(spark)
rows = df.collect()
assert df.columns[0] == "l_returnflag" and len(rows) > 0
print("entry() smoke OK:", len(rows), "rows")

qs, osql = e.queries(), e.oracle_sql()
sample = sys.argv[1:] or list(qs)[:10]
fails = 0
for name in sample:
    if name not in osql:
        print(name, "SKIP (no oracle)"); continue
    df = qs[name](spark, SF)
    scols, srows = df.columns, [tuple(r) for r in df.collect()]
    cur = con.execute(osql[name]); dcols = [d[0] for d in cur.description]; drows = cur.fetchall()
    ok = (sorted(scols) == sorted(dcols) and len(srows) == len(drows)
          and sorted_rows(srows, scols) == sorted_rows(drows, dcols))
    print(name, "OK" if ok else "FAIL")
    fails += 0 if ok else 1
print("FAILS:", fails)
sys.exit(1 if fails else 0)
