"""Isolated best-of-N measurement for a subset of declared queries.

Usage: python tools/measure_subset.py q1 q2 ... [--runs N]
Same methodology as bench.py (warm session, best-of-N on df.count())
but over an explicit subset, for single-session A/B work during
optimization rounds.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import __spark_entry__ as e
    from near_indexer_for_explorer_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])

    spark = get_spark(app_name="nifes-measure-subset")
    qs = e.queries()
    names = [n for n in args if n in qs]
    missing = [n for n in args if n not in qs]
    if missing:
        print(f"# unknown queries skipped: {missing}", file=sys.stderr)
    if not names:
        print("measure_subset: no known query names given", file=sys.stderr)
        sys.exit(2)

    # warm the JVM + parquet footer cache (same as bench.py)
    qs[names[0]](spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"measure:{name}")
        best, n = None, 0
        for _ in range(runs):
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            n = df.count()
            took = time.perf_counter() - t0
            best = took if best is None else min(best, took)
        timings[name] = round(best, 4)
        print(f"# {name}: best-of-{runs} {timings[name]:.3f}s rows={n}",
              file=sys.stderr)

    print(json.dumps({"queries": timings,
                      "value": round(sum(timings.values()), 4)}))


if __name__ == "__main__":
    main()
