"""Capture .explain("formatted") output for declared queries.

Usage: python tools/capture_plans.py OUTDIR SUFFIX query [query ...]
Writes OUTDIR/<query>_<SUFFIX>.txt for each query.  Run with
PYTHONPATH/cwd at the tree whose plans you want (e.g. a git worktree of
the pre-change commit for `before` files).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.getcwd())

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as e
    from near_indexer_for_explorer_spark.session import get_spark

    spark = get_spark(app_name="nifes-capture-plans")
    qs = e.queries()
    for name in names:
        if name not in qs:
            print(f"# unknown: {name}", file=sys.stderr)
            continue
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"# wrote {path} ({len(buf.getvalue().splitlines())} lines)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
