"""Interleaved same-session A/B for the r15 supply WAP publish change:
old shape (snappy parquet, union keeps its shuffle partitioning) vs
new shape (zstd, coalesce(1)) — one full incremental catch-up cycle
per run, base dir frozen once per variant.  Also prints the file count
per published version, the concrete guide-§6 artifact.

Usage: python tools/ab_supply.py [rounds]
"""
import glob
import os
import shutil
import statistics
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def main() -> None:
    from near_indexer_for_explorer_spark.plans.relational import (
        _SUPPLY_PIVOT,
        _supply_kernel,
        supply_missing_days,
    )
    from near_indexer_for_explorer_spark.session import get_spark
    from near_indexer_for_explorer_spark.sources.sinks import (
        publish_atomic,
        read_published,
    )
    from near_indexer_for_explorer_spark.sources.tables import load_table

    spark = get_spark(app_name="ab-supply")

    def old_publish(df, out_dir):
        # pre-r15 write: default codec, no coalesce
        staging = os.path.join(out_dir, f"_staging_{uuid.uuid4().hex[:12]}")
        df.write.mode("overwrite").parquet(staging)
        versions = [
            int(p.rsplit("=", 1)[1])
            for p in glob.glob(os.path.join(out_dir, "v=*"))
        ]
        final = os.path.join(out_dir, f"v={max(versions, default=-1) + 1}")
        os.rename(staging, final)
        with open(os.path.join(final, "_PUBLISHED"), "w") as fh:
            fh.write("ok\n")
        return final

    def catchup(out_dir, new: bool):
        orders = load_table(spark, SF, "orders")
        missing, published = supply_missing_days(spark, SF, out_dir)
        missing = missing.localCheckpoint(eager=True)
        if not missing.limit(1).count():
            raise RuntimeError("no missing days")
        fresh = _supply_kernel(orders, missing)
        union = fresh if published is None else published.unionByName(fresh)
        if new:
            return publish_atomic(
                union.coalesce(1).localCheckpoint(eager=True), out_dir
            )
        return old_publish(union.localCheckpoint(eager=True), out_dir)

    def build_base(new: bool) -> str:
        import datetime

        base = tempfile.mkdtemp(prefix=f"ab_supply_{'new' if new else 'old'}_")
        orders = load_table(spark, SF, "orders")
        pivot = datetime.date.fromisoformat(_SUPPLY_PIVOT)
        missing, _ = supply_missing_days(spark, SF, base, upto=pivot)
        missing = missing.localCheckpoint(eager=True)
        fresh = _supply_kernel(orders, missing)
        if new:
            publish_atomic(fresh.coalesce(1).localCheckpoint(eager=True), base)
        else:
            old_publish(fresh.localCheckpoint(eager=True), base)
        return base

    bases = {"old": build_base(False), "new": build_base(True)}
    for k, b in bases.items():
        v = max(glob.glob(os.path.join(b, "v=*")))
        n = len(glob.glob(os.path.join(v, "*.parquet")))
        sz = sum(
            os.path.getsize(p) for p in glob.glob(os.path.join(v, "*.parquet"))
        )
        print(f"# base[{k}]: {n} parquet files, {sz} bytes")

    def one_cycle(variant: str) -> float:
        work = tempfile.mkdtemp(prefix="ab_supply_work_")
        try:
            shutil.rmtree(work)
            shutil.copytree(bases[variant], work)
            t0 = time.perf_counter()
            catchup(work, new=(variant == "new"))
            read_published(spark, work).localCheckpoint(eager=True).count()
            return time.perf_counter() - t0
        finally:
            shutil.rmtree(work, ignore_errors=True)

    one_cycle("old")  # warm
    times = {"old": [], "new": []}
    for r in range(ROUNDS):
        for k in ("old", "new"):
            spark.sparkContext.setJobDescription(f"supply cycle [{k}]")
            times[k].append(one_cycle(k))
        print(f"# round {r + 1}/{ROUNDS}", file=sys.stderr, flush=True)
    for k, v in times.items():
        print(
            f"{k} median {statistics.median(v):.3f}s "
            f"runs={['%.2f' % x for x in v]}"
        )
    for k, b in bases.items():
        shutil.rmtree(b, ignore_errors=True)


if __name__ == "__main__":
    main()
