"""Interleaved same-session A/B for the r15 dedup_components change:
full-corpus label propagation (r14 shape) vs endpoint-domain
propagation + one corpus join (r15 shape).  Both variants are built
from the package's own pieces so the comparison is code-identical
everywhere else.

Usage: python tools/ab_components.py [rounds]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def main() -> None:
    from near_indexer_for_explorer_spark.operators.dedup import (
        _CC_ROUNDS,
        dedup_components,
        dedup_minhash_lsh,
        propagate_components,
    )
    from near_indexer_for_explorer_spark.session import get_spark
    from near_indexer_for_explorer_spark.sources.tables import load_table

    spark = get_spark(app_name="ab-components")

    def build_old():
        pairs = dedup_minhash_lsh(spark, SF).select("doc_id_1", "doc_id_2")
        edges = pairs.select(
            F.col("doc_id_1").alias("src"), F.col("doc_id_2").alias("dst")
        ).unionByName(
            pairs.select(
                F.col("doc_id_2").alias("src"), F.col("doc_id_1").alias("dst")
            )
        ).localCheckpoint(eager=False)
        nodes = load_table(spark, SF, "documents").select("doc_id")
        labels = propagate_components(nodes, edges, _CC_ROUNDS)
        labels = labels.localCheckpoint(eager=False)
        flag = labels.agg(
            F.bool_and(F.col("label") == F.col("label_prev")).alias(
                "converged"
            )
        )
        return labels.crossJoin(F.broadcast(flag)).select(
            "doc_id",
            F.col("label").alias("component_id"),
            (F.col("doc_id") == F.col("label")).alias("is_representative"),
            "converged",
        )

    variants = {
        "old(full-domain)": build_old,
        "new(endpoints)  ": lambda: dedup_components(spark, SF),
    }
    # warm
    build_old().count()

    times: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(ROUNDS):
        for k, fn in variants.items():
            spark.sparkContext.setJobDescription(f"components {k}")
            t0 = time.perf_counter()
            fn().count()
            times[k].append(time.perf_counter() - t0)
        print(f"# round {r + 1}/{ROUNDS}", file=sys.stderr, flush=True)
    for k, v in times.items():
        print(
            f"{k} median {statistics.median(v):.3f}s "
            f"runs={['%.2f' % x for x in v]}"
        )


if __name__ == "__main__":
    main()
