"""Interleaved same-session A/B of the r14 lazy-checkpoint sites.

Variant A = the committed tree (localCheckpoint(eager=False) sites
active).  Variant B = every *lazy* localCheckpoint turned into identity
(eager=True sites untouched), i.e. the pre-r14 recompute shape.  Both
variants run alternately in ONE warm session (A B A B ...), timing the
bench's own region (build + count), and the medians are compared —
the only measurement this box supports (see BENCH_BASELINE.md §r14).

Usage: python tools/ab_ckpt.py [rounds] [query ...]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

_orig_ckpt = DataFrame.localCheckpoint


def _identity_lazy_ckpt(self, eager=True):
    if eager:
        return _orig_ckpt(self, eager=True)
    return self


def main() -> None:
    from near_indexer_for_explorer_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark(app_name="ab-ckpt")
    qs = e.queries()
    names = sys.argv[2:] or [
        "parts_abc_pareto",
        "orders_basket_rules",
        "embedding_top_component",
        "embedding_anisotropy_whiten",
        "minhash_width_curve",
        "opq_quantize_serve",
    ]
    # warm the JVM + footer cache
    qs[names[0]](spark, SF).count()

    results: dict[str, dict[str, list[float]]] = {
        n: {"A": [], "B": []} for n in names
    }
    for r in range(ROUNDS):
        for variant in ("A", "B"):
            DataFrame.localCheckpoint = (
                _orig_ckpt if variant == "A" else _identity_lazy_ckpt
            )
            for name in names:
                spark.sparkContext.setJobDescription(f"{name} [{variant}]")
                t0 = time.perf_counter()
                qs[name](spark, SF).count()
                results[name][variant].append(time.perf_counter() - t0)
        print(f"# round {r + 1}/{ROUNDS} done", file=sys.stderr, flush=True)
    DataFrame.localCheckpoint = _orig_ckpt

    print(f"{'query':34s} {'A(ckpt) med':>12s} {'B(nockpt) med':>14s} verdict")
    for name in names:
        a = statistics.median(results[name]["A"])
        b = statistics.median(results[name]["B"])
        v = "ckpt WINS" if a < b * 0.95 else (
            "ckpt LOSES" if a > b * 1.05 else "flat"
        )
        print(
            f"{name:34s} {a:12.3f} {b:14.3f} {v}   "
            f"A={['%.2f' % x for x in results[name]['A']]} "
            f"B={['%.2f' % x for x in results[name]['B']]}"
        )


if __name__ == "__main__":
    main()
