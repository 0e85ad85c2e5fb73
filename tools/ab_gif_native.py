"""Native-vs-stdlib GIF decoder A/B (r11 verdict item #2's recorded row).

Times the three GIF-heavy bench rows twice — once with the default
empty ``NATIVE_DECODERS`` registry (pure-Python LZW prover) and once
with ``numpy_gif_decoders()`` registered under both the ``gif`` and
``gif_frames`` keys (the in-container stand-in for a Pillow/libgif
registration) — and prints ONE JSON line with min-of-N timings and the
speedup ratios.  Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/ab_gif_native.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = 3
ROWS = [
    "multimodal_gif_roundtrip",
    "multimodal_gif_frame_sample",
    "multimodal_scene_cuts",
]


def _time_rows(spark, qs) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in ROWS:
        best = None
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).count()
            took = time.perf_counter() - t0
            best = took if best is None else min(best, took)
        out[name] = round(best, 4)
    return out


def main() -> None:
    import __spark_entry__ as e
    from near_indexer_for_explorer_spark.multimodal import decode as D
    from near_indexer_for_explorer_spark.session import get_spark

    spark = get_spark(app_name="nifes-ab-gif")
    qs = e.queries()
    qs[ROWS[0]](spark, SF_DIR).count()  # warm JVM + footers

    # the numpy pair ships by default since r13 — clear it for the
    # stdlib leg (restored by the native leg's explicit registration)
    D.NATIVE_DECODERS.clear()
    stdlib = _time_rows(spark, qs)

    def _checksum() -> tuple:
        """One scalar per benchmarked query, so a wrong 'gif' AND a
        wrong 'gif_frames' registration both trip the guard."""
        from pyspark.sql import functions as F

        return (
            qs["multimodal_gif_roundtrip"](spark, SF_DIR)
            .agg(F.sum("px_sum"))
            .collect()[0][0],
            qs["multimodal_gif_frame_sample"](spark, SF_DIR)
            .agg(F.sum("frame_sum"), F.sum("frames_total_sum"))
            .collect()[0][0:2],
            qs["multimodal_scene_cuts"](spark, SF_DIR)
            .agg(F.sum("max_delta"), F.sum("n_cuts"))
            .collect()[0][0:2],
        )

    ref_sum = _checksum()

    gif_units, gif_frames = D.numpy_gif_decoders()
    D.NATIVE_DECODERS["gif"] = gif_units
    D.NATIVE_DECODERS["gif_frames"] = gif_frames
    try:
        native = _time_rows(spark, qs)
        assert _checksum() == ref_sum, "native decode diverged from stdlib"
    finally:
        D.NATIVE_DECODERS.clear()
        D.register_default_native_decoders()

    print(
        json.dumps(
            {
                "metric": "gif_native_ab",
                "sf_dir": SF_DIR,
                "n_runs": N_RUNS,
                "stdlib_sec": stdlib,
                "native_sec": native,
                "speedup": {
                    n: round(stdlib[n] / native[n], 2) if native[n] else None
                    for n in ROWS
                },
            }
        )
    )


if __name__ == "__main__":
    main()
