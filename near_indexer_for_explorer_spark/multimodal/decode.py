"""Multimodal binary-column plumbing (SURVEY.md section 2B12).

Media (image/audio/video) is modeled as an opaque ``binary`` payload
column plus a typed metadata struct — the layout a 100 TB multimodal
training pipeline uses.  The Spark-side plumbing (schema, Arrow
batching via mapInPandas, partition-parallel decode) is real and
tested; the actual pixel/sample decode is STUBBED because no media
libraries exist in this container: with Pillow/torchaudio installed,
the real branch replaces the stub with no plan changes.

The mapInPandas kernel is built as a closure (pickled by value) so
executor Python workers need no access to this package on their
PYTHONPATH — the engine must work when driven from any harness cwd.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from near_indexer_for_explorer_spark.sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

DECODE_SCHEMA = (
    "doc_id long, byte_len long, header_u32 long, "
    "fake_mean_byte double, decode_backend string"
)


def make_decode_kernel() -> Callable[[Iterator], Iterator]:
    """Build the Arrow-batched decode kernel as a self-contained
    closure.  Per-batch (not per-row) Python overhead; at scale this
    runs once per ~maxRecordsPerBatch rows."""

    def decode_binary_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        try:  # real decoders, absent in this container by design
            import PIL.Image  # noqa: F401

            have_media_libs = True
        except ImportError:
            have_media_libs = False

        def decode_real(payload: bytes) -> dict:
            # Real decode path (Pillow etc.).  Deliberately unreachable
            # here — the container ships no media libraries.
            raise NotImplementedError(
                "media libraries not available in this environment"
            )

        def decode_stub(payload: bytes) -> dict:
            # Deterministic fake 'decode': header word + mean of the
            # first 64 bytes.  Stable across runs so the driver's
            # rows-only check is reproducible.
            head = payload[:4].ljust(4, b"\0")
            window = payload[:64]
            return {
                "byte_len": len(payload),
                "header_u32": int.from_bytes(head, "big"),
                "fake_mean_byte": (sum(window) / len(window)) if window else 0.0,
                "decode_backend": "stub",
            }

        decode = decode_real if have_media_libs else decode_stub
        for pdf in batches:
            feats = [decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return decode_binary_batches


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: encode documents.text as the stand-in
    payload (the container has no real media), then decode/feature-
    extract via Arrow-batched mapInPandas.

    Rows-only driver check (the kernel is not SQL-expressible);
    determinism is asserted in tests/test_operators.py."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("n_chars").alias("width"),
            F.lit(1).alias("channels"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )
    return payloads.mapInPandas(make_decode_kernel(), schema=DECODE_SCHEMA)


QUERIES["multimodal_decode"] = multimodal_decode
