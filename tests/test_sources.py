"""Lake-source tests: JSONL ingestion with corrupt-record quarantine
(the reference's serde-with-error-logging contract, as a scan
policy)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F


def test_jsonl_roundtrip_and_quarantine(spark, sf_dir, tmp_path):
    from near_indexer_for_explorer_spark.sources.lake import (
        DOCUMENT_JSONL_SCHEMA,
        read_jsonl,
        split_corrupt,
    )
    from near_indexer_for_explorer_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = [r.asDict() for r in docs.limit(50).collect()]
    path = tmp_path / "docs.jsonl"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write('{"doc_id": 999999, "text": BROKEN\n')  # malformed
        f.write("not json at all\n")  # malformed

    df = read_jsonl(spark, str(path), DOCUMENT_JSONL_SCHEMA)
    clean, corrupt = split_corrupt(df)
    assert clean.count() == 50
    assert corrupt.count() == 2
    # typed columns survive the round-trip exactly
    got = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert got == {r["doc_id"]: r["text"] for r in rows}
    # the quarantine keeps the raw line for replay
    raw = [r["_corrupt_record"] for r in corrupt.collect()]
    assert "not json at all" in raw


def test_jsonl_schema_requires_corrupt_column(spark):
    from pyspark.sql import types as T

    from near_indexer_for_explorer_spark.sources.lake import read_jsonl

    with pytest.raises(ValueError):
        read_jsonl(
            spark, "/nonexistent", T.StructType([T.StructField("a", T.LongType())])
        )


def test_jsonl_feeds_the_quality_filter(spark, sf_dir, tmp_path):
    """The lake source composes with the corpus operators: JSONL in,
    B25 rule columns out, identical to the parquet path."""
    from near_indexer_for_explorer_spark.operators.textops import (
        quality_filter_columns,
    )
    from near_indexer_for_explorer_spark.sources.lake import (
        DOCUMENT_JSONL_SCHEMA,
        read_jsonl,
        split_corrupt,
    )
    from near_indexer_for_explorer_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = [r.asDict() for r in docs.limit(40).collect()]
    path = tmp_path / "docs.jsonl"
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    clean, _ = split_corrupt(read_jsonl(spark, str(path), DOCUMENT_JSONL_SCHEMA))
    got = quality_filter_columns(clean)
    want = quality_filter_columns(
        docs.where(F.col("doc_id").isin([r["doc_id"] for r in rows]))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_zorder_layout_tightens_both_dimensions(spark, sf_dir):
    """The point of z-ordering: per-file min/max ranges shrink in BOTH
    pruning dimensions simultaneously vs the insertion-order layout
    (linear files span nearly the whole custkey domain)."""
    from near_indexer_for_explorer_spark.sources.layout import (
        orders_zorder_layout,
    )

    rows = orders_zorder_layout(spark, sf_dir).collect()
    import statistics

    spans = {}
    for layout in ("zorder", "linear"):
        sel = [r for r in rows if r.layout == layout]
        assert sel, "both layouts must report files"
        spans[layout] = (
            statistics.mean(r.custkey_span for r in sel),
            statistics.mean(r.day_span for r in sel),
        )
    assert spans["zorder"][0] < spans["linear"][0] / 2
    assert spans["zorder"][1] < spans["linear"][1] / 2
