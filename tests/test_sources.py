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


def test_zorder_compaction_tightens_file_stats(spark, sf_dir, tmp_path):
    """The z-ordered writer must produce files whose parquet footer
    min/max ranges are tight in BOTH clustering columns vs the plain
    compactor (this is what makes scans on either key prune files)."""
    import glob

    import pyarrow.parquet as pq

    from near_indexer_for_explorer_spark.sources.sinks import (
        compact_parquet,
        compact_parquet_zorder,
    )
    from near_indexer_for_explorer_spark.sources.tables import load_table

    src = str(tmp_path / "src")
    load_table(spark, sf_dir, "orders").withColumn(
        "o_orderdate_days", F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01"))
    ).write.parquet(src)

    plain, zord = str(tmp_path / "plain"), str(tmp_path / "zord")
    compact_parquet(spark, src, plain, target_mb=1)
    n = compact_parquet_zorder(
        spark, src, zord, ("o_custkey", "o_orderdate_days"), n_files=32
    )
    assert n >= 16

    def mean_spans(d):
        spans = {"o_custkey": [], "o_orderdate_days": []}
        for p in glob.glob(f"{d}/*.parquet"):
            md = pq.ParquetFile(p).metadata
            lo = {k: None for k in spans}
            hi = {k: None for k in spans}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if name in spans and col.statistics is not None:
                        st = col.statistics
                        lo[name] = st.min if lo[name] is None else min(lo[name], st.min)
                        hi[name] = st.max if hi[name] is None else max(hi[name], st.max)
            for k in spans:
                if lo[k] is not None:
                    spans[k].append(hi[k] - lo[k])
        return {k: sum(v) / len(v) for k, v in spans.items()}

    sp, sz = mean_spans(plain), mean_spans(zord)
    # plain compaction leaves each file spanning ~the whole domain;
    # z-order must tighten both dimensions substantially
    assert sz["o_custkey"] < sp["o_custkey"] / 2, (sp, sz)
    assert sz["o_orderdate_days"] < sp["o_orderdate_days"] / 2, (sp, sz)


def test_csv_lake_roundtrip_and_quarantine(spark, sf_dir, tmp_path):
    """CSV scan honors the same never-crash contract as JSONL: typed
    rows round-trip exactly, untypeable lines land whole in the
    quarantine column."""
    from pyspark.sql import types as T

    from near_indexer_for_explorer_spark.sources.lake import (
        CORRUPT_COL,
        read_csv_lake,
        split_corrupt,
    )
    from near_indexer_for_explorer_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    rows = orders.limit(40).collect()
    path = tmp_path / "orders.csv"
    with open(path, "w") as f:
        for r in rows:
            f.write(f"{r['o_orderkey']},{r['o_custkey']},{r['o_totalprice']}\n")
        f.write("12345,not_a_number,99.5\n")  # untypeable custkey

    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField(CORRUPT_COL, T.StringType()),
        ]
    )
    df = read_csv_lake(spark, str(path), schema)
    clean, corrupt = split_corrupt(df)
    assert clean.count() == 40
    assert corrupt.count() == 1
    got = {r["o_orderkey"]: (r["o_custkey"], r["o_totalprice"]) for r in clean.collect()}
    want = {r["o_orderkey"]: (r["o_custkey"], r["o_totalprice"]) for r in rows}
    assert got == want
    assert corrupt.collect()[0][CORRUPT_COL] == "12345,not_a_number,99.5"


def test_csv_lake_schema_requires_corrupt_column(spark):
    from pyspark.sql import types as T

    from near_indexer_for_explorer_spark.sources.lake import read_csv_lake

    with pytest.raises(ValueError):
        read_csv_lake(
            spark, "/nonexistent", T.StructType([T.StructField("a", T.LongType())])
        )


def test_orc_roundtrip_value_identical(spark, sf_dir, tmp_path):
    """ORC conversion preserves every value: the round-trip compares
    the full sorted row set of the orders table."""
    from near_indexer_for_explorer_spark.sources.sinks import (
        convert_parquet_to_orc,
    )

    src = f"{sf_dir}/orders.parquet"
    out = str(tmp_path / "orders_orc")
    n = convert_parquet_to_orc(spark, src, out)
    pq = spark.read.parquet(src)
    orc = spark.read.orc(out)
    assert n == pq.count() == orc.count()
    cols = sorted(pq.columns)
    a = sorted([tuple(r) for r in pq.select(*cols).collect()], key=repr)
    b = sorted([tuple(r) for r in orc.select(*cols).collect()], key=repr)
    assert a == b


def test_parquet_schema_evolution_union_and_nulls(spark, tmp_path):
    """read_parquet_evolved: v1 files (a, b) and v2 files (a, b, c)
    read as one (a, b, c) schema with NULL c on v1 rows — and the
    evolved scan still prunes columns (ReadSchema carries only the
    selected column)."""
    from near_indexer_for_explorer_spark.sources.lake import (
        read_parquet_evolved,
    )

    tbl = str(tmp_path / "evolved_tbl")
    spark.createDataFrame(
        [(1, "x"), (2, "y")], "a long, b string"
    ).coalesce(1).write.mode("append").parquet(tbl)
    spark.createDataFrame(
        [(3, "z", 30.5)], "a long, b string, c double"
    ).coalesce(1).write.mode("append").parquet(tbl)

    df = read_parquet_evolved(spark, tbl)
    assert sorted(df.columns) == ["a", "b", "c"]
    rows = {r["a"]: (r["b"], r["c"]) for r in df.collect()}
    assert rows == {1: ("x", None), 2: ("y", None), 3: ("z", 30.5)}

    plan = df.select("a")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    read_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    assert "a" in read_schema and "c:" not in read_schema


def test_deprecated_namespace_aliases_resolve_to_one_relation(spark, sf_dir):
    """The deprecated_namespace rename replay: the old names are views
    OVER the canonical one -- identical semantics, not a second scan
    source -- and register_views returns both name sets."""
    from near_indexer_for_explorer_spark.sources.catalog import (
        DEPRECATED_ALIASES,
        register_views,
    )

    names = register_views(spark, sf_dir)
    for old, canonical in DEPRECATED_ALIASES.items():
        assert old in names and canonical in names
        assert spark.table(old).sameSemantics(spark.table(canonical))
    n_events = spark.table("events").count()
    assert spark.table("account_changes").count() == n_events > 0


def test_renamed_lake_table_spans_schema_versions(spark, tmp_path):
    """ALTER TABLE SET SCHEMA lake-side: files written under two schema
    versions read as one evolved relation addressable by the canonical
    AND the deprecated name, with pre-evolution files NULL-filled."""
    from near_indexer_for_explorer_spark.sources.catalog import (
        register_renamed_lake_table,
    )

    path = str(tmp_path / "acct_changes")
    spark.createDataFrame(
        [(1, "alice")], "change_id long, account string"
    ).write.parquet(path + "/v1")
    spark.createDataFrame(
        [(2, "bob", "MIGRATION")],
        "change_id long, account string, reason_kind string",
    ).write.parquet(path + "/v2")
    # one directory of mixed-version files
    import shutil

    for sub in ("v1", "v2"):
        for fn in __import__("os").listdir(f"{path}/{sub}"):
            if fn.endswith(".parquet"):
                shutil.move(f"{path}/{sub}/{fn}", f"{path}/{sub}_{fn}")
        shutil.rmtree(f"{path}/{sub}")

    register_renamed_lake_table(
        spark, path, "account_changes_v2",
        deprecated_names=("deprecated__account_changes",),
    )
    new = spark.table("account_changes_v2")
    old = spark.table("deprecated__account_changes")
    assert old.sameSemantics(new) or (
        sorted(map(tuple, old.collect())) == sorted(map(tuple, new.collect()))
    )
    rows = {r["change_id"]: r for r in new.collect()}
    assert rows[1]["reason_kind"] is None          # pre-evolution file
    assert rows[2]["reason_kind"] == "MIGRATION"   # post-evolution file
