"""JSON-lines lake source — the reference's ACTUAL ingestion format.

NEAR Lake serves each block as JSON objects in S3
(/root/reference/indexer/src/main.rs polls them; the `near-lake`
crate deserializes with serde).  The Spark-first equivalent is a
schema-explicit `spark.read.json` with the PERMISSIVE corrupt-record
policy: well-formed lines parse into typed columns, malformed lines
land whole in `_corrupt_record` instead of failing the batch — the
same never-crash-the-loop contract the reference gets from
`serde_json::from_slice` + error logging.

Schema is mandatory: schema inference at 100 TB double-reads the
corpus and silently unions drifting shapes; an explicit StructType
makes the scan single-pass and pins column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOCUMENT_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Schema-explicit JSONL scan with corrupt-record capture.  The
    schema MUST contain a `_corrupt_record` string field (Spark drops
    the corrupt column otherwise)."""
    if CORRUPT_COL not in schema.fieldNames():
        raise ValueError(f"schema must include {CORRUPT_COL!r}")
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, corrupt_rows): corrupt rows keep only the raw line
    (for a quarantine sink); clean rows drop the corrupt column.  The
    reference logs-and-skips; a lake pipeline quarantines for replay.

    Spark disallows queries whose column pruning leaves ONLY the
    corrupt column referenced from the raw scan — and the corrupt-null
    FILTER counts as such a reference, so even clean.count() trips it
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN).  The documented remedy is to
    materialize the parsed batch once and fan out clean + quarantine
    from the snapshot — which a real ingest does anyway."""
    snap = df.localCheckpoint(eager=True)
    clean = snap.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = snap.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, corrupt


def read_csv_lake(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Schema-explicit CSV scan with the same corrupt-record contract
    as read_jsonl: well-formed lines parse into typed columns,
    malformed lines (wrong arity, untypeable values) land whole in
    `_corrupt_record` instead of failing the batch.  CSV is the other
    lake interchange format every export pipeline ends up speaking;
    schema-explicit for the same 100 TB single-pass/pruning reasons."""
    if CORRUPT_COL not in schema.fieldNames():
        raise ValueError(f"schema must include {CORRUPT_COL!r}")
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", "false")
        .csv(path)
    )


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution parquet scan: a lake table whose files were
    written under DIFFERENT schema versions (columns added over time —
    the reference's migration story, database/migrations/*, replayed
    as lake files) reads as ONE unified schema; files written before a
    column existed surface NULL for it.

    ``mergeSchema`` pays a footer scan per file, so production tables
    should pin the latest schema explicitly once known — this reader
    is the discovery path (and the pinned-schema read is the ordinary
    ``spark.read.schema(...)``, already exercised everywhere else)."""
    return spark.read.option("mergeSchema", "true").parquet(path)
