"""PySpark-native analytics engine with the query/data-processing
capabilities of near/near-indexer-for-explorer, re-expressed Spark-first.

The reference (read-only at /root/reference) is a Rust blockchain ETL
indexer: streaming ingestion -> normalization into ~15 relational tables
-> PostgreSQL with idempotent inserts, keyed upserts, enrichment joins,
JSON event extraction, and periodic aggregates.  This package provides
the same operator surface on Apache Spark (DataFrame/SQL + Structured
Streaming), plus the large-scale training-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis).

See SURVEY.md for the full operator inventory and architecture.
"""

__version__ = "0.1.0"
