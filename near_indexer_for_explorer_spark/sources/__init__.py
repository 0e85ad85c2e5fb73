from near_indexer_for_explorer_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
)
