from near_indexer_for_explorer_spark.functions.numeric import (  # noqa: F401
    dec_money,
    dec_rate,
    dsum,
    dsum_money,
    epoch_seconds,
)
