from near_indexer_for_explorer_spark.plans.relational import (  # noqa: F401
    ORACLES as RELATIONAL_ORACLES,
)
from near_indexer_for_explorer_spark.plans.relational import (  # noqa: F401
    QUERIES as RELATIONAL_QUERIES,
)
