"""Aggregate registry for operator-family queries (SURVEY.md section 2B).

plans/relational.py holds the section-2A registry; this module merges
the operator families so __spark_entry__ exposes one flat namespace.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from near_indexer_for_explorer_spark.multimodal import decode as _decode
from near_indexer_for_explorer_spark.operators import asof as _asof
from near_indexer_for_explorer_spark.operators import bpe as _bpe
from near_indexer_for_explorer_spark.operators import assets as _assets
from near_indexer_for_explorer_spark.operators import corpus as _corpus
from near_indexer_for_explorer_spark.operators import dedup as _dedup
from near_indexer_for_explorer_spark.operators import similarity as _similarity
from near_indexer_for_explorer_spark.operators import textops as _textops
from near_indexer_for_explorer_spark.sources import layout as _layout
from near_indexer_for_explorer_spark.streaming import replay as _replay

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Names whose query fn EXECUTES a full streaming pipeline at
# DataFrame-construction time (see streaming/replay.py's eager
# contract).  Plan-census consumers skip these structurally.
REPLAY_QUERIES: frozenset[str] = _replay.REPLAY_QUERIES

for _mod in (_dedup, _similarity, _textops, _decode, _asof, _assets, _corpus, _bpe, _layout, _replay):
    QUERIES.update(_mod.QUERIES)
    ORACLES.update(_mod.ORACLES)
