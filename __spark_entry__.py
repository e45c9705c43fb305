"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``hive_similarity_join_spark`` package;
this module only re-exports the registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hive_similarity_join_spark.registry import (
    ORACLES,
    QUERIES,
    load_registry,
    ordered,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact prefix-filtered Jaccard similarity self-join
    on documents at t=0.8 (expected 32,191 pairs at sf0.001)."""
    load_registry()
    return QUERIES["q_simjoin_jaccard_self"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    load_registry()
    return ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    load_registry()
    return ordered(ORACLES)
