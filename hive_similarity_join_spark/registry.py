"""Query-key registry — the driver contract's backbone.

Each operator from SURVEY.md §2 registers here under its query key:
a builder ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
the equivalent ANSI SQL the DuckDB oracle runs on the same parquet
tables. ``__spark_entry__.py`` re-exports these dicts verbatim.

Alias discipline (SURVEY §7): every computed column is aliased
identically in the Spark builder and the oracle SQL — the driver's
compare sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder; ``oracle=None`` marks a genuinely
    non-SQL-expressible op (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_loaded = False


def load_registry() -> None:
    """Import every query module exactly once (they self-register)."""
    global _loaded
    if _loaded:
        return
    import hive_similarity_join_spark.queries  # noqa: F401

    _loaded = True
