"""User-defined extension surface (SURVEY §2.11): the Hive
UDF/UDAF/UDTF trio mapped to their modern Spark equivalents.

The reference family ships Java ``GenericUDF`` (scalar),
``GenericUDAFResolver`` (aggregate) and ``GenericUDTF`` (table) classes
loaded via ``ADD JAR`` + ``CREATE TEMPORARY FUNCTION``. The engine's
positions:

- scalar   -> SQL temp functions (sql_api.py) — pure Catalyst, codegen;
  Python never enters the row path.
- table    -> Python UDTF (``@udtf``, Spark >= 3.5): lazily yields rows,
  registered so ``SELECT * FROM tokenize_rows(...)`` and LATERAL joins
  work verbatim in SQL. The built-in-first rule still applies —
  ``explode(tokenize(...))`` covers the common case JVM-side; the UDTF
  exists for table-functions with per-row control flow the built-ins
  can't express (and as the §2.11 parity artifact).
- aggregate-> Arrow-batched grouped-agg ``pandas_udf``: whole groups
  arrive as pandas Series (vectorized, not row-at-a-time), combinable
  with built-in aggregates in the same ``agg(...)``.

Everything here is off the hot path of the flagship operators by
design; tests pin semantics (tests/test_udx.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf, udtf


class TokenizeRows:
    """Hive-UDTF-style tokenizer: one (position, token) row per token.

    Set semantics (first occurrence kept) matching the kernel's
    tokenize(); positions are the ORIGINAL word positions so consumers
    can reconstruct order — information explode(array_distinct(...))
    drops.
    """

    def eval(self, text: str):  # noqa: D102 — contract defined by @udtf
        if text is None:
            return
        seen = set()
        for pos, raw in enumerate(text.lower().split()):
            if raw and raw not in seen:
                seen.add(raw)
                yield pos, raw


def _harmonic_mean_impl(v: pd.Series) -> float:
    """Harmonic mean — the right average for rates/ratios; not a Spark
    built-in. Nulls and non-positive values are excluded (harmonic mean
    is undefined at 0)."""
    x = v.dropna()
    x = x[x > 0]
    if len(x) == 0:
        return None
    return float(len(x) / (1.0 / x).sum())


def make_tokenize_rows_udtf():
    """Python UDTF (built lazily — the decorator parses DDL and needs an
    active session)."""
    return udtf(TokenizeRows, returnType="pos: int, token: string")


def make_harmonic_mean_udaf():
    """Grouped-agg pandas UDAF (Hive GenericUDAF equivalent) — whole
    groups arrive as Arrow-backed Series, combinable with built-in
    aggregates in the same agg(...)."""
    return pandas_udf(_harmonic_mean_impl, "double")


def register_udx(spark: SparkSession) -> list[str]:
    """CREATE TEMPORARY FUNCTION for the SQL surface (E2)."""
    spark.udtf.register("tokenize_rows", make_tokenize_rows_udtf())
    spark.udf.register("harmonic_mean", make_harmonic_mean_udaf())
    return ["tokenize_rows", "harmonic_mean"]
