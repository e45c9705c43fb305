"""Bucketed tables: the write-time shuffle buys exchange-free joins."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.sources.loader import load_table
from hive_similarity_join_spark.sources.sinks import (
    read_bucketed_table,
    write_bucketed_table,
)
from tests.conftest import SF_SMOKE

N_BUCKETS = 8


@pytest.fixture()
def bucketed_tables(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed_table(
        o, "t_orders_b", ("o_orderkey",), N_BUCKETS, sort_cols=("o_orderkey",)
    )
    write_bucketed_table(
        li, "t_lineitem_b", ("l_orderkey",), N_BUCKETS, sort_cols=("l_orderkey",)
    )
    yield "t_orders_b", "t_lineitem_b"
    for t in ("t_orders_b", "t_lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(Path("spark-warehouse"), ignore_errors=True)


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    to, tl = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = read_bucketed_table(spark, to)
        li = read_bucketed_table(spark, tl)
        joined = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
            "o_orderkey", "l_linenumber", "o_totalprice", "l_quantity"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # correctness unchanged vs the plain parquet join
        want = (
            load_table(spark, SF_SMOKE, "orders")
            .join(
                load_table(spark, SF_SMOKE, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    _, tl = bucketed_tables
    li = read_bucketed_table(spark, tl)
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("sq"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # grouping on the bucket key reuses the write-time clustering
    assert "Exchange" not in plan, plan
