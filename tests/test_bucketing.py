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


def test_exchange_count_ab_bucketed_vs_plain(spark, bucketed_tables):
    """The bucketed-join device PRICED as an A/B (VERDICT r14 #6): the
    identical orders-lineitem join planned from plain parquet needs one
    shuffle Exchange + Sort per side, from the co-bucketed tables it
    needs ZERO of either — the write-time shuffle is the whole cost,
    amortized across every later join on the key. Cited by the
    q_join_bucketed headliner note in PLANS.md."""
    to, tl = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cols = ["o_orderkey", "l_linenumber", "o_totalprice", "l_quantity"]
        b = (
            read_bucketed_table(spark, to)
            .join(
                read_bucketed_table(spark, tl),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .select(*cols)
        )
        p = (
            load_table(spark, SF_SMOKE, "orders")
            .join(
                load_table(spark, SF_SMOKE, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .select(*cols)
        )

        def counts(df):
            plan = df._jdf.queryExecution().executedPlan().toString()
            return plan.count("Exchange"), plan.count("+- Sort"), plan

        bx, bs, bplan = counts(b)
        px, ps, pplan = counts(p)
        # The device removes the EXCHANGES (the network cost). Sorts can
        # survive on the bucketed side when a bucket spans several files
        # (Spark only trusts write-time sort order for single-file
        # buckets) — they are local, spill-free at bucket granularity,
        # and shuffle nothing.
        assert bx == 0, bplan
        assert px >= 2, pplan  # one hash-partitioning shuffle per side
        assert ps >= 2, pplan  # one sort per side for the SortMergeJoin
        # same rows either way — the device changes cost, not answers
        assert b.count() == p.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
