"""Reshape + temporal operators (queries/pipeline_q.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_similarity_join_spark.queries.pipeline_q import (
    q_dedup_latest,
    q_join_asof,
    q_join_range,
    q_pivot,
    q_unpivot,
)
from hive_similarity_join_spark.sources.loader import load_table
from tests.conftest import SF_SMOKE


def test_pivot_row_per_day_and_column_per_type(spark):
    out = q_pivot(spark, SF_SMOKE)
    assert out.columns == ["day", "click", "error", "purchase", "signup", "view"]
    days = (
        load_table(spark, SF_SMOKE, "events")
        .select(F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .distinct()
        .count()
    )
    assert out.count() == days


def test_unpivot_totals_equal_direct_sums(spark):
    rows = {r["measure"]: r["total"] for r in q_unpivot(spark, SF_SMOKE).collect()}
    li = load_table(spark, SF_SMOKE, "lineitem")
    for col in ("l_quantity", "l_discount", "l_tax"):
        direct = li.agg(
            F.sum(F.col(col).cast("decimal(18,4)")).cast("double")
        ).collect()[0][0]
        assert rows[col] == direct


def test_asof_matches_per_row_argmax(spark):
    """The window formulation must equal the quadratic reference: for
    each purchase, the max-(ts, event_id) click strictly earlier."""
    out = {r["event_id"]: r["last_click_id"] for r in q_join_asof(spark, SF_SMOKE).collect()}
    e = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("user_id").alias("uid"),
        F.col("ts").alias("pts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), F.col("user_id").alias("cuid"),
        F.col("ts").alias("cts"),
    )
    ref_rows = (
        p.join(
            c,
            (F.col("uid") == F.col("cuid"))
            & (
                (F.col("cts") < F.col("pts"))
                | ((F.col("cts") == F.col("pts")) & (F.col("cid") < F.col("pid")))
            ),
            "left",
        )
        .groupBy("pid")
        .agg(F.max(F.struct("cts", "cid")).alias("best"))
        .select("pid", F.col("best.cid").alias("ref_click"))
        .collect()
    )
    ref = {r["pid"]: r["ref_click"] for r in ref_rows}
    assert out == ref


def test_range_join_bucketing_is_lossless(spark):
    """Bucketed (user, 30-min window) blocking must reproduce the plain
    theta-join pair set exactly."""
    got = {
        (r["id1"], r["id2"], r["gap_us"])
        for r in q_join_range(spark, SF_SMOKE).collect()
    }
    e = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    a = e.select("user_id", F.col("event_id").alias("id1"), F.col("us").alias("u1"))
    b = e.select(
        F.col("user_id").alias("u_id"), F.col("event_id").alias("id2"),
        F.col("us").alias("u2"),
    )
    ref = {
        (r["id1"], r["id2"], r["u2"] - r["u1"])
        for r in a.join(
            b,
            (a["user_id"] == b["u_id"])
            & (F.col("u2") > F.col("u1"))
            & (F.col("u2") <= F.col("u1") + 30 * 60 * 1_000_000),
        ).collect()
    }
    assert got == ref
    assert got, "radius should produce at least one pair on smoke data"


def test_dedup_latest_one_row_per_user_and_is_max(spark):
    out = q_dedup_latest(spark, SF_SMOKE)
    e = load_table(spark, SF_SMOKE, "events")
    assert out.count() == e.select("user_id").distinct().count()
    # survivor ts is the per-user max
    mx = {
        r["user_id"]: r["m"]
        for r in e.groupBy("user_id")
        .agg(F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("m"))
        .collect()
    }
    for r in out.collect():
        assert r["ts"] == mx[r["user_id"]]
