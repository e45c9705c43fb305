"""grouped_prefix_scan: the two-pass distributed scan must equal the
single-window running aggregate row-for-row on a strict total order."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hive_similarity_join_spark.operators.scan import grouped_prefix_scan
from hive_similarity_join_spark.sources.loader import load_table
from tests.conftest import SF_SMOKE


def _base(spark):
    e = load_table(spark, SF_SMOKE, "events").filter(F.col("ts").isNotNull())
    return e.select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )


def _rows(df):
    return sorted(
        tuple(r) for r in df.select(
            "event_type", "event_id", "run_sum", "run_min", "run_max"
        ).collect()
    )


def test_scan_equals_single_window_reference(spark):
    d = _base(spark)
    got = grouped_prefix_scan(
        d,
        ["event_type"],
        ["us", "event_id"],
        [
            ("cents", "sum", "run_sum"),
            ("cents", "min", "run_min"),
            ("cents", "max", "run_max"),
        ],
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = d.select(
        "event_type",
        "event_id",
        F.sum("cents").over(w).alias("run_sum"),
        F.min("cents").over(w).alias("run_min"),
        F.max("cents").over(w).alias("run_max"),
    )
    assert _rows(got) == _rows(want)


def test_scan_spans_many_partitions(spark):
    """The point of the operator: a single group's scan must spread
    over MULTIPLE range partitions (a per-group serial sort would put
    each group in exactly one). AQE legitimately coalesces the tiny
    smoke slice to a handful of partitions — the invariant is >1 task
    for one group, and full width follows at real data volume."""
    d = _base(spark).filter(F.col("event_type") == "click")
    ranged = (
        d.repartitionByRange(
            spark.sparkContext.defaultParallelism, "event_type", "us", "event_id"
        )
        .withColumn("pid", F.spark_partition_id())
    )
    assert ranged.select("pid").distinct().count() > 1


def test_scan_compound_group_key(spark):
    d = _base(spark).withColumn("half", (F.col("event_id") % 2))
    got = grouped_prefix_scan(
        d,
        ["event_type", "half"],
        ["us", "event_id"],
        [("cents", "sum", "run_sum")],
    )
    w = (
        Window.partitionBy("event_type", "half")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = d.select(
        "event_type", "event_id", F.sum("cents").over(w).alias("run_sum")
    )
    a = sorted(tuple(r) for r in got.select("event_type", "event_id", "run_sum").collect())
    b = sorted(tuple(r) for r in want.collect())
    assert a == b
