"""merge_into: SQL MERGE semantics — update/insert/delete/keep, with
null value columns as legal data."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from hive_similarity_join_spark.operators.merge import merge_into


def test_all_four_action_paths(spark):
    target = spark.createDataFrame(
        [
            Row(k=1, v=10.0, s="a"),   # updated
            Row(k=2, v=20.0, s="b"),   # deleted
            Row(k=3, v=30.0, s="c"),   # kept
            Row(k=4, v=None, s="d"),   # kept, null value col
        ]
    )
    source = spark.createDataFrame(
        [
            Row(k=1, v=11.0, s="U"),
            Row(k=2, v=20.0, s="D"),
            Row(k=5, v=50.0, s="N"),   # inserted
            Row(k=6, v=None, s="N"),   # inserted with null value col
        ]
    )
    got = {
        r.k: (r.v, r.s, r.action)
        for r in merge_into(
            target,
            source,
            key="k",
            value_cols=["v", "s"],
            delete_cond=F.col("_src_s") == "D",
            action_col="action",
        ).collect()
    }
    assert got == {
        1: (11.0, "U", "update"),
        3: (30.0, "c", "keep"),
        4: (None, "d", "keep"),
        5: (50.0, "N", "insert"),
        6: (None, "N", "insert"),
    }


def test_null_delete_cond_falls_through_to_update(spark):
    """SQL MERGE: a WHEN MATCHED AND <cond> whose condition evaluates
    to NULL is NOT satisfied — the matched row must fall through to
    UPDATE, not be silently deleted (three-valued logic in the filter
    would otherwise drop it)."""
    target = spark.createDataFrame([Row(k=1, v=10.0, s="a")])
    source = spark.createDataFrame(
        [Row(k=1, v=11.0, s=None)], schema="k bigint, v double, s string"
    )
    got = {
        r.k: (r.v, r.s, r.action)
        for r in merge_into(
            target,
            source,
            key="k",
            value_cols=["v", "s"],
            delete_cond=F.col("_src_s") == "D",  # NULL = "D" -> NULL
            action_col="action",
        ).collect()
    }
    assert got == {1: (11.0, None, "update")}


def test_no_delete_cond_and_no_action_col(spark):
    target = spark.createDataFrame([Row(k=1, v=1.0)])
    source = spark.createDataFrame([Row(k=1, v=2.0), Row(k=2, v=3.0)])
    out = merge_into(target, source, key="k", value_cols=["v"])
    assert out.columns == ["k", "v"]
    assert {(r.k, r.v) for r in out.collect()} == {(1, 2.0), (2, 3.0)}
