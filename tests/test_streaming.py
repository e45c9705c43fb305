"""Structured Streaming mirrors equal batch results under no late data.

Writes the (us-normalized) events table into a temp dir inside the repo,
streams it back file-by-file, and compares complete-mode streaming output
against the batch builders on the same rows.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.sources.loader import load_table
from hive_similarity_join_spark.streaming.windows import (
    session_aggregates,
    stream_events,
    streaming_dedup,
    tumbling_counts,
)
from tests.conftest import SF_SMOKE

REPO_TMP = Path(__file__).resolve().parent / "_stream_tmp"


@pytest.fixture()
def events_dir(spark):
    REPO_TMP.mkdir(exist_ok=True)
    d = tempfile.mkdtemp(dir=REPO_TMP)
    # two files -> two micro-batches with maxFilesPerTrigger=1
    ev = load_table(spark, SF_SMOKE, "events")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(
        f"{d}/data"
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(
        f"{d}/data"
    )
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_complete(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_stream_equals_batch(spark, events_dir):
    stream = stream_events(spark, f"{events_dir}/data")
    got = _run_complete(spark, tumbling_counts(stream), "t_tumbling")
    ev = spark.read.parquet(f"{events_dir}/data")
    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "sum_value")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_session_stream_equals_batch(spark, events_dir):
    stream = stream_events(spark, f"{events_dir}/data")
    got = _run_complete(spark, session_aggregates(stream), "t_session")
    ev = spark.read.parquet(f"{events_dir}/data")
    want = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("user_id", F.col("w.start").alias("session_start"), "cnt")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_dedup_drops_in_horizon_dupes(spark, events_dir):
    # duplicate every row by appending the same data again
    ev = spark.read.parquet(f"{events_dir}/data")
    ev.coalesce(1).write.mode("append").parquet(f"{events_dir}/data")
    stream = stream_events(spark, f"{events_dir}/data", max_files_per_trigger=10)
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS c, count(DISTINCT event_id) AS d FROM t_dedup").collect()[0]
    assert got.c == got.d == ev.select("event_id").distinct().count()


def test_interval_join_stream_equals_batch_range_join(spark, events_dir):
    from hive_similarity_join_spark.streaming.windows import interval_join_streams

    stream = stream_events(spark, f"{events_dir}/data", max_files_per_trigger=10)
    joined = interval_join_streams(stream, stream, radius_minutes=30)
    q = (
        joined.writeStream.format("memory")
        .queryName("t_interval")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.id1, r.id2, r.gap_us)
        for r in spark.sql("SELECT * FROM t_interval").collect()
    }
    ev = spark.read.parquet(f"{events_dir}/data").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    a = ev.select("user_id", F.col("event_id").alias("id1"), F.col("us").alias("u1"))
    b = ev.select(
        F.col("user_id").alias("uid2"), F.col("event_id").alias("id2"),
        F.col("us").alias("u2"),
    )
    want = {
        (r.user_id, r.id1, r.id2, r.u2 - r.u1)
        for r in a.join(
            b,
            (a["user_id"] == b["uid2"])
            & (F.col("u2") > F.col("u1"))
            & (F.col("u2") <= F.col("u1") + 30 * 60 * 1_000_000),
        ).collect()
    }
    assert got == want and got
