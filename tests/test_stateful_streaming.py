"""applyInPandasWithState running totals: the last update per user over
a multi-micro-batch stream equals the batch groupBy aggregate."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.sources.loader import load_table
from hive_similarity_join_spark.streaming.stateful import running_user_totals
from hive_similarity_join_spark.streaming.windows import stream_events
from tests.conftest import SF_SMOKE

REPO_TMP = Path(__file__).resolve().parent / "_stateful_tmp"


@pytest.fixture()
def events_dir(spark):
    REPO_TMP.mkdir(exist_ok=True)
    d = tempfile.mkdtemp(dir=REPO_TMP)
    ev = load_table(spark, SF_SMOKE, "events")
    # two files -> two micro-batches with maxFilesPerTrigger=1, so state
    # genuinely carries across batches
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(
        f"{d}/data"
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(
        f"{d}/data"
    )
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_running_totals_converge_to_batch(spark, events_dir):
    stream = stream_events(spark, f"{events_dir}/data")
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_running")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode appends one row per (user, micro-batch touching it);
    # the max n_events row per user is the final state
    got = spark.sql(
        """
        SELECT user_id, max_by(total_value, n_events) AS total_value,
               max(n_events) AS n_events
        FROM t_running GROUP BY user_id
        """
    )
    ev = spark.read.parquet(f"{events_dir}/data")
    want = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value")
    )
    g = {r.user_id: (r.n_events, r.total_value) for r in got.collect()}
    w = {r.user_id: (r.n_events, r.total_value) for r in want.collect()}
    assert set(g) == set(w)
    for uid in w:
        assert g[uid][0] == w[uid][0]
        assert g[uid][1] == pytest.approx(w[uid][1], rel=1e-9)


def test_tws_running_totals_converge_to_batch(spark, events_dir):
    """The transformWithStateInPandas twin must agree with both the
    applyInPandasWithState operator and the batch aggregate."""
    from hive_similarity_join_spark.streaming.stateful import (
        running_user_totals_tws,
    )

    if running_user_totals_tws is None:
        pytest.skip("Spark < 4.0: transformWithState unavailable")
    # the transformWithState state-server protocol needs the protobuf
    # python package at RUNTIME (worker side); absent here -> skip
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable: transformWithState "
                    "state server cannot start in this environment")
    stream = stream_events(spark, f"{events_dir}/data")
    q = (
        running_user_totals_tws(stream)
        .writeStream.format("memory")
        .queryName("t_tws")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        """
        SELECT user_id, max_by(total_value, n_events) AS total_value,
               max(n_events) AS n_events
        FROM t_tws GROUP BY user_id
        """
    )
    ev = spark.read.parquet(f"{events_dir}/data")
    want = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value")
    )
    g = {r.user_id: (r.n_events, r.total_value) for r in got.collect()}
    w = {r.user_id: (r.n_events, r.total_value) for r in want.collect()}
    assert set(g) == set(w)
    for uid in w:
        assert g[uid][0] == w[uid][0]
        assert g[uid][1] == pytest.approx(w[uid][1], rel=1e-9)
