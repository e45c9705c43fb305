"""Streaming SCD2: the closed intervals emitted across time-ordered
micro-batches equal the batch q_scd2_history's closed rows."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.sources.loader import load_table
from hive_similarity_join_spark.streaming.incremental_scd2 import (
    scd2_closed_intervals,
)
from hive_similarity_join_spark.streaming.windows import stream_events
from tests.conftest import SF_SMOKE

REPO_TMP = Path(__file__).resolve().parent / "_scd2_tmp"


@pytest.fixture()
def ordered_events_dir(spark):
    """Two parquet files split at the median ts — time-ordered
    micro-batches (the operator's stated ingestion contract), with
    state genuinely carrying intervals across the batch boundary."""
    REPO_TMP.mkdir(exist_ok=True)
    d = tempfile.mkdtemp(dir=REPO_TMP)
    ev = load_table(spark, SF_SMOKE, "events")
    cut = ev.agg(
        F.expr("percentile_approx(CAST(ts AS DOUBLE), 0.5)")
    ).collect()[0][0]
    ev.filter(F.col("ts").cast("double") <= cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/data")
    ev.filter(F.col("ts").cast("double") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(f"{d}/data")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streamed_closed_intervals_equal_batch(spark, ordered_events_dir):
    from hive_similarity_join_spark.queries.pipeline_q import q_scd2_history

    stream = stream_events(spark, f"{ordered_events_dir}/data")
    q = (
        scd2_closed_intervals(stream)
        .writeStream.format("memory")
        .queryName("t_scd2")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.event_type, r.valid_from, r.valid_to, r.version)
        for r in spark.sql("SELECT * FROM t_scd2").collect()
    }
    want = {
        (r.user_id, r.event_type, r.valid_from, r.valid_to, r.version)
        for r in q_scd2_history(spark, SF_SMOKE)
        .filter(F.col("valid_to").isNotNull())
        .collect()
    }
    assert got == want
    # closed rows are final: every emitted row carries is_current = 0
    flags = {r.is_current for r in spark.sql("SELECT * FROM t_scd2").collect()}
    assert flags <= {0}
