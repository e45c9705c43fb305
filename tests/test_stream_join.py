"""Native stream-stream interval join equals the batch join of the same
rows (no late data, availableNow drain). Complements the foreachBatch
mirrors: this one exercises Spark's own StreamingSymmetricHashJoin
operator — two watermarked unbounded sides, append-mode output."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.sources.loader import load_table
from hive_similarity_join_spark.streaming.stream_join import (
    interval_join_clicks_purchases,
)
from hive_similarity_join_spark.streaming.windows import stream_events
from tests.conftest import SF_SMOKE

REPO_TMP = Path(__file__).resolve().parent / "_sjoin_tmp"


@pytest.fixture()
def events_dir(spark):
    REPO_TMP.mkdir(exist_ok=True)
    d = tempfile.mkdtemp(dir=REPO_TMP)
    ev = load_table(spark, SF_SMOKE, "events")
    # Split by event id parity so clicks and their purchases straddle
    # micro-batches — the join must pair rows across triggers, which
    # only works if the engine actually keeps both sides' state.
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/data")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(f"{d}/data")
    yield d
    shutil.rmtree(d, ignore_errors=True)
    try:
        REPO_TMP.rmdir()  # only when no sibling tmp dirs remain
    except OSError:
        pass


def _rows(df):
    return sorted(
        (int(r.user_id), int(r.click_id), int(r.purchase_id), int(r.gap_us))
        for r in df.collect()
    )


def test_interval_join_stream_equals_batch(spark, events_dir):
    stream = stream_events(spark, f"{events_dir}/data")
    q = (
        interval_join_clicks_purchases(stream)
        .writeStream.format("memory")
        .queryName("t_sjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM t_sjoin")

    ev = spark.read.parquet(f"{events_dir}/data")
    want = interval_join_clicks_purchases(ev)
    assert _rows(got) == _rows(want)
    assert len(_rows(want)) > 0  # non-vacuous: pairs exist in sf0.001


def test_interval_join_is_a_real_stream_stream_join(spark, events_dir):
    """The physical streaming plan must contain the symmetric hash join
    state operator (not a collapsed batch join): the state-bounding
    claim in the module docstring rests on it."""
    stream = stream_events(spark, f"{events_dir}/data")
    j = interval_join_clicks_purchases(stream)
    assert j.isStreaming
    q = (
        j.writeStream.format("memory")
        .queryName("t_sjoin_plan")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # lastProgress carries the executed plan's operator metrics; the
    # symmetric-hash-join state operator reports its own row counts
    progress = q.lastProgress
    ops = (progress or {}).get("stateOperators", [])
    assert any(
        "symmetricHashJoin" in (op.get("operatorName") or "") for op in ops
    ), f"no stream-stream join state operator in progress: {ops}"
