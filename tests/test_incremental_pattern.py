"""Incremental CEP: per-epoch matches across micro-batch boundaries
must union to exactly the batch key's matches under ordered arrival."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.queries.events_q import q_events_pattern
from hive_similarity_join_spark.sources.loader import SCHEMAS, load_table
from hive_similarity_join_spark.streaming.incremental_pattern import (
    incremental_pattern,
    process_epoch,
)
from tests.conftest import SF_SMOKE

REPO_TMP = Path(__file__).resolve().parent / "_incpat_tmp"


@pytest.fixture()
def dirs(spark):
    REPO_TMP.mkdir(exist_ok=True)
    d = tempfile.mkdtemp(dir=REPO_TMP)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _match_set(df):
    return sorted(
        (r.user_id, r.start_event, r.mid_event, r.end_event, r.span_us)
        for r in df.collect()
    )


def test_epoch_core_completes_boundary_triples(spark):
    """A triple split 2|1 across epochs must be found by epoch 2 via
    the carried tail, and never double-counted."""
    e = load_table(spark, SF_SMOKE, "events").orderBy("ts", "event_id")
    want = _match_set(q_events_pattern(spark, SF_SMOKE))
    assert want, "fixture must contain matches"
    # split the log by time into two epochs at the median event
    n = e.count()
    ts_cut = e.limit(n // 2).agg(F.max("ts")).collect()[0][0]
    first = e.filter(F.col("ts") <= ts_cut)
    second = e.filter(F.col("ts") > ts_cut)
    m1, carry, _sh1 = process_epoch(first, None)
    carry = spark.createDataFrame(carry.collect(), carry.schema)
    m2, _, _sh2 = process_epoch(second, carry)
    got = sorted(_match_set(m1) + _match_set(m2))
    assert got == want


def test_streaming_matches_equal_batch_key(spark, dirs):
    events = load_table(spark, SF_SMOKE, "events")
    # ordered arrival: two time-sliced files
    ts_cut = events.agg(
        F.expr("percentile_approx(unix_micros(ts), 0.5)")
    ).collect()[0][0]
    src = f"{dirs}/incoming"
    events.filter(F.unix_micros("ts") <= ts_cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    events.filter(F.unix_micros("ts") > ts_cut).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_pattern(
        stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(180)

    got = _match_set(
        spark.read.option("recursiveFileLookup", "true").parquet(
            f"{dirs}/state/matches"
        )
    )
    want = _match_set(q_events_pattern(spark, SF_SMOKE))
    assert got == want
    from hive_similarity_join_spark.streaming.state import (
        carry_versions,
    )

    versions = carry_versions(f"{dirs}/state")
    # versioned carry dirs: storage bounded at <= 2 versions, and the
    # LATEST version holds the per-user tail
    assert 1 <= len(versions) <= 2
    carry = spark.read.parquet(versions[-1])
    n_users = events.select("user_id").distinct().count()
    assert carry.count() <= 2 * n_users
