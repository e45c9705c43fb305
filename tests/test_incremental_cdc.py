"""Incremental CDC-compaction mirror (streaming/incremental_cdc) —
pinned BIT-equal to q_cdc_compact for any-order epoch chains and a
real availableNow stream. Also pins the tombstone-revival semantics
the module docstring claims: a delete only wins while newest, and a
newer upsert revives the key — on literals, out of order.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.sources.loader import load_table
from hive_similarity_join_spark.streaming.incremental_cdc import (
    CDC_CARRY_SCHEMA,
    cdc_partials,
    emit_cdc,
    incremental_cdc,
    merge_cdc,
)
from tests.conftest import SF_SMOKE

REPO_TMP = Path(__file__).resolve().parent / "_inccdc_tmp"


@pytest.fixture()
def dirs(spark):
    REPO_TMP.mkdir(exist_ok=True)
    d = tempfile.mkdtemp(dir=REPO_TMP)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events(spark):
    return load_table(spark, SF_SMOKE, "events")


def _tuples(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def _want(spark):
    from hive_similarity_join_spark.queries.pipeline_q import q_cdc_compact

    return _tuples(q_cdc_compact(spark, SF_SMOKE))


def test_cdc_epoch_chain_equals_batch_key(spark):
    """Any epoch order reproduces the batch compacted snapshot
    bit-identically: latest-record is a max over a strict total
    order (max of maxes = global max), churn counts are sums."""
    e = _events(spark)
    slices = [e.filter(F.col("event_id") % 3 == i) for i in range(3)]
    carry = None
    for sl in [slices[2], slices[0], slices[1]]:
        carry = merge_cdc(carry, cdc_partials(sl))
    assert _tuples(emit_cdc(carry)) == _want(spark)


def test_cdc_tombstone_revival_semantics(spark):
    """Deletes stay in the carry (emit-time filtering): an
    out-of-order late UPSERT older than the tombstone must NOT
    resurrect the key, and a newer upsert must revive it."""
    import datetime as dt

    def ev(eid, us, etype, val):
        return (
            eid,
            dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=us),
            7,
            etype,
            float(val),
        )

    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    e1 = spark.createDataFrame([ev(1, 0, "view", 1.0)], schema)
    e2 = spark.createDataFrame([ev(2, 10, "error", 2.0)], schema)  # tombstone
    e3 = spark.createDataFrame([ev(3, 20, "click", 3.0)], schema)  # revival

    # tombstone newest: key invisible, even with the older upsert late
    carry = merge_cdc(None, cdc_partials(e2))
    carry = merge_cdc(carry, cdc_partials(e1))  # late, older than delete
    assert _tuples(emit_cdc(carry)) == []
    # newer upsert arrives: key revives with full churn history
    carry = merge_cdc(carry, cdc_partials(e3))
    got = [(r.user_id, r.value, r.n_changes, r.n_deletes)
           for r in emit_cdc(carry).collect()]
    assert got == [(7, 3.0, 3, 1)]


def test_streaming_cdc_matches_batch_key(spark, dirs):
    e = _events(spark)
    src = f"{dirs}/src"
    for i in range(2):
        e.filter(F.col("event_id") % 2 == i).coalesce(1).write.parquet(
            f"{src}/part={i}"
        )
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part=*")
    )
    q = incremental_cdc(
        stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(120)
    final = sorted(Path(f"{dirs}/state/summary").glob("epoch_*"))[-1]
    carry = spark.read.schema(CDC_CARRY_SCHEMA).parquet(str(final))
    assert _tuples(emit_cdc(carry)) == _want(spark)
