"""Incremental funnel: the per-user carry folded over time-ordered
epochs must reproduce q_events_funnel's 4-row output exactly, and the
carry's chained mins must be set-once (never lowered by later data)."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.queries.events_q import q_events_funnel
from hive_similarity_join_spark.sources.loader import load_table
from hive_similarity_join_spark.streaming.incremental_funnel import (
    FUNNEL_CARRY_SCHEMA,
    emit_funnel,
    funnel_epoch,
    incremental_funnel,
)
from tests.conftest import SF_SMOKE

REPO_TMP = Path(__file__).resolve().parent / "_incfun_tmp"


@pytest.fixture()
def dirs(spark):
    REPO_TMP.mkdir(exist_ok=True)
    d = tempfile.mkdtemp(dir=REPO_TMP)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _tuples(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def _time_slices(spark, n=3):
    e = load_table(spark, SF_SMOKE, "events")
    qs = [i / n for i in range(1, n)]
    cuts = e.agg(
        *[
            F.expr(f"percentile_approx(unix_micros(ts), {q})").alias(f"c{i}")
            for i, q in enumerate(qs)
        ]
    ).collect()[0]
    bounds = [None, *cuts, None]
    out = []
    for i in range(n):
        sl = e
        if bounds[i] is not None:
            sl = sl.filter(F.unix_micros("ts") > bounds[i])
        if bounds[i + 1] is not None:
            sl = sl.filter(F.unix_micros("ts") <= bounds[i + 1])
        out.append(sl)
    return out


def test_epoch_chain_equals_batch_key(spark):
    carry = None
    for sl in _time_slices(spark):
        new = funnel_epoch(sl, carry)
        # materialize like the parquet carry does (freezes lineage)
        carry = spark.createDataFrame(new.collect(), new.schema)
    assert _tuples(emit_funnel(carry)) == _tuples(
        q_events_funnel(spark, SF_SMOKE)
    )


def test_chained_mins_are_set_once(spark):
    """Ordered arrival makes t0/t1/t2 monotone: folding a later slice
    can never change an already-set value."""
    s1, s2, _s3 = _time_slices(spark)
    c1 = spark.createDataFrame(funnel_epoch(s1, None).collect(), FUNNEL_CARRY_SCHEMA)
    c2 = spark.createDataFrame(
        funnel_epoch(s2, c1).collect(), FUNNEL_CARRY_SCHEMA
    )
    before = {r.user_id: (r.t0, r.t1, r.t2) for r in c1.collect()}
    after = {r.user_id: (r.t0, r.t1, r.t2) for r in c2.collect()}
    for uid, vals in before.items():
        for i, v in enumerate(vals):
            if v is not None:
                assert after[uid][i] == v, (uid, i)


def test_streaming_funnel_matches_batch_key(spark, dirs):
    events = load_table(spark, SF_SMOKE, "events")
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
    from hive_similarity_join_spark.sources.loader import SCHEMAS

    stream = (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_funnel(
        stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(120)
    final = sorted(Path(f"{dirs}/state/summary").glob("epoch_*"))[-1]
    carry = spark.read.schema(FUNNEL_CARRY_SCHEMA).parquet(str(final))
    assert _tuples(emit_funnel(carry)) == _tuples(
        q_events_funnel(spark, SF_SMOKE)
    )
