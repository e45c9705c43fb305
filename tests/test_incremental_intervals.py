"""Incremental interval consolidation: per-epoch closed islands plus
the final open carry must union to exactly the batch key's islands
under ordered arrival."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.queries.relational_q import q_intervals_merge
from hive_similarity_join_spark.sources.loader import load_table
from hive_similarity_join_spark.streaming.incremental_intervals import (
    _CARRY_SCHEMA,
    incremental_intervals,
    process_epoch,
)
from tests.conftest import SF_SMOKE

REPO_TMP = Path(__file__).resolve().parent / "_incint_tmp"


@pytest.fixture()
def dirs(spark):
    REPO_TMP.mkdir(exist_ok=True)
    d = tempfile.mkdtemp(dir=REPO_TMP)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _intervals(spark):
    """The SAME fulfillment-window relation q_intervals_merge builds:
    (key, start, end, uid) from orders x lineitem."""
    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_custkey", "o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("_ms"))
        .select(
            F.col("o_custkey").alias("key"),
            F.col("o_orderdate").alias("start"),
            F.greatest("_ms", "o_orderdate").alias("end"),
            F.col("o_orderkey").alias("uid"),
        )
    )


def _island_set(df):
    return sorted(
        (r.key, r.island_id, str(r.start), str(r.end), r.n)
        for r in df.collect()
    )


def _batch_key_set(spark):
    return sorted(
        (r.o_custkey, r.island_id, r.start_date, r.end_date, r.n_orders)
        for r in q_intervals_merge(spark, SF_SMOKE).collect()
    )


def test_single_shot_core_equals_batch_key(spark):
    """process_epoch with no carry IS the batch islands computation —
    closed + carry must reproduce q_intervals_merge exactly."""
    closed, carry, _sh = process_epoch(_intervals(spark), None)
    got = sorted(_island_set(closed) + _island_set(carry))
    assert got == _batch_key_set(spark) and got


def test_epoch_core_merges_across_boundary(spark):
    """Islands that straddle the epoch cut must be completed by the
    carry, with globally consistent island numbering and counts."""
    iv = _intervals(spark)
    cut = iv.agg(
        F.expr("percentile_approx(unix_micros(CAST(start AS TIMESTAMP)), 0.5)")
    ).collect()[0][0]
    first = iv.filter(F.unix_micros(F.col("start").cast("timestamp")) <= cut)
    second = iv.filter(F.unix_micros(F.col("start").cast("timestamp")) > cut)
    c1, carry, _sh1 = process_epoch(first, None)
    carry = spark.createDataFrame(carry.collect(), _CARRY_SCHEMA)
    c2, open_final, _sh2 = process_epoch(second, carry)
    got = sorted(
        _island_set(c1) + _island_set(c2) + _island_set(open_final)
    )
    assert got == _batch_key_set(spark)
    # non-vacuous: the cut must actually split at least one island
    assert any(
        r.n > 1 for r in open_final.collect()
    ) or len(_island_set(c2)) != len(_batch_key_set(spark))


def test_streaming_islands_equal_batch_key(spark, dirs):
    iv = _intervals(spark)
    cut = iv.agg(
        F.expr("percentile_approx(unix_micros(CAST(start AS TIMESTAMP)), 0.5)")
    ).collect()[0][0]
    src = f"{dirs}/incoming"
    # ordered arrival: two start-time-sliced files
    iv.filter(F.unix_micros(F.col("start").cast("timestamp")) <= cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    iv.filter(F.unix_micros(F.col("start").cast("timestamp")) > cut).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(iv.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_intervals(
        stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(180)

    closed = (
        spark.read.schema(_CARRY_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(f"{dirs}/state/islands")
    )
    from hive_similarity_join_spark.streaming.state import carry_versions

    carry_dirs = carry_versions(f"{dirs}/state")
    carry = spark.read.schema(_CARRY_SCHEMA).parquet(carry_dirs[-1])
    got = sorted(_island_set(closed) + _island_set(carry))
    assert got == _batch_key_set(spark)
    # versioned-carry layout: at most two versions retained
    assert 1 <= len(carry_dirs) <= 2
