"""Incremental CUSUM: the multi-epoch carry must be IDENTICAL (exact
decimal state, not merely close) to the single-shot closed form, and
the closed form itself must match the textbook recursion."""

from __future__ import annotations

import shutil
import tempfile
from decimal import Decimal
from fractions import Fraction
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.sources.loader import load_table
from hive_similarity_join_spark.streaming.incremental_cusum import (
    _CARRY_SCHEMA,
    incremental_cusum,
    process_epoch,
)
from tests.conftest import SF_SMOKE

MU0 = Decimal("50.000000")

REPO_TMP = Path(__file__).resolve().parent / "_inccusum_tmp"


@pytest.fixture()
def dirs(spark):
    REPO_TMP.mkdir(exist_ok=True)
    d = tempfile.mkdtemp(dir=REPO_TMP)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _readings(spark):
    e = load_table(spark, SF_SMOKE, "events")
    return e.filter(F.col("ts").isNotNull()).select(
        F.col("event_type").alias("key"),
        F.col("ts").alias("tsu"),
        F.col("event_id").cast("bigint").alias("uid"),
        F.col("value").cast("decimal(18,6)").alias("x"),
    )


def _state_tuples(df):
    return sorted(
        (r.key, r.p, r.rmin, r.rmax, r.s_pos_max, r.s_neg_max,
         str(r.cp_ts), r.n)
        for r in df.collect()
    )


def test_single_shot_matches_textbook_recursion(spark):
    got = {r.key: r for r in process_epoch(_readings(spark), None, MU0).collect()}
    rows = sorted(_readings(spark).collect(), key=lambda r: (r.tsu, r.uid))
    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r.key, []).append(r)
    assert set(got) == set(by_key)
    for k, rs in by_key.items():
        s_pos = s_neg = best_pos = best_neg = Fraction(0)
        best_ts = None
        for r in rs:
            d = Fraction(r.x) - Fraction(MU0)
            s_pos = max(Fraction(0), s_pos + d)
            s_neg = max(Fraction(0), s_neg - d)
            if best_ts is None or s_pos > best_pos:
                best_pos, best_ts = s_pos, r.tsu
            best_neg = max(best_neg, s_neg)
        g = got[k]
        assert Fraction(g.s_pos_max) == best_pos, k
        assert Fraction(g.s_neg_max) == best_neg, k
        assert g.cp_ts == best_ts, k
        assert g.n == len(rs), k


def test_epoch_chain_is_exactly_single_shot(spark):
    """Three sequential epochs (ordered-arrival split by time) chained
    through process_epoch must land on the IDENTICAL decimal state."""
    r = _readings(spark)
    t1, t2 = r.select(
        F.expr("percentile_approx(unix_micros(tsu), array(0.33, 0.66))").alias("q")
    ).collect()[0].q
    e1 = r.filter(F.unix_micros("tsu") <= t1)
    e2 = r.filter((F.unix_micros("tsu") > t1) & (F.unix_micros("tsu") <= t2))
    e3 = r.filter(F.unix_micros("tsu") > t2)
    assert e1.count() and e2.count() and e3.count()
    c = process_epoch(e1, None, MU0)
    c = process_epoch(e2, c, MU0)
    c = process_epoch(e3, c, MU0)
    assert _state_tuples(c) == _state_tuples(process_epoch(r, None, MU0))


def test_streaming_query_matches_single_shot(spark, dirs):
    """End-to-end through foreachBatch + the versioned carry contract:
    files arrive one per micro-batch; the final summary snapshot must
    equal the single-shot state."""
    src = f"{dirs}/src"
    r = _readings(spark)
    med = r.select(
        F.expr("percentile_approx(unix_micros(tsu), 0.5)")
    ).collect()[0][0]
    r.filter(F.unix_micros("tsu") <= med).coalesce(1).write.parquet(
        f"{src}/part=0"
    )
    r.filter(F.unix_micros("tsu") > med).coalesce(1).write.parquet(
        f"{src}/part=1"
    )
    # FileStreamSource orders files by MODIFICATION TIME; on a
    # coarse-mtime filesystem both writes can land in one granule and
    # part=1 could be picked first, breaking the ordered-arrival
    # contract the CUSUM carry depends on. Force strictly increasing
    # mtimes so epoch order is deterministic.
    import os
    import time

    now = time.time()
    for i, part in enumerate(("part=0", "part=1")):
        for f in Path(f"{src}/{part}").glob("*.parquet"):
            os.utime(f, (now + 10 * i, now + 10 * i))
    stream = (
        spark.readStream.schema(r.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part=*")
    )
    q = incremental_cusum(
        stream, f"{dirs}/state", MU0, checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(120)
    final = sorted(Path(f"{dirs}/state/summary").glob("epoch_*"))[-1]
    got = spark.read.schema(_CARRY_SCHEMA).parquet(str(final))
    assert _state_tuples(got) == _state_tuples(
        process_epoch(r, None, MU0)
    )
