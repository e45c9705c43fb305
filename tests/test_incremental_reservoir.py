"""Incremental reservoir-sample mirror (streaming/incremental_reservoir)
— pinned BIT-equal to q_sample_reservoir for any-order epoch chains, a
real availableNow stream, AND raw whole-slice replay (bottom-K over
distinct rows is set-union idempotent, stronger than the sum-carrying
mirrors' versioned-carry guarantee — the module docstring's claim,
asserted here)."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.sources.loader import load_table
from hive_similarity_join_spark.streaming.incremental_reservoir import (
    RESERVOIR_CARRY_SCHEMA,
    emit_reservoir,
    incremental_reservoir,
    merge_reservoir,
    reservoir_partials,
)
from tests.conftest import SF_SMOKE

REPO_TMP = Path(__file__).resolve().parent / "_incres_tmp"


@pytest.fixture()
def dirs(spark):
    REPO_TMP.mkdir(exist_ok=True)
    d = tempfile.mkdtemp(dir=REPO_TMP)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def _tuples(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def _want(spark):
    from hive_similarity_join_spark.queries.pipeline_q import (
        q_sample_reservoir,
    )

    return _tuples(q_sample_reservoir(spark, SF_SMOKE))


def test_reservoir_epoch_chain_equals_batch_key(spark):
    """Any epoch order reproduces the batch sample bit-identically:
    bottom-K of bottom-Ks over any slicing is the global bottom-K."""
    d = _docs(spark)
    slices = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    carry = None
    for sl in [slices[2], slices[0], slices[1]]:
        carry = merge_reservoir(carry, reservoir_partials(sl))
    assert _tuples(emit_reservoir(carry)) == _want(spark)


def test_reservoir_replay_idempotent(spark):
    """Re-delivering a whole slice (no epoch guard involved) leaves
    the carry unchanged — set-union semantics of the dedup+re-rank."""
    d = _docs(spark)
    slices = [d.filter(F.col("doc_id") % 2 == i) for i in range(2)]
    carry = None
    for sl in [slices[0], slices[1], slices[0], slices[0]]:
        carry = merge_reservoir(carry, reservoir_partials(sl))
    assert _tuples(emit_reservoir(carry)) == _want(spark)


def test_streaming_reservoir_matches_batch_key(spark, dirs):
    d = _docs(spark)
    src = f"{dirs}/src"
    for i in range(2):
        d.filter(F.col("doc_id") % 2 == i).coalesce(1).write.parquet(
            f"{src}/part={i}"
        )
    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part=*")
    )
    q = incremental_reservoir(
        stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(120)
    final = sorted(Path(f"{dirs}/state/summary").glob("epoch_*"))[-1]
    carry = spark.read.schema(RESERVOIR_CARRY_SCHEMA).parquet(str(final))
    assert _tuples(emit_reservoir(carry)) == _want(spark)
