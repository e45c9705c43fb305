"""Incremental winnowing mirror (streaming/incremental_winnowing) —
pinned BIT-equal to q_dedup_winnowing for any-order epoch chains, a
replayed epoch through the RAW merge, and a real availableNow stream.

Also pins the doc-locality claim that licenses the carry: per-slice
fingerprints accumulated over id-hash epochs equal the batch corpus
fingerprints exactly (no corpus statistic anywhere in the sketch)."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.sources.loader import load_table
from hive_similarity_join_spark.streaming.incremental_winnowing import (
    WINNOW_FP_SCHEMA,
    emit_winnow_pairs,
    incremental_winnowing,
    merge_winnow,
    winnow_fp_partials,
)
from tests.conftest import SF_SMOKE

REPO_TMP = Path(__file__).resolve().parent / "_incwinnow_tmp"


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
    from hive_similarity_join_spark.queries.dedup_q import q_dedup_winnowing

    return _tuples(q_dedup_winnowing(spark, SF_SMOKE))


def test_fingerprints_are_doc_local(spark):
    from hive_similarity_join_spark.queries.dedup_q import (
        winnow_fingerprints,
    )

    d = _docs(spark)
    want = _tuples(winnow_fingerprints(d))
    slices = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    got = None
    for sl in [slices[1], slices[2], slices[0]]:
        got = merge_winnow(got, winnow_fp_partials(sl))
    assert _tuples(got) == want


def test_winnow_epoch_chain_equals_batch_key(spark):
    d = _docs(spark)
    want = _want(spark)
    slices = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    carry = None
    for sl in [slices[2], slices[0], slices[1]]:
        carry = merge_winnow(carry, winnow_fp_partials(sl))
    assert _tuples(emit_winnow_pairs(carry)) == want
    # replay through the RAW merge — harmless (keyed idempotent rows)
    carry = merge_winnow(carry, winnow_fp_partials(slices[0]))
    assert _tuples(emit_winnow_pairs(carry)) == want


def test_streaming_winnow_matches_batch_key(spark, dirs):
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
    q = incremental_winnowing(
        stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(180)
    final = sorted(Path(f"{dirs}/state/summary/fp").glob("epoch_*"))[-1]
    carry = spark.read.schema(WINNOW_FP_SCHEMA).parquet(str(final))
    assert _tuples(emit_winnow_pairs(carry)) == _want(spark)
