"""Incremental CMS: the streamed counter table must equal the batch
build exactly (mergeability), across multiple micro-batches."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.functions import text as TX
from hive_similarity_join_spark.operators import cms
from hive_similarity_join_spark.sources.loader import SCHEMAS, load_table
from hive_similarity_join_spark.streaming.incremental_cms import (
    incremental_cms,
    update_counters,
)
from tests.conftest import SF_SMOKE

REPO_TMP = Path(__file__).resolve().parent / "_inccms_tmp"


@pytest.fixture()
def dirs(spark):
    REPO_TMP.mkdir(exist_ok=True)
    d = tempfile.mkdtemp(dir=REPO_TMP)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batch_counters(docs):
    tc = (
        docs.select(F.explode(TX.bag_tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return cms.counters_from_token_counts(tc)


def _cells(df):
    return sorted((int(r.r), int(r.b), int(r.cnt)) for r in df.collect())


def test_update_core_is_mergeable(spark):
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 300)
    a = docs.filter(F.col("doc_id") < 150)
    b = docs.filter(F.col("doc_id") >= 150)
    first = update_counters(a, [], TX.bag_tokens("text"))
    merged = update_counters(b, first.collect(), TX.bag_tokens("text"))
    assert _cells(merged) == _cells(_batch_counters(docs))


def test_estimate_unseen_token_is_zero_not_dropped(spark):
    """A probe token never folded into the sketch must estimate the
    mass of its (possibly empty) buckets — 0 when all are empty — not
    vanish from the output or min over only non-empty cells."""
    from pyspark.sql import Row

    tc = spark.createDataFrame([Row(tok="seen", n=7)])
    counters = cms.counters_from_token_counts(tc)
    probes = spark.createDataFrame(
        [Row(tok="seen"), Row(tok="never-in-the-stream")]
    )
    got = {r.tok: r.n_cms for r in cms.estimate(counters, probes).collect()}
    assert got["seen"] == 7
    assert got["never-in-the-stream"] == 0


def test_streaming_counters_equal_batch_build(spark, dirs):
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 300)
    src = f"{dirs}/incoming"
    docs.filter(F.col("doc_id") < 150).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    docs.filter(F.col("doc_id") >= 150).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(SCHEMAS["documents"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_cms(
        stream,
        f"{dirs}/counters",
        TX.bag_tokens("text"),
        checkpoint_dir=f"{dirs}/ckpt",
    )
    q.awaitTermination(180)

    from hive_similarity_join_spark.streaming.state import carry_versions

    got = spark.read.parquet(carry_versions(f"{dirs}/counters")[-1])
    assert _cells(got) == _cells(_batch_counters(docs))
    # state stays sketch-sized
    assert got.count() <= cms.CMS_D * cms.CMS_W
