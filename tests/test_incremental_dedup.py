"""Incremental streaming dedup: cross-batch duplicates are dropped,
novel docs accumulate, and the final corpus is internally dup-free."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.operators.similarity import similarity_join
from hive_similarity_join_spark.sources.loader import SCHEMAS, load_table
from hive_similarity_join_spark.streaming.incremental_dedup import (
    dedup_batch_against_corpus,
    incremental_near_dedup,
)
from tests.conftest import SF_SMOKE

REPO_TMP = Path(__file__).resolve().parent / "_incdedup_tmp"
T = 0.9


@pytest.fixture()
def dirs(spark):
    REPO_TMP.mkdir(exist_ok=True)
    d = tempfile.mkdtemp(dir=REPO_TMP)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_batch_core_drops_corpus_matches(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(200)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs  # half of it duplicates the corpus exactly
    novel = dedup_batch_against_corpus(batch, corpus, threshold=T)
    ids = {r.doc_id for r in novel.select("doc_id").collect()}
    # every even doc matches itself in the corpus -> only odds can
    # survive (odds that near-dup an even doc or a lower odd also drop)
    assert ids and all(i % 2 == 1 for i in ids)


def test_streaming_corpus_ends_up_dup_free(spark, dirs):
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 300)
    src = f"{dirs}/incoming"
    # two overlapping batches: batch 2 re-sends some of batch 1's docs
    # under the same ids plus fresh ones
    docs.filter(F.col("doc_id") < 200).coalesce(1).write.mode("overwrite").parquet(src)
    docs.filter(F.col("doc_id") >= 100).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SCHEMAS["documents"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    corpus_dir = f"{dirs}/corpus"
    q = incremental_near_dedup(
        stream, corpus_dir, threshold=T, checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(180)

    corpus = spark.read.option("recursiveFileLookup", "true").parquet(
        corpus_dir
    )
    # no surviving near-dup pair inside the admitted corpus
    leftover = similarity_join(corpus, "doc_id", "text", threshold=T, persist=False)
    assert leftover.count() == 0
    # re-sent ids (100-199 arrive in both batches) are admitted at most once
    assert corpus.select("doc_id").distinct().count() == corpus.count()
    # bounded by the global greedy dedup below (incremental admission can
    # legitimately keep MORE: a doc whose only near-dup was itself
    # dropped in an earlier batch is novel vs the ADMITTED corpus —
    # chain-duplicate cases where global greedy drops both) and the
    # distinct input above
    want = dedup_batch_against_corpus(docs, None, threshold=T)
    n_docs = docs.select("doc_id").distinct().count()
    assert want.count() <= corpus.count() <= n_docs
