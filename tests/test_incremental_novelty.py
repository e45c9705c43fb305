"""Incremental streaming novelty: sequential batches reproduce the
batch q_text_novelty attribution exactly (ordered arrival), and the
foreachBatch wrapper accumulates the same scores end to end."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.sources.loader import SCHEMAS, load_table
from hive_similarity_join_spark.streaming.incremental_novelty import (
    incremental_novelty,
    novelty_batch_against_seen,
)
from tests.conftest import SF_SMOKE

REPO_TMP = Path(__file__).resolve().parent / "_incnovel_tmp"


@pytest.fixture()
def dirs(spark):
    REPO_TMP.mkdir(exist_ok=True)
    d = tempfile.mkdtemp(dir=REPO_TMP)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(df):
    return {
        r.doc_id: (r.n_grams, r.n_novel, round(r.novelty, 12))
        for r in df.collect()
    }


def test_sequential_batches_equal_single_batch(spark):
    """Two doc_id-ordered batches threaded through the seen store must
    attribute first occurrences exactly like one global batch — the
    incremental-equivalence property."""
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 300)
    whole, _ = novelty_batch_against_seen(docs, None)
    want = _rows(whole)

    b1 = docs.filter(F.col("doc_id") < 150)
    b2 = docs.filter(F.col("doc_id") >= 150)
    s1, f1 = novelty_batch_against_seen(b1, None)
    s2, _ = novelty_batch_against_seen(b2, f1)
    got = _rows(s1) | _rows(s2)
    assert got == want


def test_matches_batch_key_attribution(spark):
    """The hashed incremental core agrees with the string-gram batch
    key (q_text_novelty) on real documents — the 60-bit hash is
    collision-free on this corpus."""
    from hive_similarity_join_spark.registry import QUERIES, load_registry

    load_registry()
    scores, _ = novelty_batch_against_seen(
        load_table(spark, SF_SMOKE, "documents"), None
    )
    got = _rows(scores)
    want = _rows(QUERIES["q_text_novelty"](spark, SF_SMOKE))
    assert got == want


def test_streaming_scores_accumulate(spark, dirs):
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 200)
    src = f"{dirs}/incoming"
    docs.filter(F.col("doc_id") < 100).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    docs.filter(F.col("doc_id") >= 100).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(SCHEMAS["documents"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_novelty(
        stream,
        f"{dirs}/store",
        f"{dirs}/scores",
        checkpoint_dir=f"{dirs}/ckpt",
    )
    q.awaitTermination(180)

    got = _rows(
        spark.read.option("recursiveFileLookup", "true")
        .parquet(f"{dirs}/scores")
        .drop("epoch")
    )
    whole, _ = novelty_batch_against_seen(docs, None)
    assert got == _rows(whole)


def test_out_of_order_arrival_attributes_by_arrival(spark):
    """Out-of-doc_id-order batches: first occurrence goes to the batch
    that ARRIVED first (the live-ingest semantics the module
    documents), deterministically — a later batch with lower doc_ids
    scores low novelty for shingles the earlier batch already owns."""
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 200)
    hi = docs.filter(F.col("doc_id") >= 100)  # arrives FIRST
    lo = docs.filter(F.col("doc_id") < 100)
    s_hi, f_hi = novelty_batch_against_seen(hi, None)
    s_lo, _ = novelty_batch_against_seen(lo, f_hi)
    got = _rows(s_hi) | _rows(s_lo)
    # per-doc n_grams is arrival-independent; total novel shingles
    # equals the distinct shingle count either way
    whole, f_all = novelty_batch_against_seen(docs, None)
    want = _rows(whole)
    assert {k: v[0] for k, v in got.items()} == {k: v[0] for k, v in want.items()}
    assert sum(v[1] for v in got.values()) == f_all.count()
    # at least one shingle owner flipped: some doc's n_novel differs
    assert any(got[k][1] != want[k][1] for k in want)
