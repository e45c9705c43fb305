"""Incremental weighted-containment ingest screen: single-epoch
equivalence with the q_simjoin_weighted_containment_rs batch key, and
multi-epoch accumulation behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.queries.similarity_q import (
    T_WCONTAIN_RS,
    q_simjoin_weighted_containment_rs,
)
from hive_similarity_join_spark.sources.loader import SCHEMAS, load_table
from hive_similarity_join_spark.streaming.incremental_weighted_screen import (
    incremental_weighted_screen,
    screen_batch_against_corpus,
)
from tests.conftest import SF_SMOKE

@pytest.fixture()
def dirs(spark, tmp_path):
    # pytest-managed scratch (auto-cleaned): an aborted run must not
    # leak untracked dirs into the repo (r7 ADVICE).
    yield str(tmp_path / "incwscreen")


def test_single_epoch_equals_batch_key(spark):
    """One epoch, seeded corpus, no in-batch screen: the screened-out
    set must be EXACTLY the batch key's id1 set (same weight scale by
    construction — survivors+corpus is batch+corpus)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    batch = docs.filter(F.col("source") < "src5")
    corpus = docs.filter(F.col("source") >= "src5")
    admitted = screen_batch_against_corpus(
        batch, corpus, threshold=T_WCONTAIN_RS, in_batch_screen=False
    )
    got_admitted = {r.doc_id for r in admitted.select("doc_id").collect()}
    key_pairs = q_simjoin_weighted_containment_rs(spark, SF_SMOKE)
    screened = {r.id1 for r in key_pairs.select("id1").distinct().collect()}
    all_batch = {r.doc_id for r in batch.select("doc_id").collect()}
    assert screened, "fixture must actually screen something"
    assert got_admitted == all_batch - screened


def test_streaming_accumulates_and_screens(spark, dirs):
    """Two epochs where epoch 2 re-sends epoch 1's docs verbatim: every
    re-sent doc is 100% weighted-contained in its admitted twin, so
    epoch 2 admits nothing from the overlap."""
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 200)
    src = f"{dirs}/incoming"
    docs.filter(F.col("doc_id") < 100).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    docs.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SCHEMAS["documents"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    corpus_dir = f"{dirs}/corpus"
    q = incremental_weighted_screen(
        stream,
        corpus_dir,
        threshold=T_WCONTAIN_RS,
        checkpoint_dir=f"{dirs}/ckpt",
    )
    q.awaitTermination(180)

    corpus = spark.read.option("recursiveFileLookup", "true").parquet(
        corpus_dir
    )
    # re-sent ids admitted at most once
    assert corpus.select("doc_id").distinct().count() == corpus.count()
    # nothing in the admitted corpus is still screenable against the
    # rest of it (self-consistency of the admission rule)
    leftover = screen_batch_against_corpus(
        corpus, None, threshold=T_WCONTAIN_RS, in_batch_screen=True
    )
    n_docs = docs.select("doc_id").distinct().count()
    assert leftover.count() <= corpus.count() <= n_docs
