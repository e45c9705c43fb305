"""Incremental near-duplicate dedup over a document stream — the
training-data-pipeline composition of the batch kernel: every
micro-batch is near-dup-checked against everything admitted so far,
and only novel documents join the corpus.

Built on ``foreachBatch`` (the Structured Streaming idiom for stateful
logic that needs arbitrary batch operators): per micro-batch,

  1. in-batch greedy keep-first dedup (self similarity join, drop any
     doc duplicating a lower-id batch doc);
  2. R-S similarity join of the survivors against the accumulated
     corpus; matches are dropped;
  3. novel docs are appended to the corpus directory (parquet), which
     the NEXT batch's step 2 reads.

Scale posture: the corpus side re-tokenizes only what the R-S kernel
needs and grows append-only as partitioned parquet — at 100 TB you'd
bucket it by a token-prefix key and keep its token/rank relation as a
materialized table instead of recomputing, but the join/shuffle shape
is already the steady-state one. foreachBatch gives at-least-once
semantics on restart (re-appending an epoch is possible); the batch
connected-components/exact paths are the reconciliation tools.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_similarity_join_spark.operators.similarity import similarity_join


def _read_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame | None:
    """The accumulated corpus, or None before the first append. Probed
    THROUGH Spark (read + catch), not os.path — the corpus may live on
    any Hadoop-compatible filesystem (a local os.listdir on an
    hdfs://-style dir would silently report 'cold' every epoch and
    admit every duplicate)."""
    try:
        return spark.read.option(
            "recursiveFileLookup", "true"
        ).parquet(corpus_dir)
    except Exception:
        return None


def dedup_batch_against_corpus(
    batch: DataFrame,
    corpus: DataFrame | None,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The per-batch core (pure batch function — unit-testable without
    a stream): greedy in-batch keep-first, then drop anything matching
    the corpus."""
    in_batch_pairs = similarity_join(
        batch, id_col, text_col, threshold=threshold, persist=False
    )
    dupes = in_batch_pairs.select(F.col("id2").alias(id_col)).distinct()
    survivors = batch.join(dupes, id_col, "left_anti")
    if corpus is None:
        return survivors
    cross_pairs = similarity_join(
        survivors,
        id_col,
        text_col,
        threshold=threshold,
        other=corpus,
        persist=False,
    )
    matched = cross_pairs.select(F.col("id1").alias(id_col)).distinct()
    return survivors.join(matched, id_col, "left_anti")


def incremental_near_dedup(
    stream: DataFrame,
    corpus_dir: str,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
):
    """Start the streaming query; returns the StreamingQuery handle.

    ``corpus_dir`` accumulates the admitted (novel) documents as
    parquet; it doubles as the query's output sink.
    """

    def process(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        corpus = _read_corpus(spark, corpus_dir)
        novel = dedup_batch_against_corpus(
            batch, corpus, threshold, id_col, text_col
        )
        # epoch-named overwrite (streaming/state.py contract): a
        # retried epoch rewrites its own admissions instead of
        # appending duplicates into the corpus
        novel.write.mode("overwrite").parquet(
            f"{corpus_dir}/epoch_{epoch_id}"
        )

    writer = stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
