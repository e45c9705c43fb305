"""Incremental rarity-weighted containment screen over a document
stream — the streaming mirror of ``q_simjoin_weighted_containment_rs``
(queries/similarity_q.py): per micro-batch, drop every incoming doc
whose rarity-weighted token mass is already >= threshold contained in
some admitted-corpus doc, and append the rest to the corpus.

This is the weighted refinement of ``incremental_dedup`` for the
ingest-screening use case: near-dup Jaccard asks "is this the same
document"; weighted containment asks "does the corpus already carry
everything informative this document says" — shared stopword chrome
buys no admission-blocking evidence, shared rare tokens do.

Same ``foreachBatch`` composition as the other incremental operators
(arbitrary batch operators per epoch, corpus as an append-only parquet
relation the next epoch reads):

  1. optional in-batch keep-first screen (drop a doc whose weighted
     mass is covered by a lower-id doc in the same batch);
  2. weighted-containment R-S join of the survivors (probe side)
     against the accumulated corpus (index side); covered docs drop;
  3. novel docs append to the corpus.

Weight-scale semantics, stated precisely: each epoch builds its rarity
scale ``w(t) = N - df(t) + 1`` over survivors + corpus AT THAT EPOCH —
exactly the batch key's one-global-scale rule applied to the current
relation pair. Across epochs the scale therefore drifts as the corpus
grows (a token's weight rises as the corpus does); a single-epoch run
against a seeded corpus is BIT-equivalent to the batch key
(pytest-pinned in tests/test_incremental_weighted_screen.py). At
100 TB the corpus-side token index and the weight dictionary are
standing relations refreshed per epoch delta instead of recomputed —
the join/shuffle shape here is already the steady-state one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_similarity_join_spark.operators.similarity import (
    weighted_containment_join,
)


def _read_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame | None:
    """Accumulated corpus or None before the first append (probed
    through Spark so any Hadoop-compatible FS works — same rationale
    as incremental_dedup._read_corpus)."""
    try:
        return spark.read.option(
            "recursiveFileLookup", "true"
        ).parquet(corpus_dir)
    except Exception:
        return None


def screen_batch_against_corpus(
    batch: DataFrame,
    corpus: DataFrame | None,
    threshold: float = 0.95,
    id_col: str = "doc_id",
    text_col: str = "text",
    in_batch_screen: bool = True,
) -> DataFrame:
    """The per-epoch core (pure batch function — unit-testable without
    a stream): returns the batch docs NOT weighted-contained in the
    corpus (nor, with ``in_batch_screen``, in a lower-id batchmate)."""
    survivors = batch
    if in_batch_screen:
        in_pairs = weighted_containment_join(
            batch, id_col, text_col, threshold=threshold, persist=False
        )
        covered = (
            in_pairs.filter(F.col("id2") < F.col("id1"))
            .select(F.col("id1").alias(id_col))
            .distinct()
        )
        survivors = batch.join(covered, id_col, "left_anti")
    if corpus is None:
        return survivors
    cross = weighted_containment_join(
        survivors,
        id_col,
        text_col,
        threshold=threshold,
        other=corpus,
        persist=False,
    )
    matched = cross.select(F.col("id1").alias(id_col)).distinct()
    return survivors.join(matched, id_col, "left_anti")


def incremental_weighted_screen(
    stream: DataFrame,
    corpus_dir: str,
    threshold: float = 0.95,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
    in_batch_screen: bool = True,
):
    """Start the streaming query; returns the StreamingQuery handle.
    ``corpus_dir`` accumulates admitted documents as parquet and is
    also the sink the next epoch's screen reads."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        corpus = _read_corpus(spark, corpus_dir)
        novel = screen_batch_against_corpus(
            batch, corpus, threshold, id_col, text_col, in_batch_screen
        )
        # epoch-named overwrite: retry-idempotent (state.py contract)
        novel.write.mode("overwrite").parquet(
            f"{corpus_dir}/epoch_{epoch_id}"
        )

    writer = stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
