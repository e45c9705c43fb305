"""Incremental decontamination over a document stream — the streaming
mirror of the batch ``q_decontaminate`` key: every micro-batch of
training documents is screened against a FIXED eval/benchmark shingle
set, contaminated docs are quarantined, and clean docs flow to the
training corpus sink.

Built on ``foreachBatch`` (like streaming/incremental_dedup.py): the
eval shingle set is computed once up front, is tiny relative to the
corpus (a benchmark, not a crawl), and BROADCASTS into every batch's
map-side hash join — so each micro-batch costs one scan of itself plus
a doc-id-keyed count, never a corpus-sized shuffle. At 100 TB of
stream, hash the shingles (xxhash64) to shrink the broadcast further.

At-least-once semantics on restart (a re-processed epoch re-appends);
dedup the sink on doc_id downstream (q_dedup_latest is the batch
reconciliation tool).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_similarity_join_spark.functions import text as TX
from hive_similarity_join_spark.operators.cache import batch_pinned


def eval_shingles(
    eval_docs: DataFrame,
    text_col: str = "text",
    n: int = 4,
    hashed: bool = False,
) -> DataFrame:
    """Distinct word n-gram set of the benchmark corpus: one column
    ``g``. Compute once; small enough to broadcast. ``hashed=True``
    emits 60-bit md5-prefix hashes instead of the strings — 8 bytes per
    broadcast entry, the 100 TB form (batch twin:
    q_decontaminate_hashed). Both sides of a screen must agree."""
    grams = F.array_distinct(TX.word_ngrams(TX.bag_tokens(text_col), n))
    g = F.col("_g")
    key = TX.md5_prefix60(g) if hashed else g
    return (
        eval_docs.select(F.explode(grams).alias("_g"))
        .select(key.alias("g"))
        .distinct()
    )


def screen_hits(
    batch: DataFrame,
    ev_shingles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    hashed: bool = False,
) -> DataFrame:
    """(id, n_shared_ngrams) for every contaminated doc — the expensive
    part of the screen (tokenize, n-gram explode, broadcast join),
    factored out so a caller fanning out to several sinks can persist
    this doc-id-sized relation instead of re-running it per action.
    ``hashed`` must match how ``ev_shingles`` was built."""
    grams = F.array_distinct(TX.word_ngrams(TX.bag_tokens(text_col), n))
    sh = batch.select(F.col(id_col), F.explode(grams).alias("_g"))
    key = TX.md5_prefix60(F.col("_g")) if hashed else F.col("_g")
    sh = sh.select(F.col(id_col), key.alias("g"))
    return (
        sh.join(F.broadcast(ev_shingles), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_ngrams"))
    )


def screen_batch(
    batch: DataFrame,
    ev_shingles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    hits: DataFrame | None = None,
    hashed: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(clean, contaminated): pure batch function, unit-testable without
    a stream. ``contaminated`` carries the shared-shingle count. Pass a
    (possibly persisted) ``hits`` relation to reuse one screen pass
    across both outputs."""
    if hits is None:
        hits = screen_hits(batch, ev_shingles, id_col, text_col, n, hashed)
    contaminated = batch.join(hits, id_col)
    clean = batch.join(hits.select(id_col), id_col, "left_anti")
    return clean, contaminated


def incremental_decontaminate(
    stream: DataFrame,
    ev_shingles: DataFrame,
    clean_dir: str,
    quarantine_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    checkpoint_dir: str | None = None,
    hashed: bool = False,
):
    """Start the streaming query; returns the StreamingQuery handle.

    Clean docs append to ``clean_dir``; contaminated docs (with their
    shared-shingle counts) append to ``quarantine_dir`` for review —
    dropping data silently is never the pipeline's call to make.
    """

    def process(batch: DataFrame, epoch_id: int) -> None:
        # The two sink writes are separate actions: without reuse, the
        # tokenize, 4-gram explode, and broadcast join would all run
        # twice per epoch (cost, not correctness — classification is
        # deterministic). Pin the doc-id-sized hits relation for the
        # batch (scoped via the tracked-pin contract,
        # operators/cache.py), not the batch itself: at stream scale
        # the raw batch may not fit storage memory, while hits is
        # bounded by the contaminated doc count.
        with batch_pinned(
            screen_hits(batch, ev_shingles, id_col, text_col, n, hashed)
        ) as hits:
            clean, contaminated = screen_batch(
                batch, ev_shingles, id_col, text_col, n, hits=hits
            )
            # epoch-named overwrite: retry-idempotent on both sinks
            clean.write.mode("overwrite").parquet(
                f"{clean_dir}/epoch_{epoch_id}"
            )
            contaminated.write.mode("overwrite").parquet(
                f"{quarantine_dir}/epoch_{epoch_id}"
            )

    writer = stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
