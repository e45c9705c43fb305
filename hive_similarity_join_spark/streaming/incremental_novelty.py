"""Incremental corpus novelty over a document stream — the streaming
twin of the batch ``q_text_novelty`` key: every micro-batch's documents
are scored for the fraction of their n-gram shingles the corpus has
NEVER seen, then the newly-seen shingles join the accumulated store so
the NEXT batch scores against them.

Semantics: "first occurrence" is arrival order — a shingle is novel
for exactly one document, the first (min doc_id within a batch, earlier
batch wins across batches). When batches arrive in ascending doc_id
order this reproduces the batch key's global min(doc_id) attribution
exactly (pytest-asserted); out-of-order arrival is still
deterministic-per-arrival-order, which is the semantics a live ingest
actually wants.

Storage posture: the seen-shingle store holds 60-bit md5-prefix hashes
(``md5_prefix60``), not gram strings — the same bounded-footprint trick
as ``q_decontaminate_hashed`` (8 bytes/shingle; collisions are
~2^-60 per pair and deterministic). It accumulates append-only as
parquet partitioned by hash range at scale; the anti-join that gates
novelty is hash-keyed and needs no sort. Built on ``foreachBatch``
(arbitrary batch operators per micro-batch; at-least-once on restart —
re-scoring an epoch double-appends score rows, which a downstream
dedup-by-(epoch, doc_id) reconciles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_similarity_join_spark.functions import text as TX
from hive_similarity_join_spark.operators.cache import batch_pinned

NOVELTY_N = 3


def _read_store(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """The accumulated seen-shingle relation, or None on a cold store.

    Probed THROUGH Spark (read + catch), not os.path — the store may
    live on any Hadoop-compatible filesystem (HDFS/S3 at cluster
    scale, where a local os.listdir would silently report 'cold' every
    epoch and novelty would score against an empty store with no
    error)."""
    try:
        return spark.read.option(
            "recursiveFileLookup", "true"
        ).parquet(store_dir)
    except Exception:
        return None


def novelty_batch_against_seen(
    batch: DataFrame,
    seen: DataFrame | None,
    n: int = NOVELTY_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """The per-batch core (pure batch function — unit-testable without
    a stream). Returns ``(scores, new_shingles)``:

    - ``scores``: (id, n_grams, n_novel, novelty) for every batch doc
      with >= n tokens — n_novel counts shingles whose first corpus
      occurrence is THIS doc (absent from ``seen`` and not claimed by a
      lower-id doc in the same batch);
    - ``new_shingles``: the distinct shingles this batch adds as a
      (_h, _first) relation — the caller appends ``.select("_h")`` to
      the store. Returned UNPROJECTED on purpose: it is the shared
      subtree both the scores plan and the store write contain, so
      ``batch_pinned(new_shingles)`` plan-matches for BOTH actions (a
      pin of the projected ``_h`` relation would match neither — the
      scores join references the 2-column form).

    ``seen`` is a relation with an ``_h`` column (extra columns are
    ignored by the anti-join) or None for a cold store.
    """
    sh = batch.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(TX.word_ngrams(TX.bag_tokens(text_col), n))
        ).alias("_g"),
    ).select("_id", TX.md5_prefix60(F.col("_g")).alias("_h"))
    # In-batch first occurrence per shingle; shingles the store already
    # holds are filtered out, so `_first` survives only for genuinely
    # new shingles (hash anti-join — no strings move past this point).
    fst = sh.groupBy("_h").agg(F.min("_id").alias("_first"))
    fresh = fst if seen is None else fst.join(seen, "_h", "left_anti")
    scored = sh.join(fresh, "_h", "left")
    novel = F.sum(F.when(F.col("_first") == F.col("_id"), 1).otherwise(0))
    scores = (
        scored.groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            novel.cast("bigint").alias("n_novel"),
            (novel.cast("double") / F.count(F.lit(1))).alias("novelty"),
        )
        .withColumnRenamed("_id", id_col)
    )
    return scores, fresh


def incremental_novelty(
    stream: DataFrame,
    store_dir: str,
    scores_dir: str,
    n: int = NOVELTY_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
):
    """Start the streaming query; returns the StreamingQuery handle.

    ``store_dir`` accumulates the seen-shingle hashes; ``scores_dir``
    accumulates one novelty row per processed document.
    """

    def process(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        seen = _read_store(spark, store_dir)
        scores, fresh = novelty_batch_against_seen(
            batch, seen, n, id_col, text_col
        )
        # The two writes share the tokenize -> shingle -> anti-join
        # lineage; pin the (small, novel-hash-sized) fresh relation
        # for the batch so both actions reuse it instead of re-running
        # the whole per-batch pipeline (scoped via the tracked-pin
        # contract, operators/cache.py — fresh is the exact subtree
        # both plans contain, see novelty_batch_against_seen).
        with batch_pinned(fresh):
            # Epoch-named overwrite dirs (streaming/state.py
            # contract): a retried epoch rewrites its own scores and
            # its own store shard instead of duplicating either.
            scores.withColumn("epoch", F.lit(epoch_id)).write.mode(
                "overwrite"
            ).parquet(f"{scores_dir}/epoch_{epoch_id}")
            fresh.select("_h").write.mode("overwrite").parquet(
                f"{store_dir}/epoch_{epoch_id}"
            )

    writer = stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
