"""Incremental deterministic reservoir sample — the streaming mirror
of ``q_sample_reservoir`` (queries/pipeline_q.py), SEVENTEENTH
continuous-aggregate mirror.

The batch key keeps, per source, the K documents with the smallest
(md5(doc_id), doc_id) rank — reservoir sampling derandomized into a
frozen-hash bottom-K. That sketch is the textbook mergeable sample:

- bottom-K over a strict total order is associative and commutative
  (the bottom-K of bottom-Ks over any slicing equals the global
  bottom-K — the same max-of-maxes algebra as the CDC mirror's
  latest-record, applied K-deep), so epochs may arrive in ANY order;
- unlike the sum-carrying mirrors it is also RAW-REPLAY-idempotent:
  the carry holds distinct (source, doc_id) rows and the merge
  dedupes before re-ranking, so re-delivering an entire slice —
  even WITHOUT the versioned-carry protocol's epoch guard — cannot
  perturb the sample (set-union semantics; pinned by
  test_reservoir_replay_idempotent). The versioned carry
  (streaming/state.py) is still used for uniform plumbing.

Carry is O(K x sources): at most K rows per source, each holding its
frozen hash so merges never recompute md5. Per epoch: one
source-keyed rank of the SLICE (Spark pushes the rank<=K filter into
the sort as a per-partition top-K — WindowGroupLimit, O(K) state per
group, the reservoir guarantee), then a carry-sized dedup + re-rank.
Emission re-ranks the carry into the batch key's exact
(doc_id, source, rk) shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_similarity_join_spark.queries.pipeline_q import RESERVOIR_K

RESERVOIR_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("h", T.StringType()),
    ]
)


def _bottomk(df: DataFrame) -> DataFrame:
    """Distinct rows, then the K smallest (h, doc_id) per source — the
    ONE shape both partials and merge run (bottom-K of bottom-Ks =
    global bottom-K, so running the same aggregate at every level is
    what makes the algebra associative by construction)."""
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        df.dropDuplicates(["source", "doc_id"])
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= RESERVOIR_K)
        .select("source", "doc_id", "h")
    )


def reservoir_partials(batch: DataFrame) -> DataFrame:
    """One documents slice -> its per-source bottom-K partial, hashes
    computed once here (the batch key's exact rank key:
    md5 of the doc_id string)."""
    return _bottomk(
        batch.select(
            "source",
            "doc_id",
            F.md5(F.col("doc_id").cast("string")).alias("h"),
        )
    )


def merge_reservoir(
    carry: DataFrame | None, delta: DataFrame
) -> DataFrame:
    """Union + dedup + re-rank: exact in any epoch order and under
    whole-slice replay (set semantics — see module docstring)."""
    u = delta if carry is None else carry.unionByName(delta)
    return _bottomk(u)


def emit_reservoir(carry: DataFrame) -> DataFrame:
    """q_sample_reservoir's exact output shape from the carry."""
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return carry.select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("bigint").alias("rk"),
    )


def incremental_reservoir(
    stream: DataFrame, state_dir: str, checkpoint_dir: str | None = None
):
    """Continuous reservoir-sample maintenance over a documents stream
    (SEVENTEENTH mirror); read the latest summary snapshot and call
    emit_reservoir for the sample table."""
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        _make_query,
    )

    return _make_query(
        stream,
        state_dir,
        reservoir_partials,
        RESERVOIR_CARRY_SCHEMA,
        merge_reservoir,
        checkpoint_dir,
    )
