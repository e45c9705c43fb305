"""Incremental CDC compaction — the streaming mirror of
``q_cdc_compact`` (queries/pipeline_q.py), SIXTEENTH
continuous-aggregate mirror.

The batch key compacts a changelog to each key's latest record
(dropping keys whose latest record is a tombstone) plus per-key churn
counts. Both halves of that state are textbook decomposable:

- the LATEST record is a MAX over the strict total order
  (ts, event_id) — associative, commutative, and idempotent (the max
  of maxes over any slicing is the global max), carried as one
  flattened struct-max row per key;
- the churn counts (n_changes, n_deletes) are plain sums —
  associative and commutative like the rollup mirror's partials, with
  epoch retries made safe by the versioned-carry protocol
  (streaming/state.py), the same contract incremental_rollup
  documents (sums are not raw-replay-idempotent; the carry versioning
  is what absorbs retries).

So epochs may arrive in ANY order, sliced any way, and the merged
carry is bit-identical to the single-shot aggregation — pytest
asserts equality against the batch key's own output for any-order
chains and a real availableNow stream. The TOMBSTONE subtlety is why
deletes must stay IN the carry rather than erasing it: a 'D' record
only wins while it is the newest — a later-arriving older epoch must
not resurrect the key, and a later newer upsert must revive it — so
compaction-to-visible-state happens at EMIT (filter op <> 'D'),
never in the merge.

State is O(live keys): one row per user ever seen. Per epoch: one
map-side-combined shuffle of the slice on user_id plus a carry-sized
merge aggregate; emission is a filter + projection over the carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CDC_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("op", T.StringType()),
        T.StructField("n_changes", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
    ]
)

_REC = ["ts", "event_id", "value", "op"]


def _compact(df: DataFrame) -> DataFrame:
    """Per-user struct-max latest record + summed churn counts —
    the ONE aggregate both partials and merge run (merging partials
    through the same shape is what makes the algebra associative by
    construction). (ts, event_id) leads the struct, so the comparison
    never reaches the payload fields (event_id is unique)."""
    return df.groupBy("user_id").agg(
        F.max(F.struct(*_REC)).alias("_r"),
        F.sum("n_changes").cast("bigint").alias("n_changes"),
        F.sum("n_deletes").cast("bigint").alias("n_deletes"),
    ).select("user_id", "_r.*", "n_changes", "n_deletes")


def cdc_partials(batch: DataFrame) -> DataFrame:
    """One events slice -> per-user latest-record + churn partials,
    reading the slice as the change stream the batch key defines
    (op = DELETE for 'error' rows, else UPSERT)."""
    log = batch.filter(F.col("ts").isNotNull()).select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        F.lit(1).cast("bigint").alias("n_changes"),
        F.when(F.col("event_type") == "error", 1)
        .otherwise(0)
        .cast("bigint")
        .alias("n_deletes"),
    )
    return _compact(log)


def merge_cdc(carry: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Upsert delta partials into the carry: union, then the same
    struct-max + sum aggregate — max of maxes and sum of sums, exact
    in any epoch order."""
    u = delta if carry is None else carry.unionByName(delta)
    return _compact(u)


def emit_cdc(carry: DataFrame) -> DataFrame:
    """q_cdc_compact's visible snapshot from the carry: tombstoned
    keys drop HERE (their latest record is 'D'), survivors emit the
    batch key's exact output shape."""
    return carry.filter(F.col("op") != "D").select(
        "user_id",
        "value",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        "n_changes",
        "n_deletes",
    )


def incremental_cdc(
    stream: DataFrame, state_dir: str, checkpoint_dir: str | None = None
):
    """Continuous CDC-compaction state maintenance over an events
    stream (SIXTEENTH mirror); read the latest summary snapshot and
    call emit_cdc for the compacted table."""
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        _make_query,
    )

    return _make_query(
        stream,
        state_dir,
        cdc_partials,
        CDC_CARRY_SCHEMA,
        merge_cdc,
        checkpoint_dir,
    )
