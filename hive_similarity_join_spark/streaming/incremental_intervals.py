"""Incremental gaps-and-islands interval consolidation — the streaming
mirror of ``q_intervals_merge`` (queries/relational_q.py): per-key
overlapping intervals merged into maximal islands ACROSS micro-batch
boundaries.

State is exactly one OPEN island per key (island_id, start, end, n):
under the ordered-arrival contract (a key's intervals arrive with
non-decreasing start across epochs — the same contract as
incremental_novelty / incremental_pattern), a new interval either
extends the open island (start <= open.end) or closes it forever — no
future interval can reach back past the gap, because future starts are
>= the start that created it. So per epoch:

  1. prepend each key's carried open island to the batch's intervals;
  2. run the SAME running-max / boundary-flag island logic as the
     batch key over the combined slice, offsetting island ids by the
     carried island's id so numbering is globally consistent;
  3. emit every island except the last per key (those are CLOSED —
     append-only, exactly-once), and write the last back as the carry.

The union of emitted islands plus the final carry EQUALS the batch
key on the full relation — pytest-asserted in
tests/test_incremental_intervals.py against q_intervals_merge itself.

State is O(keys) rows — bounded by the entity population, not the
stream. Like the other incremental mirrors, foreachBatch + the
versioned parquet carry contract (streaming/state.py: read the newest
version below the current epoch id, write this epoch's, prune) keeps
the state distributed, restart-durable, and retry-safe; closed
islands land in per-epoch overwrite dirs so a retried epoch rewrites
rather than duplicates its output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_similarity_join_spark.operators.cache import batch_pinned
from hive_similarity_join_spark.streaming.state import (
    prune_carries,
    read_latest_carry,
)

_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("island_id", T.LongType()),
        T.StructField("start", T.TimestampType()),
        T.StructField("end", T.TimestampType()),
        T.StructField("n", T.LongType()),
    ]
)


def process_epoch(
    batch: DataFrame, carry: DataFrame | None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Pure per-epoch core. ``batch`` is (key, start, end, uid) with a
    unique uid per interval; returns (closed islands, new carry,
    shared), the first two (key, island_id, start, end, n). ``shared``
    is the grouped-islands relation both outputs slice — the caller
    wraps its actions in ``batch_pinned(shared)`` (operators/cache.py)
    so the carry read + union + both window passes run once, not once
    per output action. With ``carry=None`` this IS the batch islands
    computation (island ids 1-based), which the equivalence test
    exploits."""
    rows = batch.select(
        "key",
        "start",
        "end",
        F.lit(1).cast("bigint").alias("n"),
        F.lit(None).cast("bigint").alias("_carry_island"),
        F.lit(0).alias("_is_carry"),
        F.col("uid").cast("bigint").alias("_uid"),
    )
    if carry is not None:
        rows = carry.select(
            "key",
            "start",
            "end",
            "n",
            F.col("island_id").alias("_carry_island"),
            F.lit(1).alias("_is_carry"),
            F.lit(-1).cast("bigint").alias("_uid"),
        ).unionByName(rows)
    # carry first among equal starts: it is the continuation of the
    # open island and must seed the running max
    order = [
        F.col("start"),
        F.desc("_is_carry"),
        F.col("end"),
        F.col("_uid"),
    ]
    w_prev = (
        Window.partitionBy("key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_key = Window.partitionBy("key")
    prev_end = F.max("end").over(w_prev)
    boundary = F.when(
        prev_end.isNull() | (F.col("start") > prev_end), 1
    ).otherwise(0)
    base = F.coalesce(F.max("_carry_island").over(w_key) - 1, F.lit(0))
    marked = rows.select(
        "key",
        "start",
        "end",
        "n",
        (base + F.sum(boundary).over(w_run)).cast("bigint").alias(
            "island_id"
        ),
    )
    grouped = marked.groupBy("key", "island_id").agg(
        F.min("start").alias("start"),
        F.max("end").alias("end"),
        F.sum("n").cast("bigint").alias("n"),
    )
    last = F.max("island_id").over(Window.partitionBy("key"))
    flagged = grouped.withColumn("_last", last)
    closed = flagged.filter(F.col("island_id") < F.col("_last")).drop("_last")
    new_carry = flagged.filter(F.col("island_id") == F.col("_last")).drop(
        "_last"
    )
    return closed, new_carry, flagged


def incremental_intervals(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str | None = None,
):
    """Start the streaming query over a (key, start, end, uid) interval
    stream. Closed islands accumulate append-only at
    ``{state_dir}/islands``; the open island per key lives in versioned
    dirs ``{state_dir}/carry_v{epoch}`` per the streaming/state.py
    contract: read the newest version BELOW this epoch id (a retried
    epoch never consumes its own failed attempt's carry), write this
    epoch's version, prune to the last two — bounded at 2x carry size,
    retry-safe, no driver round-trip."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        carry = read_latest_carry(
            spark, state_dir, _CARRY_SCHEMA, below_epoch=epoch_id
        )
        closed, new_carry, shared = process_epoch(batch, carry)
        with batch_pinned(shared):
            # epoch-named overwrite, not blind append: a retried epoch
            # rewrites its own output dir instead of duplicating rows
            closed.write.mode("overwrite").parquet(
                f"{state_dir}/islands/epoch_{epoch_id}"
            )
            new_carry.write.mode("overwrite").parquet(
                f"{state_dir}/carry_v{epoch_id}"
            )
        prune_carries(state_dir)

    writer = stream.writeStream.foreachBatch(process).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
