"""Incremental event-sequence pattern matching — the streaming mirror
of ``q_events_pattern`` (queries/events_q.py): consecutive
A -> B -> C triples per user, detected across micro-batch boundaries.

CEP-on-streams needs just enough state to complete patterns that
straddle epochs: for a 3-event consecutive pattern that is the LAST
TWO events of each user's stream so far. ``foreachBatch`` composition:

  1. per epoch, prepend each user's carried tail (<= 2 rows/user) to
     the batch's events;
  2. run the SAME lead-window matcher as the batch key over the
     combined slice, emitting only matches whose END event is new this
     epoch (starts can live in the carry — that is the point);
  3. write the new per-user tail (last 2 events) back as the carry.

Correctness rests on arrival-ordering: like incremental_novelty's
ordered-arrival contract, epochs must deliver a user's events in
(ts, event_id) order across batches (within a batch any order is
fine — the window sorts). Under that contract the union of per-epoch
matches EQUALS the batch key on the full log, pytest-asserted in
tests/test_incremental_pattern.py.

State is O(users x 2) rows — bounded by the entity population, not
the stream. At 100 TB-scale streams the same two relations (carry,
matches) are the keyed state a transformWithState operator would hold;
foreachBatch + parquet keeps it restart-durable and inspectable here
(the environment's protobuf limitation blocks the state-server path —
streaming/stateful.py note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_similarity_join_spark.operators.cache import batch_pinned
from hive_similarity_join_spark.queries.events_q import PATTERN
from hive_similarity_join_spark.streaming.state import (
    prune_carries,
    read_latest_carry,
)

_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("us", T.LongType()),
    ]
)


def match_patterns(events: DataFrame) -> DataFrame:
    """The shared matcher: consecutive PATTERN triples over a
    (user_id, event_id, event_type, us) relation — identical window
    logic to the batch key."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seq = events.select(
        "user_id", "event_id", "event_type", "us",
        F.lead("event_type", 1).over(w).alias("et1"),
        F.lead("event_id", 1).over(w).alias("id1"),
        F.lead("event_type", 2).over(w).alias("et2"),
        F.lead("event_id", 2).over(w).alias("id2"),
        F.lead("us", 2).over(w).alias("us2"),
    )
    return seq.filter(
        (F.col("event_type") == PATTERN[0])
        & (F.col("et1") == PATTERN[1])
        & (F.col("et2") == PATTERN[2])
    ).select(
        "user_id",
        F.col("event_id").alias("start_event"),
        F.col("id1").alias("mid_event"),
        F.col("id2").alias("end_event"),
        (F.col("us2") - F.col("us")).cast("bigint").alias("span_us"),
    )


def process_epoch(
    batch: DataFrame, carry: DataFrame | None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The per-epoch core (pure batch function): returns (new matches,
    new carry, shared). Matches are those whose END event arrived this
    epoch — with a <= 2-row carry a triple's end is always in the
    batch, so emitting every match of (carry ∪ batch) double-counts
    nothing. ``shared`` is the combined slice both outputs derive from
    — the caller wraps its actions in ``batch_pinned(shared)``
    (operators/cache.py) so the carry read + union runs once, not once
    per output action; cache hits are plan-matched, so pinning after
    this function returns still serves both outputs."""
    from pyspark.sql import Window

    ev = batch.filter(F.col("ts").isNotNull()).select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("us"),
    )
    combined = ev if carry is None else carry.unionByName(ev)
    matches = match_patterns(combined)
    w = Window.partitionBy("user_id").orderBy(F.desc("us"), F.desc("event_id"))
    new_carry = (
        combined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 2)
        .drop("_rn")
    )
    return matches, new_carry, combined


def incremental_pattern(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str | None = None,
):
    """Start the streaming query; per-epoch matches land in overwrite
    dirs ``{state_dir}/matches/epoch_{N}`` (a retried epoch rewrites
    rather than duplicates its output), the per-user tail lives in
    VERSIONED dirs ``{state_dir}/carry_v{epoch}`` per the
    streaming/state.py contract: read the newest version strictly
    BELOW this epoch id — a retried epoch never consumes the carry its
    failed attempt wrote — write this epoch's version, prune to the
    last two. No driver round-trip of the carry rows (the r7
    ``carry.collect()`` materialization is gone; at 100 TB the carry is
    the user population and must stay distributed)."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        carry = read_latest_carry(
            spark, state_dir, _CARRY_SCHEMA, below_epoch=epoch_id
        )
        matches, new_carry, shared = process_epoch(batch, carry)
        with batch_pinned(shared):
            matches.write.mode("overwrite").parquet(
                f"{state_dir}/matches/epoch_{epoch_id}"
            )
            # distinct dir per epoch: the lazy read of the old version
            # and the write of the new one never touch the same path
            new_carry.write.mode("overwrite").parquet(
                f"{state_dir}/carry_v{epoch_id}"
            )
        prune_carries(state_dir)

    writer = stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
