"""Incremental ordered-funnel maintenance — the streaming mirror of
``q_events_funnel`` (queries/events_q.py): how many users complete
view -> click -> purchase IN ORDER, maintained across micro-batches.

The chained first-occurrence times (t0 = first view, t1 = first click
AFTER t0, t2 = first purchase AFTER t1) are NOT decomposable in
arbitrary epoch order: a late-arriving earlier view lowers t0 and can
resurrect clicks the state already discarded — exact any-order funnel
state is the per-user event log itself. Under the ORDERED-ARRIVAL
contract (a user's events arrive in ts order across epochs — the same
contract as incremental_novelty / incremental_pattern / the CUSUM
mirror), each of t0/t1/t2 is SET-ONCE:

  - a new event's ts is >= every ts already seen for that user, so a
    set t0/t1/t2 can never be lowered by later data;
  - an unset t1 is filled by the epoch's min click strictly after t0
    (which may itself have been set this epoch — the in-epoch chain
    runs the batch key's own three-step composition over the slice);
  - clicks discarded while t0 was unset can never qualify later,
    because any future view's ts >= that click's ts (the batch key
    over the full log discards them identically).

So the carry is one row per user EVER seen — (user_id, t0, t1, t2),
all three nullable — O(users) state, independent of event volume, and
the union-of-epochs result EQUALS the batch key on the full log
(pytest-asserted in tests/test_incremental_funnel.py). Emission
derives the 4-row funnel (counts + conversion rates) from the carry
alone: O(users) per read, never O(events).

Like the sibling mirrors, foreachBatch + the versioned parquet carry
contract (streaming/state.py: read the newest version strictly below
the current epoch id, write this epoch's, prune) keeps state
distributed, restart-durable, and retry-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_similarity_join_spark.streaming.state import (
    prune_carries,
    read_latest_carry,
)

FUNNEL_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("t0", T.TimestampType()),
        T.StructField("t1", T.TimestampType()),
        T.StructField("t2", T.TimestampType()),
    ]
)

_STAGES = ("view", "click", "purchase")


def funnel_epoch(batch: DataFrame, carry: DataFrame | None) -> DataFrame:
    """Pure per-epoch core: fold one events slice into the per-user
    funnel state. With ``carry=None`` this IS the batch computation
    over the slice (the equivalence tests exploit it)."""
    ev = batch.filter(F.col("ts").isNotNull()).select(
        F.col("user_id").cast("bigint").alias("user_id"),
        "event_type",
        F.col("ts").alias("tsu"),
    )
    users = ev.select("user_id").distinct()
    if carry is not None:
        users = users.unionByName(carry.select("user_id")).distinct()
        base = users.join(carry, "user_id", "left")
    else:
        base = users.select(
            "user_id",
            F.lit(None).cast("timestamp").alias("t0"),
            F.lit(None).cast("timestamp").alias("t1"),
            F.lit(None).cast("timestamp").alias("t2"),
        )
    v = (
        ev.filter(F.col("event_type") == _STAGES[0])
        .groupBy("user_id")
        .agg(F.min("tsu").alias("_bv"))
    )
    s0 = base.join(v, "user_id", "left").select(
        "user_id", F.coalesce("t0", "_bv").alias("t0"), "t1", "t2"
    )
    c = (
        ev.filter(F.col("event_type") == _STAGES[1])
        .join(s0.filter(F.col("t0").isNotNull()), "user_id")
        .filter(F.col("tsu") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("tsu").alias("_bc"))
    )
    s1 = s0.join(c, "user_id", "left").select(
        "user_id", "t0", F.coalesce("t1", "_bc").alias("t1"), "t2"
    )
    p = (
        ev.filter(F.col("event_type") == _STAGES[2])
        .join(s1.filter(F.col("t1").isNotNull()), "user_id")
        .filter(F.col("tsu") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("tsu").alias("_bp"))
    )
    return s1.join(p, "user_id", "left").select(
        "user_id", "t0", "t1", F.coalesce("t2", "_bp").alias("t2")
    )


def emit_funnel(carry: DataFrame) -> DataFrame:
    """q_events_funnel's exact 4-row output from the per-user carry —
    counts are non-null tallies over O(users) rows, rates the same
    static lag/first divisions as the batch key."""
    one = carry.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.count("t0").cast("bigint").alias("n_v"),
        F.count("t1").cast("bigint").alias("n_c"),
        F.count("t2").cast("bigint").alias("n_p"),
    )
    steps = one.select(
        F.expr(
            "stack(4,"
            " CAST(1 AS BIGINT), 'all_users',            n_all, n_all,"
            " CAST(2 AS BIGINT), 'view',                 n_v,   n_all,"
            " CAST(3 AS BIGINT), 'click_after_view',     n_c,   n_v,"
            " CAST(4 AS BIGINT), 'purchase_after_click', n_p,   n_c"
            ") AS (step, step_name, users, prev)"
        ),
        F.col("n_all").alias("first"),
    )
    return steps.select(
        "step",
        "step_name",
        "users",
        (F.col("users").cast("double") / F.col("prev").cast("double")).alias(
            "conv_from_prev"
        ),
        (F.col("users").cast("double") / F.col("first").cast("double")).alias(
            "conv_from_start"
        ),
    )


def incremental_funnel(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str | None = None,
):
    """Start the streaming query; the latest summary snapshot IS the
    per-user funnel state — read it and call emit_funnel for the
    serving funnel."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        carry = read_latest_carry(
            spark, state_dir, FUNNEL_CARRY_SCHEMA, below_epoch=epoch_id
        )
        new_carry = funnel_epoch(batch, carry)
        new_carry.write.mode("overwrite").parquet(
            f"{state_dir}/carry_v{epoch_id}"
        )
        spark.read.schema(FUNNEL_CARRY_SCHEMA).parquet(
            f"{state_dir}/carry_v{epoch_id}"
        ).write.mode("overwrite").parquet(
            f"{state_dir}/summary/epoch_{epoch_id:06d}"
        )
        prune_carries(state_dir)

    writer = stream.writeStream.foreachBatch(process).trigger(
        availableNow=True
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
