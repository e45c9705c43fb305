"""Native stream-stream interval join (SURVEY §2.10 E3 extension).

The one Structured Streaming join family the repo's other streaming
mirrors don't exercise: TWO unbounded inputs joined on an equality key
plus an event-time interval predicate, with watermarks on both sides so
the state store can discard rows that can no longer match. This is the
streaming twin of the batch range join (queries/pipeline_q.py
q_join_range): purchases paired with the same user's clicks at most
``horizon`` behind them.

Unlike the foreachBatch mirrors (incremental_*.py), nothing here is
hand-rolled: Spark's own StreamingSymmetricHashJoin operator maintains
both sides' state, and the interval condition is what lets the engine
compute a state-eviction bound per side (left rows older than
watermark - horizon can never join a future right row, and vice versa).
That bound is the 100 TB story: state is O(key cardinality x horizon),
not O(stream length).

Semantics note (asserted in tests/test_stream_join.py): under
no-late-data inputs and an availableNow drain, the append-mode output
is exactly the batch join of the same rows — stream-stream inner joins
emit a pair as soon as both sides have arrived, and the watermark only
controls state cleanup, not correctness, when no row is late.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split an events relation (streaming or batch — the builders are
    source-agnostic) into the click side and the purchase side with
    disambiguated column names. Column renames, not withColumn chains:
    stream-stream joins require distinct attribute names across sides."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return clicks, purchases


def interval_join_clicks_purchases(
    events: DataFrame,
    horizon_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """(user_id, click_id, purchase_id, gap_us): every purchase joined
    to the same user's clicks in the strictly-preceding ``horizon``.

    On a streaming input both sides get event-time watermarks — with
    the interval condition this bounds BOTH state stores; on a batch
    input ``withWatermark`` is a documented no-op and the identical
    plan runs as a plain join, which is what the equivalence test
    exploits."""
    clicks, purchases = _sides(events)
    if events.isStreaming:
        clicks = clicks.withWatermark("c_ts", watermark)
        purchases = purchases.withWatermark("p_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (
            F.col("p_ts")
            <= F.col("c_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        )
    )
    return (
        clicks.join(purchases, cond)
        .select(
            F.col("c_user").alias("user_id"),
            "click_id",
            "purchase_id",
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
        )
    )
