"""Structured Streaming mirrors of the batch window operators
(SURVEY §2.10 E3).

The batch forms in ``queries/events_q.py`` are the oracle-checked source
of truth; these builders apply the SAME aggregation expressions over a
``readStream`` source, adding only the streaming-specific pieces:
watermarks (bounded state / late-data policy), and streaming dedup.

Design: builder functions take any streaming DataFrame with the events
schema, so the source can be a file stream (tests), Kafka, or a rate
source — source choice is orthogonal to operator semantics. Under
no-late-data inputs, complete-mode results equal the batch results
(asserted in tests/test_streaming.py).

Scale notes: state store size is bounded by (watermark horizon x key
cardinality); ``session_window`` uses the merging-session state
operator; ``dropDuplicatesWithinWatermark`` keeps only in-horizon keys.
``transformWithStateInPandas`` (Spark 4 arbitrary state) is the
documented escape hatch for custom stateful logic — deliberately not
used by any v1 operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_similarity_join_spark.sources.loader import SCHEMAS


def stream_events(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream with the events schema (parquet files dropped
    into ``events_dir``). ``ts`` must already be microsecond timestamps
    (tests write from the batch loader, which normalizes ns -> us)."""
    return (
        spark.readStream.schema(SCHEMAS["events"])
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )


def tumbling_counts(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def sliding_counts(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cnt")
    )


def session_aggregates(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    return (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "cnt",
        )
    )


def streaming_dedup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    the streaming twin of q_dedup_exact's hash-key semantics."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    radius_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join — the streaming twin of the batch
    q_join_range: pairs (left, right) events of the same user with
    right.ts in (left.ts, left.ts + radius]. Both sides carry
    watermarks and the join condition bounds the time skew, so the
    state store evicts rows once the other stream's watermark passes
    ts + radius — state is O(rate x horizon), not unbounded."""
    l = left.withWatermark("ts", watermark).select(
        F.col("user_id").alias("l_user"),
        F.col("event_id").alias("id1"),
        F.col("ts").alias("l_ts"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("id2"),
        F.col("ts").alias("r_ts"),
    )
    return l.join(
        r,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {radius_minutes} MINUTES")),
    ).select(
        F.col("l_user").alias("user_id"),
        "id1",
        "id2",
        (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("gap_us"),
    )
