"""Event-stream operators, batch-first (SURVEY §2.10).

The reference is pure batch Hive; these are the north-star streaming
extensions. Each query runs BATCH semantics on the events table (exactly
oracle-checkable), and `streaming/windows.py` mirrors the same builders
over ``readStream`` with watermarks (demonstrated in tests, not
oracle-gated — Structured Streaming micro-batch output is a superset
of batch-mode results under no-late-data).

Timestamp discipline: events.ts is ns-precision parquet; Spark reads
us-truncated (loader), so oracle SQL casts TIMESTAMP_NS ->
TIMESTAMP (same floor) before any window math. Window starts are
emitted as formatted strings — identical text on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_similarity_join_spark.registry import query
from hive_similarity_join_spark.sources.loader import load_table

_FMT = "%Y-%m-%d %H:%M:%S"


def _dsum(col, scale: int = 6):
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


@query(
    "q_stream_tumbling",
    oracle=f"""
SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '{_FMT}') AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def q_stream_tumbling(spark, sf_dir):
    """Tumbling 1h window agg — in Structured Streaming the identical
    ``F.window`` expression runs incrementally with watermark-bounded
    state; in batch it is a plain groupBy (same results, no late data).
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            _dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


@query(
    "q_stream_sliding",
    oracle=f"""
WITH assigned AS (
  SELECT to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) * 900 AS BIGINT)
                      - k.k * 900) AS wstart,
         e.*
  FROM events e, unnest(generate_series(0, 3)) AS k(k)
  WHERE to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) * 900 AS BIGINT)
                     - k.k * 900) + INTERVAL 1 HOUR > CAST(ts AS TIMESTAMP)
)
SELECT strftime(CAST(wstart AS TIMESTAMP), '{_FMT}') AS window_start,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM assigned
GROUP BY 1
""",
)
def q_stream_sliding(spark, sf_dir):
    """Sliding window (1h length, 15m slide): each event lands in 4
    overlapping windows — Spark's ``F.window`` generates the expansion;
    the oracle reproduces it with an explicit series join."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            _dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "cnt",
            "sum_value",
        )
    )


@query(
    "q_stream_session",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts_us, value,
         CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                   OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
                      >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
),
grp AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM ordered
)
SELECT user_id,
       strftime(min(ts_us), '{_FMT}') AS session_start,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM grp
GROUP BY user_id, session_id
""",
)
def q_stream_session(spark, sf_dir):
    """Session windows (30 min gap) per user. Spark: native
    ``F.session_window`` (merging state op in streaming); oracle:
    classic gaps-and-islands. Session membership depends only on ts
    ordering per user, so ties are harmless (same islands)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            _dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "cnt",
            "sum_value",
        )
    )
