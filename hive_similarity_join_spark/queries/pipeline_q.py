"""Reshaping + temporal-join operators a training-data pipeline needs
(EXT surface beyond the reconstructed reference; SURVEY §2.3/§2.6).

Five plan families the rest of the suite didn't cover yet:

- PIVOT / UNPIVOT (Hive users emulate these with CASE WHEN + UNION ALL;
  Spark has first-class relational operators for both);
- AS-OF join — "latest prior event" — expressed WITHOUT a join: one
  window sort per user carries the last-seen value forward, which is
  the only formulation that survives a 100 TB event log (a naive
  theta-join is quadratic per user);
- range (interval) self-join with lossless time-bucket blocking: the
  equi-join key is (user, 30-min bucket) so the shuffle pairs only
  rows that can possibly match, then the exact interval predicate
  verifies — same blocking discipline as the similarity kernel;
- latest-per-key dedup (row_number desc = 1) — the canonical
  "keep newest snapshot" pipeline step.

Timestamp discipline matches events_q.py: ns parquet reads as us in
Spark, so oracle SQL casts TIMESTAMP_NS -> TIMESTAMP; timestamps are
emitted as formatted strings; time gaps are exact integer microseconds
(unix_micros / epoch_us), never float seconds.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hive_similarity_join_spark.registry import query
from hive_similarity_join_spark.sources.loader import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_FMT = "%Y-%m-%d %H:%M:%S"


def _dsum(col, scale: int = 6):
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


@query(
    "q_pivot",
    oracle="""
SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
       CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value END
                     AS DECIMAL(18,6))) AS DOUBLE) AS click,
       CAST(SUM(CAST(CASE WHEN event_type = 'error' THEN value END
                     AS DECIMAL(18,6))) AS DOUBLE) AS error,
       CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value END
                     AS DECIMAL(18,6))) AS DOUBLE) AS purchase,
       CAST(SUM(CAST(CASE WHEN event_type = 'signup' THEN value END
                     AS DECIMAL(18,6))) AS DOUBLE) AS signup,
       CAST(SUM(CAST(CASE WHEN event_type = 'view' THEN value END
                     AS DECIMAL(18,6))) AS DOUBLE) AS view
FROM events
GROUP BY 1
""",
)
def q_pivot(spark, sf_dir):
    """PIVOT: day x event_type matrix of value sums. Explicit pivot
    values keep the plan single-pass (no distinct-scan to discover
    columns) — at scale the column set must be declared, not inferred.
    A day with no events of a type is NULL in both engines (CASE with
    no ELSE on the oracle side)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(_dsum(F.col("value")))
    )


@query(
    "q_unpivot",
    oracle="""
SELECT measure, CAST(SUM(CAST(val AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM (
  SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
) m
GROUP BY measure
ORDER BY measure
""",
)
def q_unpivot(spark, sf_dir):
    """UNPIVOT (melt): three lineitem measures into (measure, val) rows
    — one pass over the fact table emitting 3 rows per input row
    map-side, vs the oracle's 3-scan UNION ALL; then a tiny re-agg
    proves the reshape. The 100 TB form of 'wide metrics to long'."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return (
        long.groupBy("measure")
        .agg(_dsum(F.col("val"), scale=4).alias("total"))
        .orderBy("measure")
    )


@query(
    "q_join_asof",
    oracle=f"""
SELECT event_id, user_id, strftime(ts, '{_FMT}') AS ts, last_click_id
FROM (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
         last_value(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id
                 ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click_id
  FROM events
) w
WHERE event_type = 'purchase'
""",
)
def q_join_asof(spark, sf_dir):
    """AS-OF join: each purchase paired with the user's most recent
    strictly-earlier click (NULL if none). No join at all: one window
    sorted on (ts, event_id) per user carries the last click id
    forward — a single shuffle on user_id, linear in the log, where
    the naive formulation (theta-join + argmax) re-pairs every
    purchase with every prior click. This is how Spark expresses the
    as-of join it lacks natively."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ck = F.when(F.col("event_type") == "click", F.col("event_id"))
    return (
        e.withColumn("last_click_id", F.last(ck, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "last_click_id",
        )
    )


@query(
    "q_join_range",
    oracle="""
SELECT e1.user_id, e1.event_id AS id1, e2.event_id AS id2,
       epoch_us(CAST(e2.ts AS TIMESTAMP)) - epoch_us(CAST(e1.ts AS TIMESTAMP))
           AS gap_us
FROM events e1
JOIN events e2
  ON e1.user_id = e2.user_id
 AND e2.ts > e1.ts
 AND e2.ts <= e1.ts + INTERVAL 30 MINUTE
""",
)
def q_join_range(spark, sf_dir):
    """Range (interval) self-join: ordered event pairs of the same user
    at most 30 minutes apart. The join key is (user_id, 30-min bucket)
    — the follower side also probes the preceding bucket, so the
    blocking is LOSSLESS for a 30-min radius while the shuffle only
    pairs rows that can possibly match (a bare user_id equi-join goes
    quadratic per user on a 100 TB log; an unkeyed theta-join is a
    broadcast-nested-loop). The exact interval predicate verifies."""
    bucket_us = 30 * 60 * 1_000_000
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", F.unix_micros("ts").alias("_us")
    )
    a = e.select(
        "user_id",
        F.col("event_id").alias("id1"),
        F.col("_us").alias("_us1"),
        (F.col("_us") / bucket_us).cast("bigint").alias("_bkt"),
    )
    # follower rows probe their own bucket and the one before: ts2 in
    # (ts1, ts1+30min] implies bucket(ts2) - bucket(ts1) is 0 or 1
    b = (
        e.select(
            F.col("user_id").alias("_uid2"),
            F.col("event_id").alias("id2"),
            F.col("_us").alias("_us2"),
            (F.col("_us") / bucket_us).cast("bigint").alias("_b2"),
        )
        .withColumn("_bkt", F.explode(F.array(F.col("_b2"), F.col("_b2") - 1)))
        .drop("_b2")
    )
    return (
        a.join(b, (a["user_id"] == b["_uid2"]) & (a["_bkt"] == b["_bkt"]))
        .filter(
            (F.col("_us2") > F.col("_us1"))
            & (F.col("_us2") <= F.col("_us1") + bucket_us)
        )
        .select(
            "user_id",
            "id1",
            "id2",
            (F.col("_us2") - F.col("_us1")).alias("gap_us"),
        )
    )


@query(
    "q_dedup_latest",
    oracle=f"""
SELECT user_id, event_id, strftime(ts, '{_FMT}') AS ts, value
FROM (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                     event_id DESC) AS rn
  FROM events
) w
WHERE rn = 1
""",
)
def q_dedup_latest(spark, sf_dir):
    """Latest-per-key dedup: keep each user's newest event — the
    canonical 'current snapshot from an append-only log' step. One
    window shuffle on the key; ties on ts break by event_id so the
    survivor is deterministic on both engines."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "value",
        )
    )
