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


Z_FLAG = 3.0


@query(
    "q_events_outliers",
    oracle=f"""
WITH c AS (
  SELECT event_id, event_type, value,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
s AS (
  SELECT event_type, count(*) AS n,
         SUM(cents) AS s1i, SUM(CAST(cents AS HUGEINT) * cents) AS s2i
  FROM c GROUP BY 1
),
st AS (
  SELECT event_type,
         CAST(s1i AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)) AS mean_value,
         sqrt(CAST(n * s2i - s1i * s1i AS DOUBLE))
           / (100.0 * sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
             AS sd_value
  FROM s
)
SELECT e.event_id, e.event_type, e.value,
       CASE WHEN st.sd_value > 0
            THEN (e.value - st.mean_value) / st.sd_value
            ELSE 0 END AS zscore,
       CAST(CASE WHEN st.sd_value > 0
                  AND abs((e.value - st.mean_value) / st.sd_value) > {Z_FLAG}
                 THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM events e JOIN st USING (event_type)
""",
)
def q_events_outliers(spark, sf_dir):
    """Statistical outlier flagging (z-score QC) per event_type — the
    numeric-column twin of q_text_rules_filter's text gates: every
    event annotated with its within-group z-score and a |z| > 3 flag,
    the standard screen a pipeline runs before treating `value` as a
    training signal.

    Bit-exactness: `value` carries two decimal places, so the moments
    are computed in EXACT integer cents (floor(v*100 + 0.5), the
    engine-portable rounding). The moment sums and the n*s2 - s1^2
    variance numerator run in DECIMAL(38,0) on the Spark side and
    HUGEINT (DuckDB's native int128 SUM type) on the oracle side —
    different carriers, the SAME exact integers, converging at a
    single correctly-rounded cast to double (ADVICE r5: the earlier
    BIGINT numerator had s1^2 overflowing int64 once a group's summed
    cents passed ~1e9, which ANSI Spark turns into a throw at larger
    scale factors; 38 digits moves that wall to ~1e19 summed cents).
    The remaining float chain is
    sqrt/divide only — deliberately: the first cut of this key
    computed variance as (S2 - S1*S1/n)/(n-1) in doubles and DuckDB's
    fused multiply-add produced a 1-ulp sd difference on one group
    (measured: 4049441f15b2c4c1 vs ...c0); an integer numerator leaves
    no a*b+c shape for either engine to fuse. sqrt is
    IEEE-correctly-rounded; each division is a single op with
    identical association on both sides.

    Scale shape: one partial-aggregated shuffle for the event_type
    moments (group-count-sized result), broadcast back over the
    streamed log for the per-row annotate — the same two-phase
    stats-then-scan posture as q_search_bm25's corpus statistics."""
    e = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    dc = cents.cast("decimal(18,0)")
    s = e.select("event_type", dc.alias("_c")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_c").alias("_s1i"),
        F.sum(F.col("_c") * F.col("_c")).alias("_s2i"),
    )
    nd = F.col("n").cast("double")
    num = (
        F.col("n").cast("decimal(38,0)") * F.col("_s2i")
        - F.col("_s1i") * F.col("_s1i")
    ).cast("double")
    mean = F.col("_s1i").cast("double") / (F.lit(100.0) * nd)
    sd = F.sqrt(num) / (F.lit(100.0) * F.sqrt(nd * (nd - F.lit(1.0))))
    stats = s.select(
        "event_type", mean.alias("mean_value"), sd.alias("sd_value")
    )
    z = (F.col("value") - F.col("mean_value")) / F.col("sd_value")
    zscore = F.when(F.col("sd_value") > 0, z).otherwise(F.lit(0.0))
    flagged = (
        F.when((F.col("sd_value") > 0) & (F.abs(z) > Z_FLAG), 1)
        .otherwise(0)
        .cast("bigint")
    )
    return (
        e.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            zscore.alias("zscore"),
            flagged.alias("flagged"),
        )
    )


SESSION_GAP_MIN = 30


@query(
    "q_events_gaps",
    oracle=f"""
WITH seq AS (
  SELECT user_id,
         epoch_us(CAST(ts AS TIMESTAMP))
           - lag(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id
                     ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
           AS gap_us
  FROM events WHERE ts IS NOT NULL
)
SELECT user_id,
       CAST(count(*) + 1 AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
       CAST(SUM(gap_us) AS DOUBLE) / (1000000.0 * count(*)) AS mean_gap_s,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
       CAST(1 + SUM(CASE WHEN gap_us > {SESSION_GAP_MIN} * 60 * 1000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM seq WHERE gap_us IS NOT NULL
GROUP BY user_id
""",
)
def q_events_gaps(spark, sf_dir):
    """Per-user inter-event gap statistics — the activity-cadence
    diagnostic behind sessionization tuning (pick the session_window
    gap by LOOKING at the gap distribution, not guessing): event
    count, gap count, total/mean/max gap, and the session count a
    30-minute gap rule implies. Complements
    q_stream_session (which APPLIES a gap rule) and q_retention_cohorts
    (day-grain) with the second-grain cadence view.

    Exactness: gaps are exact integer microseconds (unix_micros /
    epoch_us lags with an (ts, event_id) total order); sums and maxes
    stay BIGINT; the single double division per row has identical
    association on both engines. Users with one event have no gaps and
    are excluded by definition (documented, deterministic both sides).

    Scale shape: one hash shuffle on user_id shared by the lag window
    and the rollup (same partitioning, Catalyst plans a single
    exchange — the q_scd2_history posture); output is user-count-sized.
    At 100 TB this is the classic sessionization pre-pass."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    # NULL ts rows are excluded BEFORE the lag on both sides: Spark's
    # ASC sorts NULLs first while DuckDB's default sorts them last, so
    # an unfiltered NULL would shift different neighbors' gaps to NULL
    # on each engine — a latent hash break on testdata regeneration.
    seq = (
        e.filter(F.col("ts").isNotNull())
        .select("user_id", "event_id", F.unix_micros("ts").alias("_us"))
        .withColumn("gap_us", F.col("_us") - F.lag("_us").over(w))
        .filter(F.col("gap_us").isNotNull())
    )
    n_gaps = F.count(F.lit(1))
    session_cut = F.lit(SESSION_GAP_MIN * 60 * 1_000_000)
    return seq.groupBy("user_id").agg(
        (n_gaps + 1).cast("bigint").alias("n_events"),
        n_gaps.cast("bigint").alias("n_gaps"),
        F.sum("gap_us").cast("bigint").alias("sum_gap_us"),
        (F.sum("gap_us").cast("double") / (F.lit(1000000.0) * n_gaps)).alias(
            "mean_gap_s"
        ),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
        (
            F.lit(1)
            + F.sum(F.when(F.col("gap_us") > session_cut, 1).otherwise(0))
        ).cast("bigint").alias("n_sessions"),
    )


PATTERN = ("view", "click", "purchase")


@query(
    "q_events_pattern",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         lead(event_type, 1) OVER w AS et1,
         lead(event_id, 1) OVER w AS id1,
         lead(event_type, 2) OVER w AS et2,
         lead(event_id, 2) OVER w AS id2,
         lead(epoch_us(CAST(ts AS TIMESTAMP)), 2) OVER w AS us2
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id
               ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
)
SELECT user_id,
       event_id AS start_event, id1 AS mid_event, id2 AS end_event,
       CAST(us2 - us AS BIGINT) AS span_us
FROM seq
WHERE event_type = '{PATTERN[0]}' AND et1 = '{PATTERN[1]}'
  AND et2 = '{PATTERN[2]}'
""",
)
def q_events_pattern(spark, sf_dir):
    """Event-sequence pattern detection (the MATCH_RECOGNIZE / CEP
    family): per user, every CONSECUTIVE {' -> '.join(PATTERN)} triple
    in the (ts, event_id)-ordered stream, with its exact completion
    span — the conversion-path matcher whose
    funnel-rate cousin is q_funnel_stages (that key asks "did the user
    ever convert"; this one emits each matched occurrence with its
    exact span). Strictly-consecutive semantics = MATCH_RECOGNIZE's
    default row pattern A B C with no skips; a skip-tolerant variant
    is the same window with a per-type filter pushed before it, and a
    WITHIN-t constraint is one more span_us conjunct (omitted here:
    this corpus's per-user cadence is ~days, so any sub-hour window
    would pin an empty — vacuous — result).

    Exactness: matches are identified by event ids (exact integers)
    and an exact integer-microsecond span; the (ts, event_id) total
    order pins tie-breaks on both engines; NULL ts excluded before the
    window (same hazard note as q_events_gaps).

    Scale shape: one hash shuffle on user_id for the lead window (no
    self-joins — the classic CEP-on-windows mapping), then a map-side
    pattern filter; output is match-count-sized. At 100 TB this is the
    shape streaming CEP engines compile to, and the streaming mirror
    is the same builder over session-scoped state."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seq = (
        e.filter(F.col("ts").isNotNull())
        .select(
            "user_id", "event_id", "event_type",
            F.unix_micros("ts").alias("us"),
        )
        .select(
            "user_id", "event_id", "event_type", "us",
            F.lead("event_type", 1).over(w).alias("et1"),
            F.lead("event_id", 1).over(w).alias("id1"),
            F.lead("event_type", 2).over(w).alias("et2"),
            F.lead("event_id", 2).over(w).alias("id2"),
            F.lead("us", 2).over(w).alias("us2"),
        )
    )
    return (
        seq.filter(
            (F.col("event_type") == PATTERN[0])
            & (F.col("et1") == PATTERN[1])
            & (F.col("et2") == PATTERN[2])
        )
        .select(
            "user_id",
            F.col("event_id").alias("start_event"),
            F.col("id1").alias("mid_event"),
            F.col("id2").alias("end_event"),
            (F.col("us2") - F.col("us")).cast("bigint").alias("span_us"),
        )
    )


# ------------------------------------------- Z-order layout audit

_Z_BITS = 16
_Z_BUCKET_SHIFT = 2 * _Z_BITS - 6  # top 6 interleaved bits -> 64 buckets


def _z_interleave(x: str, y: str, div: str) -> str:
    """Morton (Z-order) interleave of two {_Z_BITS}-bit non-negative
    ints as pure arithmetic — bit i of x lands at position 2i, bit i of
    y at 2i+1. ``div`` is the dialect's integer-division token (Spark
    ``div``, DuckDB ``//``); %, * and + round identically for
    non-negative operands, so the expression is engine-portable."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({x}) {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({y}) {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@query(
    "q_zorder_layout",
    oracle=f"""
WITH pts AS (
  SELECT user_id % {1 << _Z_BITS} AS x,
         (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) % {1 << _Z_BITS} AS y
  FROM events WHERE ts IS NOT NULL
),
z AS (
  SELECT x, y, ({_z_interleave('x', 'y', '//')}) // {1 << _Z_BUCKET_SHIFT}
             AS zbucket
  FROM pts
)
SELECT zbucket, CAST(count(*) AS BIGINT) AS n,
       CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
       CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
FROM z GROUP BY zbucket
""",
)
def q_zorder_layout(spark, sf_dir):
    """Z-order (Morton-curve) clustering audit — the multi-dimensional
    data-layout operator behind Delta's OPTIMIZE ZORDER BY and
    Iceberg's sort orders (public Morton-order literature; Morton
    1966): events mapped to a 2-D (user, time-second) grid, each point
    given its Morton code, and the corpus bucketed by the code's top
    bits. Emits per-bucket row count + min/max of BOTH dimensions —
    exactly the file-skipping statistics a lakehouse writer would
    store, demonstrating the Z-property: every bucket bounds BOTH
    dimensions, so a predicate on user OR time prunes buckets (1-D
    range partitioning bounds only its own sort key).

    Engine-portable bit math: the interleave is generated once
    (arithmetic div/mod, no dialect-specific bit operators) and pasted
    into both the Spark expression and the oracle SQL, so the codes
    are identical by construction.

    Scale shape: pure map work (codegen'd arithmetic per row) + ONE
    partial-aggregated shuffle on the bucket key — the same cost as
    any single groupBy pass. At 100 TB this runs as the analysis
    stage before a repartitionByRange(zbucket) rewrite; the stats
    output IS the pruning manifest."""
    e = load_table(spark, sf_dir, "events")
    pts = e.filter(F.col("ts").isNotNull()).select(
        (F.col("user_id") % (1 << _Z_BITS)).alias("x"),
        F.expr(
            f"(unix_micros(ts) div 1000000) % {1 << _Z_BITS}"
        ).alias("y"),
    )
    z = pts.select(
        "x",
        "y",
        F.expr(
            f"({_z_interleave('x', 'y', 'div')}) div {1 << _Z_BUCKET_SHIFT}"
        ).alias("zbucket"),
    )
    return z.groupBy("zbucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("x").cast("bigint").alias("min_x"),
        F.max("x").cast("bigint").alias("max_x"),
        F.min("y").cast("bigint").alias("min_y"),
        F.max("y").cast("bigint").alias("max_y"),
    )


# ----------------------------------- event-type transition matrix


@query(
    "q_events_transitions",
    oracle="""
WITH seq AS (
  SELECT event_type AS cur_type,
         lead(event_type) OVER (
             PARTITION BY user_id
             ORDER BY CAST(ts AS TIMESTAMP), event_id
         ) AS next_type
  FROM events WHERE ts IS NOT NULL
),
c AS (
  SELECT cur_type, next_type, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY cur_type, next_type
)
SELECT cur_type, next_type, CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE)
           / CAST(sum(n) OVER (PARTITION BY cur_type) AS DOUBLE) AS p
FROM c
""",
)
def q_events_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: for every ordered (current, next) event-type adjacency
    the raw count and the row-stochastic probability
    P(next | current). The sessionization-analytics staple — funnel
    drop-off, loop detection, anomalous-path mining all read off this
    matrix — and the behavioral-cloning prior a training-data pipeline
    computes before sampling trajectories.

    Plan shape: ONE shuffle on user_id for the lead() window (sequence
    adjacency needs per-user time order, nothing else), then a
    partial-aggregated groupBy on the (cur, next) pair — event-type
    cardinality squared rows at most, so the second shuffle is tiny.
    The probability is a window sum over the AGGREGATED matrix
    (|types|^2 rows), not the event log: at 100 TB the heavy data is
    touched exactly once.

    Exactness: counts are integers; p is ONE division of two exact
    bigints with identical shape in both engines — no float
    accumulation (CLAUDE.md FMA rule)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NULL ts excluded BEFORE the lead on both sides (the
    # q_events_gaps rule): Spark sorts NULLs first, DuckDB last, so an
    # unfiltered NULL would pair different adjacencies per engine
    seq = e.filter(F.col("ts").isNotNull()).select(
        F.col("event_type").alias("cur_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )
    c = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("cur_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("cur_type")
    return c.select(
        "cur_type",
        "next_type",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("double") / F.sum("n").over(wt).cast("double")).alias(
            "p"
        ),
    )


# ---------------- hypertable-style time-hierarchy continuous rollup


@query(
    "q_events_rollup",
    oracle="""
WITH e AS (
  SELECT event_type,
         CAST(year(CAST(ts AS TIMESTAMP)) AS BIGINT) AS y,
         CAST(month(CAST(ts AS TIMESTAMP)) AS BIGINT) AS m,
         CAST(day(CAST(ts AS TIMESTAMP)) AS BIGINT) AS d,
         value
  FROM events WHERE ts IS NOT NULL
)
SELECT event_type, y, m, d,
       CASE WHEN GROUPING(d) = 0 THEN 'day'
            WHEN GROUPING(m) = 0 THEN 'month'
            WHEN GROUPING(y) = 0 THEN 'year'
            WHEN GROUPING(event_type) = 0 THEN 'type'
            ELSE 'all' END AS grain,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM e GROUP BY ROLLUP (event_type, y, m, d)
""",
)
def q_events_rollup(spark, sf_dir):
    """Hypertable-style continuous aggregate: one ROLLUP pass
    materializes the per-(type, day), per-(type, month), per-(type,
    year), per-type and grand-total grains of the event stream — the
    multi-grain rollup a time-series store keeps as downsampled
    hypertables, labeled per row so a serving layer can route a query
    to its grain.

    Exactness: time parts are integer extractions from the UTC-pinned
    loader timestamps; counts are bigint; the value sum uses the
    decimal(18,6)-cast trick on both engines (the q_stream_* rule), so
    every grain is bit-exact. NULL-ts rows are excluded on both sides
    (the q_events_gaps rule) so rollup NULLs unambiguously mean
    grain-level aggregation; the grain label is derived from
    per-column GROUPING flags — portable, unlike engines'
    differently-bit-ordered grouping_id.

    Scale: Spark expands the rollup with a partial aggregate BEFORE
    the single shuffle on the grouping-set id — the map-side combine
    keeps shuffle volume at (groups x 5 grains), not the event count;
    this is exactly how a 100 TB continuous-aggregate backfill should
    run (one pass, no per-grain rescans)."""
    e = load_table(spark, sf_dir, "events")
    base = e.filter(F.col("ts").isNotNull()).select(
        "event_type",
        F.year("ts").cast("bigint").alias("y"),
        F.month("ts").cast("bigint").alias("m"),
        F.dayofmonth("ts").cast("bigint").alias("d"),
        "value",
    )
    grain = (
        F.when(F.grouping("d") == 0, F.lit("day"))
        .when(F.grouping("m") == 0, F.lit("month"))
        .when(F.grouping("y") == 0, F.lit("year"))
        .when(F.grouping("event_type") == 0, F.lit("type"))
        .otherwise(F.lit("all"))
    )
    return (
        base.rollup("event_type", "y", "m", "d")
        .agg(
            grain.alias("grain"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            _dsum(F.col("value")).alias("sum_value"),
        )
        .select("event_type", "y", "m", "d", "grain", "cnt", "sum_value")
    )
