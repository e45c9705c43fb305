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

from pyspark.sql import Window
from pyspark.sql import functions as F

from hive_similarity_join_spark.registry import query
from hive_similarity_join_spark.operators.rank import ranked_topk
from hive_similarity_join_spark.operators.scan import grouped_prefix_scan
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


# --------------------------------- zone-map file-skipping audit

_ZM_CHUNK = 512  # rows per simulated file chunk
_ZM_PW = 1 << 14  # probe width: a quarter of the 2^16 domain
_ZM_NP = 4


def _zm_probe_rows_sql() -> str:
    return ", ".join(
        f"('{dim}', {p}, {p * _ZM_PW}, {p * _ZM_PW + _ZM_PW - 1})"
        for dim in ("x", "y")
        for p in range(_ZM_NP)
    )


@query(
    "q_zonemap_pruning",
    oracle=f"""
WITH pts AS (
  SELECT event_id,
         user_id % {1 << _Z_BITS} AS x,
         (epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) % {1 << _Z_BITS} AS y
  FROM events WHERE ts IS NOT NULL
),
z AS (
  SELECT event_id, x, y, ({_z_interleave('x', 'y', '//')}) AS zc
  FROM pts
),
ra AS (
  SELECT x, y, row_number() OVER (ORDER BY event_id) AS r FROM z
),
rz AS (
  SELECT x, y, row_number() OVER (ORDER BY zc, event_id) AS r FROM z
),
chunks AS (
  SELECT 'arrival' AS layout, (r - 1) // {_ZM_CHUNK} AS chunk,
         count(*) AS n, min(x) AS min_x, max(x) AS max_x,
         min(y) AS min_y, max(y) AS max_y
  FROM ra GROUP BY 2
  UNION ALL
  SELECT 'zorder', (r - 1) // {_ZM_CHUNK},
         count(*), min(x), max(x), min(y), max(y)
  FROM rz GROUP BY 2
),
probes AS (
  SELECT * FROM (VALUES {_zm_probe_rows_sql()}) pr(dim, probe, lo, hi)
),
j AS (
  SELECT c.layout, p.dim, p.probe, c.n,
         CASE WHEN (p.dim = 'x' AND (c.max_x < p.lo OR c.min_x > p.hi))
                OR (p.dim = 'y' AND (c.max_y < p.lo OR c.min_y > p.hi))
              THEN 1 ELSE 0 END AS skipped
  FROM chunks c, probes p
)
SELECT layout, dim, CAST(probe AS BIGINT) AS probe,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(skipped) AS BIGINT) AS n_skipped,
       CAST(sum(CASE WHEN skipped = 0 THEN n ELSE 0 END) AS BIGINT)
           AS rows_scanned,
       CAST(sum(skipped) AS DOUBLE) / count(*) AS skip_frac
FROM j GROUP BY layout, dim, probe
""",
)
def q_zonemap_pruning(spark, sf_dir):
    """Zone-map FILE-SKIPPING audit — what q_zorder_layout's pruning
    manifest actually BUYS: the corpus is cut into simulated
    {CH}-row file chunks under two physical layouts (arrival order =
    event_id; Z-order = the Morton code q_zorder_layout computes),
    each chunk gets the lakehouse writer's min/max zone maps on both
    grid dimensions, and a fixed grid of 2x{NP} quarter-domain range
    probes (x = user band, y = time-second band) is evaluated against
    the maps. Per (layout, dim, probe): chunk count, chunks a scanner
    SKIPS (probe range disjoint from [min, max]), rows it still
    scans, and the skip fraction — the I/O-savings sheet that decides
    whether an OPTIMIZE ZORDER rewrite pays for itself. The Z-curve's
    selling point is measured, not asserted: one interleaved order
    bounds BOTH dimensions per chunk, where arrival order prunes only
    what it happens to correlate with.

    Determinism: both chunkings derive from strict total orders
    (event_id; (z-code, event_id)); the interleave is the same
    generated arithmetic both engines run in q_zorder_layout; all
    stats are exact integers plus one BIGINT/BIGINT divide.

    Scale shape: two two-pass global ranks (operators/rank.ranked_by
    — range-partitioned prefix scan, no single-partition window),
    one partial-aggregated groupBy per layout on the chunk id, then
    a chunk-count-sized cross join against 8 literal probes — the
    audit costs two scans of the fact table regardless of probe
    count. At 100 TB the chunk relation IS the file manifest, and
    this query runs against the table's stats, not its rows.""".format(
        CH=_ZM_CHUNK, NP=_ZM_NP
    )
    from hive_similarity_join_spark.operators.rank import ranked_by

    e = load_table(spark, sf_dir, "events")
    pts = e.filter(F.col("ts").isNotNull()).select(
        "event_id",
        (F.col("user_id") % (1 << _Z_BITS)).alias("x"),
        F.expr(
            f"(unix_micros(ts) div 1000000) % {1 << _Z_BITS}"
        ).alias("y"),
    )
    z = pts.withColumn(
        "zc", F.expr(_z_interleave("x", "y", "div"))
    )
    chunks = None
    for layout, order in (("arrival", ["event_id"]), ("zorder", ["zc", "event_id"])):
        rk = ranked_by(z, order, "r")
        leg = (
            rk.select(
                "x", "y", F.expr(f"(r - 1) div {_ZM_CHUNK}").alias("chunk")
            )
            .groupBy("chunk")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("x").alias("min_x"),
                F.max("x").alias("max_x"),
                F.min("y").alias("min_y"),
                F.max("y").alias("max_y"),
            )
            .select(F.lit(layout).alias("layout"), "*")
        )
        chunks = leg if chunks is None else chunks.unionByName(leg)
    probes = spark.createDataFrame(
        [
            (dim, p, p * _ZM_PW, p * _ZM_PW + _ZM_PW - 1)
            for dim in ("x", "y")
            for p in range(_ZM_NP)
        ],
        "dim string, probe int, lo bigint, hi bigint",
    )
    x_miss = (F.col("max_x") < F.col("lo")) | (F.col("min_x") > F.col("hi"))
    y_miss = (F.col("max_y") < F.col("lo")) | (F.col("min_y") > F.col("hi"))
    skipped = F.when(
        ((F.col("dim") == "x") & x_miss) | ((F.col("dim") == "y") & y_miss),
        1,
    ).otherwise(0)
    return (
        chunks.crossJoin(F.broadcast(probes))
        .select("layout", "dim", "probe", "n", skipped.alias("skipped"))
        .groupBy("layout", "dim", "probe")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum("skipped").cast("bigint").alias("n_skipped"),
            F.sum(F.when(F.col("skipped") == 0, F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("rows_scanned"),
            (F.sum("skipped").cast("double") / F.count(F.lit(1))).alias(
                "skip_frac"
            ),
        )
        .select(
            "layout",
            "dim",
            F.col("probe").cast("bigint").alias("probe"),
            "n_chunks",
            "n_skipped",
            "rows_scanned",
            "skip_frac",
        )
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


# ---------------- CUSUM changepoint detection per event stream


@query(
    "q_events_cusum",
    oracle=f"""
WITH e AS (
  SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS tsu,
         CAST(value AS DECIMAL(18,6)) AS x
  FROM events WHERE ts IS NOT NULL
),
tot AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DECIMAL(28,6)) AS s
  FROM e GROUP BY event_type
),
pre AS (
  SELECT e.event_type, e.tsu, e.event_id, t.n,
         CAST(SUM(x) OVER w AS DECIMAL(28,6)) * t.n
           - (ROW_NUMBER() OVER w) * t.s AS pp
  FROM e JOIN tot t USING (event_type)
  WINDOW w AS (PARTITION BY e.event_type ORDER BY e.tsu, e.event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
st AS (
  SELECT event_type, tsu, event_id, n,
         pp - least(min(pp) OVER w, CAST(0 AS DECIMAL(38,6))) AS s_pos,
         greatest(max(pp) OVER w, CAST(0 AS DECIMAL(38,6))) - pp AS s_neg
  FROM pre
  WINDOW w AS (PARTITION BY event_type ORDER BY tsu, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
agg AS (
  SELECT event_type, any_value(n) AS n,
         round(CAST(max(s_pos) AS DOUBLE) / any_value(n), 6) AS cusum_pos,
         round(CAST(max(s_neg) AS DOUBLE) / any_value(n), 6) AS cusum_neg
  FROM st GROUP BY event_type
),
cp AS (
  SELECT event_type, tsu,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY s_pos DESC, tsu, event_id) AS rn
  FROM st
)
SELECT a.event_type, a.n, a.cusum_pos, a.cusum_neg,
       strftime(c.tsu, '{_FMT}') AS changepoint_ts
FROM agg a JOIN cp c ON a.event_type = c.event_type AND c.rn = 1
""",
)
def q_events_cusum(spark, sf_dir):
    """Two-sided CUSUM changepoint scan per event-type stream — the
    mean-shift detector a metrics pipeline runs over each series to
    flag when a level change happened (deploy regressions, traffic
    shifts). Reports, per type, the maximum positive and negative
    CUSUM excursions around the series mean and the timestamp of the
    positive peak (the estimated changepoint).

    The textbook recursion S_k = max(0, S_{{k-1}} + (x_k - mu)) is not
    a window function, but it has a closed form over prefix sums:
    S_k = P_k - min(0, min_{{j<=k}} P_j) with P_k = sum_{{i<=k}}
    (x_i - mu). Multiplying through by n removes the mean division:
    n*P_k = n*prefix_k - k*total — every term an EXACT decimal
    (decimal(28,6) prefix x bigint -> decimal(38,6), verified
    saturating-not-rounding on both engines), so the running min/max
    and subtraction stay exact; the only doubles are the final
    divide-by-n and presentation round (the CLAUDE.md decimal rule).
    The negative excursion uses the mirrored identity with the
    running max. (tsu, event_id) gives a total order, so ranks and
    prefix sums are reproducible under any partitioning.

    Scale: both prefix passes run as two-pass distributed scans
    (operators/scan.py — range-partitioned on (type, time), so one
    series spans MANY tasks; see the r10 de-weak note below); the
    totals join is a 5-row broadcast and the changepoint argmax plans
    as WindowGroupLimit (one row per group per partition before the
    shuffle).
    """
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.col("ts").alias("tsu"),
            F.col("value").cast("decimal(18,6)").alias("x"),
        )
    )
    tot = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(28,6)").alias("s"),
    )
    # r10 de-weak: events has 5 types, so the prefix windows partitioned
    # by event_type would sort the whole fact table through 5 tasks.
    # Two chained distributed scans (operators/scan.py) compute the
    # SAME prefix quantities at full cluster width: pass 1 the running
    # value sum and rank (rank = running sum of ones), pass 2 the
    # running extrema of the bridge statistic pp. Types retrace the
    # original window arithmetic exactly: window-sum decimal(18,6) ->
    # (28,6) equals the scan's widen-then-cast; rank-as-bigint times
    # decimal equals row_number-as-int times decimal.
    p1 = grouped_prefix_scan(
        e.withColumn("one", F.lit(1)),
        ["event_type"],
        ["tsu", "event_id"],
        [("x", "sum", "_ps"), ("one", "sum", "_rn")],
    )
    pre = p1.join(F.broadcast(tot), "event_type").withColumn(
        "pp",
        F.col("_ps").cast("decimal(28,6)") * F.col("n")
        - F.col("_rn") * F.col("s"),
    )
    p2 = grouped_prefix_scan(
        pre.select("event_type", "tsu", "event_id", "n", "pp"),
        ["event_type"],
        ["tsu", "event_id"],
        [("pp", "min", "_mn"), ("pp", "max", "_mx")],
    )
    zero = F.lit(0).cast("decimal(38,6)")
    st = p2.select(
        "event_type",
        "tsu",
        "event_id",
        "n",
        (F.col("pp") - F.least(F.col("_mn"), zero)).alias("s_pos"),
        (F.greatest(F.col("_mx"), zero) - F.col("pp")).alias("s_neg"),
    )
    agg = st.groupBy("event_type").agg(
        F.any_value("n").alias("n"),
        F.round(
            F.max("s_pos").cast("double") / F.any_value("n"), 6
        ).alias("cusum_pos"),
        F.round(
            F.max("s_neg").cast("double") / F.any_value("n"), 6
        ).alias("cusum_neg"),
    )
    wcp = Window.partitionBy("event_type").orderBy(
        F.col("s_pos").desc(), "tsu", "event_id"
    )
    cp = (
        st.withColumn("rn", F.row_number().over(wcp))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format("tsu", "yyyy-MM-dd HH:mm:ss").alias("changepoint_ts"),
        )
    )
    return agg.join(cp, "event_type").select(
        "event_type", "n", "cusum_pos", "cusum_neg", "changepoint_ts"
    )


# ---------------- time-grid resample with forward fill (gap-fill)


@query(
    "q_time_gapfill",
    oracle=f"""
WITH slotted AS (
  SELECT event_type,
         to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) * 900
                      AS BIGINT)) AS slot,
         CAST(value AS DECIMAL(18,6)) AS x
  FROM events WHERE ts IS NOT NULL
),
agg AS (
  SELECT event_type, slot, CAST(count(*) AS BIGINT) AS cnt,
         CAST(SUM(x) AS DECIMAL(28,6)) AS slot_sum
  FROM slotted GROUP BY event_type, slot
),
span AS (
  SELECT event_type, min(slot) AS s0, max(slot) AS s1 FROM agg GROUP BY 1
),
grid AS (
  SELECT event_type, unnest(generate_series(s0, s1, INTERVAL 15 MINUTE)) AS slot
  FROM span
),
joined AS (
  SELECT g.event_type, g.slot, a.cnt, a.slot_sum
  FROM grid g LEFT JOIN agg a USING (event_type, slot)
)
SELECT event_type,
       strftime(slot, '{_FMT}') AS slot_start,
       COALESCE(cnt, 0) AS cnt,
       CAST(CASE WHEN cnt IS NULL THEN 1 ELSE 0 END AS BIGINT) AS gap_filled,
       CAST(last_value(slot_sum IGNORE NULLS)
              OVER (PARTITION BY event_type ORDER BY slot
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS filled_sum
FROM joined
""",
)
def q_time_gapfill(spark, sf_dir):
    """Fixed-grid resampling with forward fill — the hypertable
    `time_bucket_gapfill + locf` operation: every event-type series is
    projected onto a dense 15-minute grid spanning its observed range;
    empty slots appear explicitly (cnt=0, gap_filled=1) carrying the
    last observed slot aggregate forward. This is what turns an
    irregular event stream into the regular series a forecasting or
    anomaly model trains on.

    Exactness: slot assignment is integer epoch math (the
    q_stream_sliding floor rule); per-slot sums stay decimal through
    the LOCF window (``last(ignorenulls)`` over a total order — slots
    are unique per type) and cast to double only at emission; grid
    timestamps come from the same sequence arithmetic on both engines
    and are emitted as formatted strings. The first grid slot per type
    is an observed slot (span minimum), so LOCF never emits NULL.

    Scale: the slot aggregation is a map-side-combined shuffle on
    (type, slot) — grid density is slots-per-span, INDEPENDENT of the
    event count, so the gap-fill join and window run on the tiny grid
    relation; at 100 TB the heavy table is touched once, everything
    downstream is O(grid). The sequence explode generates each type's
    grid in its span row — no driver loop."""
    e = load_table(spark, sf_dir, "events")
    slotted = e.filter(F.col("ts").isNotNull()).select(
        "event_type",
        F.window("ts", "15 minutes")["start"].alias("slot"),
        F.col("value").cast("decimal(18,6)").alias("x"),
    )
    agg = slotted.groupBy("event_type", "slot").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("x").cast("decimal(28,6)").alias("slot_sum"),
    )
    span = agg.groupBy("event_type").agg(
        F.min("slot").alias("s0"), F.max("slot").alias("s1")
    )
    grid = span.select(
        "event_type",
        F.explode(
            F.sequence("s0", "s1", F.expr("interval 15 minutes"))
        ).alias("slot"),
    )
    joined = grid.join(agg, ["event_type", "slot"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        F.date_format("slot", "yyyy-MM-dd HH:mm:ss").alias("slot_start"),
        F.coalesce(F.col("cnt"), F.lit(0).cast("bigint")).alias("cnt"),
        F.when(F.col("cnt").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("gap_filled"),
        F.last("slot_sum", ignorenulls=True).over(w).cast("double").alias(
            "filled_sum"
        ),
    )


# ---------------- conversion attribution (first / last touch)


@query(
    "q_events_attribution",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS tsu,
         CAST(value AS DECIMAL(18,6)) AS x
  FROM events WHERE ts IS NOT NULL
),
seg AS (
  SELECT *,
         COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY tsu, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS seg_id
  FROM e
),
touched AS (
  SELECT *,
         first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                     IGNORE NULLS)
           OVER (PARTITION BY user_id, seg_id ORDER BY tsu, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ft,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id, seg_id ORDER BY tsu, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lt
  FROM seg
),
conv AS (
  SELECT COALESCE(ft, 'direct') AS ft, COALESCE(lt, 'direct') AS lt, x
  FROM touched WHERE event_type = 'purchase'
)
SELECT 'first_touch' AS model, ft AS touch_type,
       CAST(count(*) AS BIGINT) AS n_conversions,
       CAST(SUM(x) AS DOUBLE) AS revenue
FROM conv GROUP BY ft
UNION ALL
SELECT 'last_touch' AS model, lt AS touch_type,
       CAST(count(*) AS BIGINT) AS n_conversions,
       CAST(SUM(x) AS DOUBLE) AS revenue
FROM conv GROUP BY lt
""",
)
def q_events_attribution(spark, sf_dir):
    """Conversion attribution: every `purchase` credits its value to
    the user's FIRST and LAST preceding non-purchase touchpoint since
    the previous purchase (the two classic marketing-attribution
    models), with purchases that open a journey credited to `direct`.
    Journeys are gaps-and-islands segments: a running count of prior
    purchases per user splits the stream, so each conversion sees
    exactly the touches of its own journey.

    Exactness: segment ids and touch picks ride windows over the
    (tsu, event_id) total order; credited revenue sums decimal-cast
    values (the q_stream_* rule); first/last-touch picks are
    first/last_value IGNORE NULLS over the same frame on both engines.

    Scale: ONE shuffle on user_id sorts each user's history; the
    segment id, both touch picks, and the conversion filter all reuse
    that sort (window functions over the same partitioning chain
    without re-exchange); the final rollup is touch-type-sized. The
    two models share one scored relation — scanned twice only at the
    aggregation layer, where the relation is already
    conversions-only."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.col("ts").alias("tsu"),
            F.col("value").cast("decimal(18,6)").alias("x"),
        )
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("tsu", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_purchase = F.col("event_type") == "purchase"
    seg = e.withColumn(
        "seg_id",
        F.coalesce(
            F.sum(F.when(is_purchase, 1).otherwise(0)).over(wprev),
            F.lit(0),
        ),
    )
    wseg = (
        Window.partitionBy("user_id", "seg_id")
        .orderBy("tsu", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(~is_purchase, F.col("event_type"))
    conv = (
        seg.withColumn("ft", F.first(touch, ignorenulls=True).over(wseg))
        .withColumn("lt", F.last(touch, ignorenulls=True).over(wseg))
        .filter(is_purchase)
        .select(
            F.coalesce(F.col("ft"), F.lit("direct")).alias("ft"),
            F.coalesce(F.col("lt"), F.lit("direct")).alias("lt"),
            "x",
        )
    )
    first = conv.groupBy(F.col("ft").alias("touch_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
        F.sum("x").cast("double").alias("revenue"),
    ).select(F.lit("first_touch").alias("model"), "touch_type",
             "n_conversions", "revenue")
    last = conv.groupBy(F.col("lt").alias("touch_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
        F.sum("x").cast("double").alias("revenue"),
    ).select(F.lit("last_touch").alias("model"), "touch_type",
             "n_conversions", "revenue")
    return first.unionByName(last)


# ---------------- rolling time-interval window (RANGE frame)


@query(
    "q_events_rolling",
    oracle=f"""
WITH e AS (
  SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS tsu,
         CAST(value AS DECIMAL(18,6)) AS x
  FROM events WHERE ts IS NOT NULL
)
SELECT event_id, event_type, strftime(tsu, '{_FMT}') AS ts_str,
       CAST(count(*) OVER w AS BIGINT) AS roll_cnt,
       CAST(CAST(SUM(x) OVER w AS DECIMAL(28,6)) AS DOUBLE) AS roll_sum
FROM e
WINDOW w AS (PARTITION BY event_type ORDER BY tsu
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
)
def q_events_rolling(spark, sf_dir):
    """Trailing 1-hour rolling aggregate per event stream — the
    continuous sliding KPI ("errors in the last hour, as of each
    event") that q_stream_sliding's DISCRETE 15-minute hops
    approximate. A RANGE frame, not ROWS: every event's window is
    [ts - 1h, ts] by VALUE, so tied timestamps share one frame and
    the result is independent of tie order — which is exactly why no
    uid tie-break is needed (and why a ROWS frame would be wrong).
    Spark expresses the interval frame as rangeBetween over epoch
    microseconds — identical inclusive bounds to the oracle's
    INTERVAL PRECEDING.

    Exactness: frame sums accumulate decimals (the q_stream_* rule);
    the count is bigint; the anchor timestamp is emitted as a
    formatted string.

    Scale: one shuffle on event_type, one sort per partition; Spark
    evaluates the running RANGE frame with a sliding two-pointer over
    the sorted run (each row enters/leaves once — O(n) per
    partition, no per-row rescan). Per-(type, day) bucketing would
    bound partition width at 100 TB; the frame never crosses a day
    boundary by more than the window length, so day partitions
    overlap-extend by 1 hour — the standard watermark trick."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.col("ts").alias("tsu"),
            F.col("value").cast("decimal(18,6)").alias("x"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros("tsu"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "event_type",
        F.date_format("tsu", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("roll_cnt"),
        F.sum("x").over(w).cast("decimal(28,6)").cast("double").alias(
            "roll_sum"
        ),
    )


# ---------------- hour-of-day seasonality profile


@query(
    "q_events_seasonality",
    oracle="""
WITH c AS (
  SELECT event_type,
         CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hod,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE ts IS NOT NULL
),
h AS (
  SELECT event_type, hod, CAST(count(*) AS BIGINT) AS n_h,
         CAST(SUM(cents) AS BIGINT) AS s_h
  FROM c GROUP BY event_type, hod
),
g AS (
  SELECT event_type, CAST(SUM(n_h) AS BIGINT) AS n,
         CAST(SUM(s_h) AS BIGINT) AS s
  FROM h GROUP BY event_type
),
j AS (
  SELECT h.event_type, h.hod, h.n_h,
         CAST(h.s_h AS DOUBLE) / (100.0 * h.n_h) AS mean_h,
         CAST(h.s_h AS DOUBLE) / (100.0 * h.n_h)
           - CAST(g.s AS DOUBLE) / (100.0 * g.n) AS dev
  FROM h JOIN g USING (event_type)
)
SELECT event_type, hod, n_h, mean_h, dev,
       CAST(CASE WHEN ROW_NUMBER() OVER (PARTITION BY event_type
                      ORDER BY mean_h DESC, hod) = 1
                 THEN 1 ELSE 0 END AS BIGINT) AS is_peak,
       CAST(CASE WHEN ROW_NUMBER() OVER (PARTITION BY event_type
                      ORDER BY mean_h ASC, hod) = 1
                 THEN 1 ELSE 0 END AS BIGINT) AS is_trough
FROM j
""",
)
def q_events_seasonality(spark, sf_dir):
    """Hour-of-day seasonality profile per event stream — the
    diurnal baseline an anomaly detector subtracts before flagging
    (q_events_outliers' global z-score fires every rush hour without
    it). Emits each (type, hour) cell's mean, its deviation from the
    stream's daily mean, and deterministic peak/trough markers.

    Exactness: moments accumulate in exact integer cents (the
    q_events_outliers rule); each emitted float is a single division
    of exact integers (or one subtraction of two such — deterministic
    IEEE ops in identical association order); peak/trough ranks order
    by those deterministic doubles with an hod tie-break.

    Scale: one map-side-combined aggregation to the (type, hod)
    relation — 24 x |types| rows — and everything downstream (global
    means, ranks) lives on that tiny relation; the event table is
    scanned exactly once."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    c = e.select(
        "event_type",
        F.hour("ts").cast("bigint").alias("hod"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias(
            "cents"
        ),
    )
    h = c.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.sum("cents").cast("bigint").alias("s_h"),
    )
    g = h.groupBy("event_type").agg(
        F.sum("n_h").cast("bigint").alias("n"),
        F.sum("s_h").cast("bigint").alias("s"),
    )
    mean_h = F.col("s_h").cast("double") / (F.lit(100.0) * F.col("n_h"))
    mean_g = F.col("s").cast("double") / (F.lit(100.0) * F.col("n"))
    j = h.join(F.broadcast(g), "event_type").select(
        "event_type",
        "hod",
        "n_h",
        mean_h.alias("mean_h"),
        (mean_h - mean_g).alias("dev"),
    )
    wpk = Window.partitionBy("event_type").orderBy(
        F.col("mean_h").desc(), "hod"
    )
    wtr = Window.partitionBy("event_type").orderBy(F.col("mean_h").asc(), "hod")
    return j.select(
        "event_type",
        "hod",
        "n_h",
        "mean_h",
        "dev",
        F.when(F.row_number().over(wpk) == 1, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_peak"),
        F.when(F.row_number().over(wtr) == 1, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_trough"),
    )


# ---------------- top session journey paths (clickstream Sankey)

PATHS_TOP_K = 20


@query(
    "q_events_paths",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS tsu,
         CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                   OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w
                      >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
grp AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY tsu, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM ordered
),
paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY tsu, event_id) AS path
  FROM grp GROUP BY user_id, session_id
),
counted AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
  FROM paths GROUP BY path
)
SELECT path, n_sessions,
       CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS BIGINT)
         AS rank
FROM counted
ORDER BY n_sessions DESC, path
LIMIT {PATHS_TOP_K}
""",
)
def q_events_paths(spark, sf_dir):
    """Top user-journey paths: events sessionize per user (30-minute
    gap, the q_stream_session islands), each session flattens to its
    ordered event-type string, and the most common journeys rank out
    — the clickstream Sankey / funnel-discovery aggregation.

    Determinism: the per-session sequence is assembled by collecting
    (ts, event_id, type) structs and ARRAY-SORTING them — element
    order comes from the struct sort, NOT from collect_list's
    arrival order, so any partitioning yields the same path string;
    the oracle's ordered string_agg matches by construction. Ranks
    break count ties on the path string.

    Scale: one shuffle on user_id for sessionization, one on
    (user, session) for path assembly (bounded by session length —
    a production run caps it with a slice() before concat); the
    ranked relation is distinct-path-sized, and the global top-k is
    a TakeOrdered over it, not a full sort. The struct-sort trick is
    what keeps the path deterministic without an extra window pass."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    wu = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    ordered = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").alias("tsu"),
    ).withColumn(
        "new_session",
        F.when(
            F.lag("tsu").over(wu).isNull()
            | (
                F.unix_micros("tsu") - F.unix_micros(F.lag("tsu").over(wu))
                >= 30 * 60 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    grp = ordered.withColumn(
        "session_id",
        F.sum("new_session").over(
            wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = (
        grp.groupBy("user_id", "session_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("tsu", "event_id", "event_type"))
            ).alias("_seq")
        )
        .select(
            F.array_join(F.col("_seq.event_type"), ">").alias("path")
        )
    )
    counted = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    return ranked_topk(
        counted, [F.col("n_sessions").desc(), F.col("path")], PATHS_TOP_K
    )


# ---------------- ordered funnel conversion (view -> click -> purchase)


@query(
    "q_events_funnel",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS tsu
  FROM events WHERE ts IS NOT NULL
),
u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM e),
v AS (
  SELECT user_id, min(tsu) AS t0 FROM e WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, min(tsu) AS t1
  FROM e JOIN v USING (user_id)
  WHERE event_type = 'click' AND tsu > v.t0 GROUP BY 1
),
p AS (
  SELECT e.user_id, min(tsu) AS t2
  FROM e JOIN c USING (user_id)
  WHERE event_type = 'purchase' AND tsu > c.t1 GROUP BY 1
),
steps AS (
  SELECT 1 AS step, 'all_users' AS step_name, (SELECT n FROM u) AS users
  UNION ALL SELECT 2, 'view', (SELECT count(*) FROM v)
  UNION ALL SELECT 3, 'click_after_view', (SELECT count(*) FROM c)
  UNION ALL SELECT 4, 'purchase_after_click', (SELECT count(*) FROM p)
)
SELECT CAST(step AS BIGINT) AS step, step_name,
       CAST(users AS BIGINT) AS users,
       CAST(users AS DOUBLE)
         / CAST(lag(users, 1, users) OVER (ORDER BY step) AS DOUBLE)
         AS conv_from_prev,
       CAST(users AS DOUBLE)
         / CAST(first_value(users) OVER (ORDER BY step) AS DOUBLE)
         AS conv_from_start
FROM steps
""",
)
def q_events_funnel(spark, sf_dir):
    """Ordered funnel analysis — the product-analytics staple: how many
    users complete view -> click -> purchase IN ORDER (each step's
    first occurrence must be strictly after the previous step's), with
    per-step and cumulative conversion rates. The ordered-sequence
    constraint is what distinguishes a funnel from three independent
    counts: a purchase before any click does not convert.

    Plan shape: three aggregations over the events scan, each with its
    event_type filter PUSHED to the parquet read (one type is ~1/5 of
    rows) and each shuffling only (user_id, min ts) — the classic
    min-timestamp chaining; step N joins step N-1's per-user firsts (a
    relation bounded by |users|, broadcastable at any scale). The
    4-row step table is driver-trivial; rates are single divisions of
    exact bigints (the q_events_transitions rule).

    The final 4-row ranking window is bounded by construction (the
    ranked_topk invariant); at 100 TB nothing here exceeds
    O(users) state."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )

    # one lazy plan, no driver-side .count() actions and NO window:
    # the four step counts crossJoin into ONE row (each leg a 1-row
    # global aggregate), then stack() unpivots to the 4 step rows with
    # prev/first denominators as explicit columns — the lag/first_value
    # the oracle uses, resolved statically
    def _cnt(df, name):
        return df.agg(F.count(F.lit(1)).cast("bigint").alias(name))

    one = (
        _cnt(e.select("user_id").distinct(), "n_all")
        .crossJoin(_cnt(v, "n_v"))
        .crossJoin(_cnt(c, "n_c"))
        .crossJoin(_cnt(p, "n_p"))
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


# ---------------- weekly cohort retention matrix


@query(
    "q_events_retention",
    oracle=f"""
WITH e AS (
  SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
  FROM events WHERE ts IS NOT NULL
),
cohort AS (SELECT user_id, min(wk) AS c0 FROM e GROUP BY 1),
active AS (
  SELECT DISTINCT c.user_id, c.c0,
         CAST((epoch(e.wk) - epoch(c.c0)) AS BIGINT) // 604800 AS offset_w
  FROM e JOIN cohort c USING (user_id)
),
size AS (SELECT c0, CAST(count(*) AS BIGINT) AS cohort_size FROM cohort GROUP BY 1)
SELECT strftime(a.c0, '{_FMT}') AS cohort_week,
       a.offset_w,
       CAST(count(*) AS BIGINT) AS active_users,
       any_value(s.cohort_size) AS cohort_size,
       CAST(count(*) AS DOUBLE) / CAST(any_value(s.cohort_size) AS DOUBLE)
         AS retention
FROM active a JOIN size s USING (c0)
GROUP BY a.c0, a.offset_w
""",
)
def q_events_retention(spark, sf_dir):
    """Weekly cohort retention matrix: users grouped by first-activity
    week, counted as retained in each subsequent week they were active
    — the (cohort_week x week_offset) grid every growth/engagement
    dashboard is built on, and the panel-construction step for
    longitudinal training data.

    Exactness: week buckets via date_trunc('week') (ISO Monday on both
    engines, UTC-pinned by the loader); the offset is integer epoch
    arithmetic (both truncated timestamps are whole seconds, and the
    difference is a nonnegative multiple of 604800, so Spark's `div`
    and DuckDB's `//` agree); retention is one bigint/bigint division.

    Plan shape: cohort = one groupBy(user); the activity grid
    de-dups (user, week) BEFORE counting (DISTINCT on a relation
    bounded by users x weeks); the cohort-size join is broadcastable
    (|cohorts| rows). The events table is scanned once."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    wk = e.select("user_id", F.date_trunc("week", "ts").alias("wk"))
    cohort = wk.groupBy("user_id").agg(F.min("wk").alias("c0"))
    active = (
        wk.join(cohort, "user_id")
        .select(
            "user_id",
            "c0",
            F.expr(
                "(unix_seconds(wk) - unix_seconds(c0)) div 604800"
            ).alias("offset_w"),
        )
        .distinct()
    )
    size = cohort.groupBy("c0").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    return (
        active.join(F.broadcast(size), "c0")
        .groupBy("c0", "offset_w")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("active_users"),
            F.any_value("cohort_size").alias("cohort_size"),
        )
        .select(
            F.date_format("c0", "yyyy-MM-dd HH:mm:ss").alias("cohort_week"),
            "offset_w",
            "active_users",
            "cohort_size",
            (
                F.col("active_users").cast("double")
                / F.col("cohort_size").cast("double")
            ).alias("retention"),
        )
    )


# ---------------- OHLC time-bucket resample (candlesticks)


@query(
    "q_time_ohlc",
    oracle=f"""
WITH e AS (
  SELECT event_type, event_id, CAST(ts AS TIMESTAMP) AS tsu,
         CAST(value AS DECIMAL(18,6)) AS x,
         to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) * 3600
                      AS BIGINT)) AS slot
  FROM events WHERE ts IS NOT NULL
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, slot
                            ORDER BY tsu, event_id) AS rn_open,
         count(*) OVER (PARTITION BY event_type, slot) AS n_slot
  FROM e
)
SELECT event_type, strftime(slot, '{_FMT}') AS slot_start,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(CASE WHEN rn_open = 1 THEN x END) AS DOUBLE) AS open,
       CAST(max(x) AS DOUBLE) AS high,
       CAST(min(x) AS DOUBLE) AS low,
       CAST(min(CASE WHEN rn_open = n_slot THEN x END) AS DOUBLE) AS close,
       CAST(SUM(x) AS DOUBLE) AS volume
FROM r GROUP BY event_type, slot
""",
)
def q_time_ohlc(spark, sf_dir):
    """OHLC candlestick resample: per (event_type, 1h bucket) the
    opening/high/low/closing values plus count and summed volume — the
    downsampling shape every time-series store serves charts from, and
    the feature-windows a forecasting pipeline trains on.

    Determinism: open/close are defined by the (ts, event_id) TOTAL
    order — open at row_number 1, close at row_number == slot count
    (one ASCENDING window serves both ends, so no second descending
    sort exists in the plan; row_number rather than
    first_value-with-implicit-frame so engine frame defaults can't
    differ); high/low are comparisons; the only accumulation is the
    volume sum, which uses the decimal(18,6) trick. Each emitted value
    is a single decimal cast to double — no float arithmetic at all.

    Plan shape: ONE shuffle on (event_type, slot) and ONE sort, shared
    by the row_number window, the unordered count window, and the
    final aggregate (plan-asserted in test_plans.py). Buckets are
    integer epoch floors (the q_stream_sliding rule)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    base = e.select(
        "event_type",
        "event_id",
        F.col("ts").alias("tsu"),
        F.col("value").cast("decimal(18,6)").alias("x"),
        F.window("ts", "1 hour")["start"].alias("slot"),
    )
    w_open = Window.partitionBy("event_type", "slot").orderBy("tsu", "event_id")
    w_slot = Window.partitionBy("event_type", "slot")
    r = base.select(
        "*",
        F.row_number().over(w_open).alias("rn_open"),
        F.count(F.lit(1)).over(w_slot).alias("n_slot"),
    )
    return (
        r.groupBy("event_type", "slot")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min(F.when(F.col("rn_open") == 1, F.col("x")))
            .cast("double")
            .alias("open"),
            F.max("x").cast("double").alias("high"),
            F.min("x").cast("double").alias("low"),
            F.min(F.when(F.col("rn_open") == F.col("n_slot"), F.col("x")))
            .cast("double")
            .alias("close"),
            F.sum("x").cast("double").alias("volume"),
        )
        .select(
            "event_type",
            F.date_format("slot", "yyyy-MM-dd HH:mm:ss").alias("slot_start"),
            "n",
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
    )


# ---------------- per-event lag/rolling training features


@query(
    "q_events_lag_features",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS tsu,
         CAST(value AS DECIMAL(18,6)) AS x
  FROM events WHERE ts IS NOT NULL
)
SELECT event_id, user_id,
       CAST(lag(x) OVER w AS DOUBLE) AS prev_value,
       CAST(x - lag(x) OVER w AS DOUBLE) AS delta_value,
       CAST(epoch_us(tsu) - epoch_us(lag(tsu) OVER w) AS BIGINT)
         AS micros_since_prev,
       CAST(count(*) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                           ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
            AS BIGINT) AS n_prev3,
       CAST(SUM(x) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                         ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
            AS DOUBLE) AS sum_prev3
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
""",
)
def q_events_lag_features(spark, sf_dir):
    """Per-event lag/rolling feature extraction — the feature-
    engineering pass that turns a raw event log into model-ready rows:
    previous value, delta, inter-arrival time, and a trailing 3-event
    count/sum per user, each LEAKAGE-SAFE (frames end at 1 PRECEDING,
    never the current row — the cardinal sin of temporal features is
    including the label's own row).

    Exactness: deltas and rolling sums stay in decimal(18,6) until the
    final cast (sums of <=3 decimals are exact in any order);
    inter-arrival is integer microseconds; the (ts, event_id) total
    order fixes every frame deterministically.

    Plan shape: ONE shuffle on user_id serves all five windows (same
    partitioning and sort — Spark stacks them over a single Exchange +
    Sort, the q_scd2_history rule). Output is one row per event, so
    this pipelines into a feature-store write at scan parallelism."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    base = e.select(
        "event_id",
        "user_id",
        F.col("ts").alias("tsu"),
        F.col("value").cast("decimal(18,6)").alias("x"),
    )
    w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    w3 = w.rowsBetween(-3, -1)
    return base.select(
        "event_id",
        "user_id",
        F.lag("x").over(w).cast("double").alias("prev_value"),
        (F.col("x") - F.lag("x").over(w)).cast("double").alias("delta_value"),
        (
            F.unix_micros("tsu") - F.unix_micros(F.lag("tsu").over(w))
        ).cast("bigint").alias("micros_since_prev"),
        F.count(F.lit(1)).over(w3).cast("bigint").alias("n_prev3"),
        F.sum("x").over(w3).cast("double").alias("sum_prev3"),
    )


# ---------------- daily / rolling-7-day active users (DAU / WAU)


@query(
    "q_events_dau_wau",
    oracle=f"""
WITH ud AS (
  SELECT DISTINCT user_id,
         date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
  FROM events WHERE ts IS NOT NULL
),
days AS (SELECT DISTINCT day FROM ud),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day),
wau AS (
  SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
  FROM days d JOIN ud u
    ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
  GROUP BY d.day
)
SELECT strftime(d.day, '{_FMT}') AS day,
       dau.dau, wau.wau,
       CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
FROM days d JOIN dau USING (day) JOIN wau USING (day)
""",
)
def q_events_dau_wau(spark, sf_dir):
    """DAU / rolling-7-day WAU / stickiness per day — the engagement
    series every product dashboard leads with. Rolling DISTINCT does
    not decompose like a sum (a user active on 3 of the 7 days counts
    once), so WAU is computed on the deduplicated (user, day) relation
    — bounded by users x days, NOT the event count — via a 7-day
    range join against the day grid.

    Scale shape: the heavy table collapses to (user, day) in one
    distinct shuffle; the range join broadcasts the day grid (|days|
    rows) against it, so the non-equi join's left side is tiny and its
    output is at most 7x the (user, day) relation. Stickiness is one
    bigint division. At 100 TB nothing beyond the first distinct
    touches raw events."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    ud = e.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    grid = days.select(F.col("day").alias("_d"))
    wau = (
        F.broadcast(grid)
        .join(
            ud,
            (F.col("day") <= F.col("_d"))
            & (F.col("day") >= F.col("_d") - F.expr("INTERVAL 6 DAYS")),
        )
        .groupBy("_d")
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
        .select(F.col("_d").alias("day"), "wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd HH:mm:ss").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
                "stickiness"
            ),
        )
    )


# ---------------- cohort lifetime-value curves


@query(
    "q_report_cohort_ltv",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_type,
         date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk,
         CAST(value AS DECIMAL(18,6)) AS x
  FROM events WHERE ts IS NOT NULL
),
cohort AS (SELECT user_id, min(wk) AS c0 FROM e GROUP BY 1),
size AS (SELECT c0, CAST(count(*) AS BIGINT) AS cohort_size
         FROM cohort GROUP BY 1),
grid AS (
  SELECT DISTINCT c.c0,
         CAST((epoch(e.wk) - epoch(c.c0)) AS BIGINT) // 604800 AS offset_w
  FROM e JOIN cohort c USING (user_id)
),
rev AS (
  SELECT c.c0,
         CAST((epoch(e.wk) - epoch(c.c0)) AS BIGINT) // 604800 AS offset_w,
         CAST(SUM(e.x) AS DECIMAL(38,6)) AS wk_rev
  FROM e JOIN cohort c USING (user_id)
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
),
cum AS (
  SELECT g.c0, g.offset_w,
         COALESCE(r.wk_rev, CAST(0 AS DECIMAL(38,6))) AS wk_rev,
         CAST(SUM(COALESCE(r.wk_rev, 0))
                OVER (PARTITION BY g.c0 ORDER BY g.offset_w
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DECIMAL(38,6)) AS cum_rev
  FROM grid g LEFT JOIN rev r ON r.c0 = g.c0 AND r.offset_w = g.offset_w
)
SELECT strftime(c.c0, '{_FMT}') AS cohort_week,
       c.offset_w,
       CAST(c.wk_rev AS DOUBLE) AS week_revenue,
       CAST(c.cum_rev AS DOUBLE) AS cum_revenue,
       CAST(c.cum_rev AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
         AS ltv_per_user
FROM cum c JOIN size s USING (c0)
""",
)
def q_report_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value curves: cumulative purchase revenue per
    first-activity-week cohort across week offsets, normalized per
    cohort member — the LTV view that, next to q_events_retention's
    activity matrix, decides acquisition economics; rows align with
    the retention grid (every active (cohort, offset) cell appears,
    zero-revenue weeks included) so the two keys join cleanly.

    Exactness: revenue stays decimal(18,6) -> decimal(38,6) through
    the per-week aggregate AND the cumulative window (decimal addition
    is exact, so the running sum is order-independent within the
    unique (cohort, offset) order), cast to double only at emission;
    ltv is one division by the exact cohort size.

    Plan shape: cohorts and weekly revenue are two aggregates over one
    events scan; the cumulative window runs on the (cohorts x offsets)
    grid — O(grid), not O(events); the size join broadcasts."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    base = e.select(
        "user_id",
        "event_type",
        F.date_trunc("week", "ts").alias("wk"),
        F.col("value").cast("decimal(18,6)").alias("x"),
    )
    cohort = base.groupBy("user_id").agg(F.min("wk").alias("c0"))
    size = cohort.groupBy("c0").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    withc = base.join(cohort, "user_id").select(
        "c0",
        F.expr("(unix_seconds(wk) - unix_seconds(c0)) div 604800").alias(
            "offset_w"
        ),
        "event_type",
        "x",
    )
    grid = withc.select("c0", "offset_w").distinct()
    rev = (
        withc.filter(F.col("event_type") == "purchase")
        .groupBy("c0", "offset_w")
        .agg(F.sum("x").cast("decimal(38,6)").alias("wk_rev"))
    )
    zero = F.lit(0).cast("decimal(38,6)")
    w = (
        Window.partitionBy("c0")
        .orderBy("offset_w")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.join(rev, ["c0", "offset_w"], "left").select(
        "c0",
        "offset_w",
        F.coalesce(F.col("wk_rev"), zero).alias("wk_rev"),
        F.sum(F.coalesce(F.col("wk_rev"), zero))
        .over(w)
        .cast("decimal(38,6)")
        .alias("cum_rev"),
    )
    return cum.join(F.broadcast(size), "c0").select(
        F.date_format("c0", "yyyy-MM-dd HH:mm:ss").alias("cohort_week"),
        "offset_w",
        F.col("wk_rev").cast("double").alias("week_revenue"),
        F.col("cum_rev").cast("double").alias("cum_revenue"),
        (
            F.col("cum_rev").cast("double")
            / F.col("cohort_size").cast("double")
        ).alias("ltv_per_user"),
    )


# ---------------- Welch two-sample A/B report (exact moment device)


@query(
    "q_report_ab_test",
    oracle="""
WITH e AS (
  SELECT user_id % 2 AS variant,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
g AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s,
         sum(cents) // count(*) AS mu0
  FROM e GROUP BY variant
),
d AS (
  SELECT e.variant, CAST(e.cents - g.mu0 AS DECIMAL(38,0)) AS dd
  FROM e JOIN g USING (variant)
),
m AS (
  SELECT d.variant, any_value(g.n) AS n, any_value(g.s) AS s,
         CAST(any_value(g.n) AS DECIMAL(38,0)) * sum(dd * dd)
           - sum(dd) * sum(dd) AS m2
  FROM d JOIN g USING (variant) GROUP BY d.variant
)
SELECT a.n AS n_a, b.n AS n_b,
       CAST(a.s AS DOUBLE) / (100.0 * a.n) AS mean_a,
       CAST(b.s AS DOUBLE) / (100.0 * b.n) AS mean_b,
       CAST(a.s AS DOUBLE) / (100.0 * a.n)
         - CAST(b.s AS DOUBLE) / (100.0 * b.n) AS mean_diff,
       sqrt(CAST(a.m2 AS DOUBLE)
              / CAST(CAST(a.n AS DECIMAL(38,0)) * a.n * (a.n - 1) * 10000
                     AS DOUBLE)
            + CAST(b.m2 AS DOUBLE)
              / CAST(CAST(b.n AS DECIMAL(38,0)) * b.n * (b.n - 1) * 10000
                     AS DOUBLE)) AS se,
       (CAST(a.s AS DOUBLE) / (100.0 * a.n)
          - CAST(b.s AS DOUBLE) / (100.0 * b.n))
       / sqrt(CAST(a.m2 AS DOUBLE)
                / CAST(CAST(a.n AS DECIMAL(38,0)) * a.n * (a.n - 1) * 10000
                       AS DOUBLE)
              + CAST(b.m2 AS DOUBLE)
                / CAST(CAST(b.n AS DECIMAL(38,0)) * b.n * (b.n - 1) * 10000
                       AS DOUBLE)) AS t_stat
FROM m a JOIN m b ON a.variant = 0 AND b.variant = 1
""",
)
def q_report_ab_test(spark, sf_dir):
    """Welch two-sample A/B report over purchase values, variants
    assigned by user_id parity (the hash-split every experimentation
    platform uses): per-variant n and mean, the difference, its
    standard error, and the Welch t-statistic — the readout that
    decides whether a treatment moved revenue or the delta is noise.

    Exactness (the q_agg_skew_kurtosis device, events-outliers FMA
    lesson applied): values to integer cents, per-variant moments as
    centered integer power sums in decimal(38,0) — m2 = n*sum(d^2) -
    sum(d)^2 is EXACT; mu0 is the truncated integer mean, which
    centers d without introducing floats (any constant shift leaves
    m2 invariant in exact arithmetic). The double tail is only what
    the contract allows: per-term single divisions by exact
    denominators (n^2 (n-1) 10^4 kept decimal until one cast), one
    binary add, sqrt, subtract, divide — no multiply-accumulate
    chain for an FMA to fuse.

    Plan shape: two map-side-combined aggregations over the pushed-
    down purchase scan (variant is a projection, not a shuffle of
    users), a 2-row broadcast join for centering, and a 1-row-x-1-row
    join for the report. O(1) output at any scale."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        (F.col("user_id") % 2).alias("variant"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    g = e.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.expr("sum(cents) div count(*)").alias("mu0"),
    )
    d = e.join(F.broadcast(g), "variant").select(
        "variant", "n", "s", (F.col("cents") - F.col("mu0")).cast("decimal(38,0)").alias("dd")
    )
    m = d.groupBy("variant").agg(
        F.any_value("n").alias("n"),
        F.any_value("s").alias("s"),
        (
            F.any_value("n").cast("decimal(38,0)")
            * F.sum(F.col("dd") * F.col("dd"))
            - F.sum("dd") * F.sum("dd")
        ).alias("m2"),
    )
    a = m.filter(F.col("variant") == 0).select(
        F.col("n").alias("n_a"), F.col("s").alias("s_a"), F.col("m2").alias("m2_a")
    )
    b = m.filter(F.col("variant") == 1).select(
        F.col("n").alias("n_b"), F.col("s").alias("s_b"), F.col("m2").alias("m2_b")
    )
    j = a.crossJoin(F.broadcast(b))
    mean_a = F.col("s_a").cast("double") / (F.lit(100.0) * F.col("n_a"))
    mean_b = F.col("s_b").cast("double") / (F.lit(100.0) * F.col("n_b"))
    den_a = (
        F.col("n_a").cast("decimal(38,0)")
        * F.col("n_a")
        * (F.col("n_a") - 1)
        * F.lit(10000)
    ).cast("double")
    den_b = (
        F.col("n_b").cast("decimal(38,0)")
        * F.col("n_b")
        * (F.col("n_b") - 1)
        * F.lit(10000)
    ).cast("double")
    se = F.sqrt(
        F.col("m2_a").cast("double") / den_a
        + F.col("m2_b").cast("double") / den_b
    )
    return j.select(
        "n_a",
        "n_b",
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        (mean_a - mean_b).alias("mean_diff"),
        se.alias("se"),
        ((mean_a - mean_b) / se).alias("t_stat"),
    )


# ---------------- conversion latency distribution (funnel companion)


@query(
    "q_events_time_to_convert",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS tsu
  FROM events WHERE ts IS NOT NULL
),
v AS (
  SELECT user_id, min(tsu) AS t0 FROM e WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, min(tsu) AS t1
  FROM e JOIN v USING (user_id)
  WHERE event_type = 'click' AND tsu > v.t0 GROUP BY 1
),
p AS (
  SELECT e.user_id, min(tsu) AS t2
  FROM e JOIN c USING (user_id)
  WHERE event_type = 'purchase' AND tsu > c.t1 GROUP BY 1
),
lat AS (
  SELECT p.user_id,
         CAST(epoch_us(p.t2) - epoch_us(v.t0) AS BIGINT) AS lat_us
  FROM p JOIN v USING (user_id)
),
r AS (
  SELECT lat_us,
         CAST(row_number() OVER (ORDER BY lat_us, user_id) AS BIGINT) AS rn,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM lat
)
SELECT any_value(n) AS n_converted,
       CAST(sum(lat_us) AS BIGINT) AS sum_lat_us,
       CAST(sum(lat_us) AS DOUBLE) / (1000000.0 * any_value(n))
         AS mean_lat_s,
       max(CASE WHEN rn = (50 * n + 99) // 100 THEN lat_us END) AS p50_us,
       max(CASE WHEN rn = (90 * n + 99) // 100 THEN lat_us END) AS p90_us,
       CAST(max(lat_us) AS BIGINT) AS max_lat_us
FROM r
""",
)
def q_events_time_to_convert(spark, sf_dir):
    """Time-to-convert distribution for completed funnels: for every
    user who finished view -> click -> purchase in order (exactly
    q_events_funnel's chained-min semantics — the two keys share one
    definition of 'converted'), the latency from first view to the
    qualifying purchase, profiled as n / exact mean / picked p50, p90
    / max. The companion the funnel's COUNTS need before anyone acts
    on them: a 10% conversion at a 3-day median is a different
    product than 10% at 40 seconds.

    Exactness: latencies are exact microsecond differences; the mean
    is one division of an exact bigint sum by an exact product;
    percentiles are picked values at integer ceil(q*n) ranks (the
    q_docs_length_percentiles device), not interpolations.

    Scale shape: the funnel chain shuffles only (user, min-ts)
    relations; the converted population is a per-user relation, so
    its global rank uses the two-pass ranked_by (no single-partition
    sort); the final aggregate is one row."""
    from hive_similarity_join_spark.operators.rank import ranked_by

    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    lat = p.join(v, "user_id").select(
        "user_id",
        (F.unix_micros("t2") - F.unix_micros("t0")).cast("bigint").alias(
            "lat_us"
        ),
    )
    r = ranked_by(lat, ["lat_us", "user_id"], "rn")
    n_rel = lat.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    j = r.join(F.broadcast(n_rel))

    def pick(num, den, name):
        target = F.expr(f"({num} * n + {den - 1}) div {den}")
        return F.max(
            F.when(F.col("rn") == target, F.col("lat_us"))
        ).alias(name)

    return j.agg(
        F.any_value("n").alias("n_converted"),
        F.sum("lat_us").cast("bigint").alias("sum_lat_us"),
        (
            F.sum("lat_us").cast("double")
            / (F.lit(1000000.0) * F.any_value("n"))
        ).alias("mean_lat_s"),
        pick(50, 100, "p50_us"),
        pick(90, 100, "p90_us"),
        F.max("lat_us").cast("bigint").alias("max_lat_us"),
    )


# --------------------------- robust anomaly detection (median / MAD)


@query(
    "q_events_anomaly_mad",
    oracle="""
WITH med AS (
  -- value IS NOT NULL: Spark's percentile_disc excludes NULLs, but a
  -- bare cume_dist window would count them in its denominator (DuckDB
  -- orders NULLS LAST) — filter the subrelation so both sides stay
  -- NULL-symmetric even if a regeneration introduces NULL values
  -- (ADVICE r11; events.value is NOT NULL today, see schema_dump).
  SELECT event_type, min(value) AS med_value FROM (
    SELECT event_type, value,
           cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
    FROM events WHERE value IS NOT NULL
  ) WHERE cd >= 0.5 GROUP BY event_type
),
d AS (
  SELECT e.event_type, med.med_value,
         abs(e.value - med.med_value) AS dev
  FROM events e JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, min(dev) AS mad_value FROM (
    SELECT event_type, dev,
           cume_dist() OVER (PARTITION BY event_type ORDER BY dev) AS cd
    FROM d WHERE dev IS NOT NULL
  ) WHERE cd >= 0.5 GROUP BY event_type
)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n_total,
       d.med_value, m.mad_value,
       CAST(SUM(CASE WHEN d.dev > 3.0 * m.mad_value THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       CAST(SUM(CASE WHEN d.dev > 3.0 * m.mad_value THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS outlier_frac
FROM d JOIN mad m USING (event_type)
GROUP BY d.event_type, d.med_value, m.mad_value
ORDER BY event_type
""",
)
def q_events_anomaly_mad(spark, sf_dir):
    """Robust per-group anomaly report: median / MAD (median absolute
    deviation) per event_type with a |value - median| > 3*MAD outlier
    count — the heavy-tail-safe twin of q_events_outliers' z-score
    (mean/sd are themselves dragged by the outliers they try to flag;
    the 3*MAD fence is the textbook robust screen a pipeline runs on
    a signal column whose distribution it does not trust yet).

    Bit-exactness: both medians are DISCRETE order statistics
    (percentile_disc = smallest value with cume_dist >= 0.5 — the
    oracle spells that definition out as a cume_dist window so no
    engine-specific even-count interpolation rule is involved), i.e.
    actual data values. `dev` is one IEEE subtract+abs of two doubles,
    the fence one multiply and one compare, the fraction one divide of
    exact integers — no multiply-accumulate chain for either engine to
    fuse (CLAUDE.md FMA rule).

    Scale shape: two grouped sort-aggregates over (event_type) — hash
    partial into |groups| sorted buffers, the documented exact-median
    trade (q_agg_percentiles: approx_percentile is the 100 TB
    fallback) — each followed by a BROADCAST of the group-count-sized
    stats relation back over the streamed log; no window over the
    fact table, no single-partition sort."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias(
            "med_value"
        )
    )
    d = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med_value",
        F.abs(F.col("value") - F.col("med_value")).alias("dev"),
    )
    mad = d.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)").alias(
            "mad_value"
        )
    )
    is_out = F.when(F.col("dev") > F.lit(3.0) * F.col("mad_value"), 1).otherwise(0)
    return (
        d.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med_value", "mad_value")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(is_out).cast("bigint").alias("n_outliers"),
            (
                F.sum(is_out).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("outlier_frac"),
        )
        .select(
            "event_type", "n_total", "med_value", "mad_value",
            "n_outliers", "outlier_frac",
        )
        .orderBy("event_type")
    )


# ------------------------- winsorization (robust transform report)


@query(
    "q_events_winsorize",
    oracle="""
WITH pct AS (
  -- value IS NOT NULL mirrors Spark percentile_disc's NULL exclusion
  -- (ADVICE r11 — see q_events_anomaly_mad's med CTE note).
  SELECT event_type,
         min(CASE WHEN cd05 >= 0.05 THEN value END) AS p05,
         min(CASE WHEN cd05 >= 0.95 THEN value END) AS p95
  FROM (
    SELECT event_type, value,
           cume_dist() OVER (PARTITION BY event_type ORDER BY value)
               AS cd05
    FROM events WHERE value IS NOT NULL
  ) GROUP BY event_type
),
c AS (
  SELECT e.event_type, e.value, p.p05, p.p95,
         least(greatest(e.value, p.p05), p.p95) AS w
  FROM events e JOIN pct p USING (event_type)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_total,
       p05, p95,
       CAST(SUM(CASE WHEN value < p05 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_low,
       CAST(SUM(CASE WHEN value > p95 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clipped_high,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*)
           AS mean_raw,
       CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE) / count(*)
           AS mean_winsorized
FROM c
GROUP BY event_type, p05, p95
ORDER BY event_type
""",
)
def q_events_winsorize(spark, sf_dir):
    """Winsorization report per event_type — the standard robust
    TRANSFORM that complements q_events_anomaly_mad's detector: clip
    `value` to the [p05, p95] discrete percentiles and report clip
    counts plus the raw-vs-winsorized mean shift, the number that
    says how much of a signal's mean is tail artifact before it
    becomes a training feature.

    Bit-exactness: the fences are DISCRETE order statistics (the
    oracle spells out the cume_dist >= q pick, as in the MAD key);
    clipping is least/greatest — pure comparisons selecting DATA
    values, no arithmetic — so both sums run over identical exact
    decimal casts and converge at one double division each.

    Scale shape: one grouped sort-aggregate for the two fences
    (group-count-sized result, the documented exact-percentile trade),
    broadcast back over the streamed log, one partial-aggregated
    shuffle for the report. No window over the fact table."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    pct = e.groupBy("event_type").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY value)").alias(
            "p05"
        ),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias(
            "p95"
        ),
    )
    w = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    dec = "decimal(18,6)"
    return (
        e.join(F.broadcast(pct), "event_type")
        .select(
            "event_type", "p05", "p95", "value", w.alias("w")
        )
        .groupBy("event_type", "p05", "p95")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(F.when(F.col("value") < F.col("p05"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.sum(F.when(F.col("value") > F.col("p95"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_high"),
            (
                F.sum(F.col("value").cast(dec)).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_raw"),
            (
                F.sum(F.col("w").cast(dec)).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_winsorized"),
        )
        .select(
            "event_type", "n_total", "p05", "p95",
            "n_clipped_low", "n_clipped_high",
            "mean_raw", "mean_winsorized",
        )
        .orderBy("event_type")
    )


# ------------------------------------------- LTTB chart downsampling

_LTTB_BUCKET_US = 21_600_000_000  # 6h buckets


_LTTB_SQL = f"""
WITH pts AS (
  SELECT event_type, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS x,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS y,
         epoch_us(CAST(ts AS TIMESTAMP)) // {_LTTB_BUCKET_US} AS b
  FROM events WHERE ts IS NOT NULL
),
ends AS (
  SELECT event_type, b,
         CAST(count(*) AS BIGINT) AS n_pts,
         min(ROW(x, event_id, y)) AS fst,
         max(ROW(x, event_id, y)) AS lst
  FROM pts GROUP BY 1, 2
),
anch AS (
  SELECT event_type, b, n_pts, fst, lst,
         lag(lst) OVER (PARTITION BY event_type ORDER BY b) AS a,
         lead(fst) OVER (PARTITION BY event_type ORDER BY b) AS c
  FROM ends
),
interior AS (
  SELECT p.event_type, p.b, an.n_pts, p.x, p.event_id, p.y,
         CAST(abs(
           CAST(an.a[1] - an.c[1] AS HUGEINT) * (p.y - an.a[3])
           - CAST(an.a[1] - p.x AS HUGEINT) * (an.c[3] - an.a[3])
         ) AS HUGEINT) AS area2
  FROM pts p
  JOIN anch an ON an.event_type = p.event_type AND an.b = p.b
  WHERE an.a IS NOT NULL AND an.c IS NOT NULL
),
sel AS (
  SELECT event_type, b, n_pts, x, y, area2,
         row_number() OVER (
             PARTITION BY event_type, b
             ORDER BY area2 DESC, x, event_id
         ) AS rn
  FROM interior
)
SELECT event_type, CAST(b AS BIGINT) AS b, n_pts,
       CAST(x AS BIGINT) AS sel_us, CAST(y AS BIGINT) AS sel_cents,
       CAST(area2 AS BIGINT) AS area2, 'interior' AS kind
FROM sel WHERE rn = 1
UNION ALL
SELECT event_type, CAST(b AS BIGINT) AS b, n_pts,
       CAST(fst[1] AS BIGINT) AS sel_us, CAST(fst[3] AS BIGINT) AS sel_cents,
       CAST(0 AS BIGINT) AS area2, 'first' AS kind
FROM anch WHERE a IS NULL
UNION ALL
SELECT event_type, CAST(b AS BIGINT) AS b, n_pts,
       CAST(lst[1] AS BIGINT) AS sel_us, CAST(lst[3] AS BIGINT) AS sel_cents,
       CAST(0 AS BIGINT) AS area2, 'last' AS kind
FROM anch WHERE c IS NULL AND a IS NOT NULL
"""


@query("q_time_downsample", oracle=_LTTB_SQL)
def q_time_downsample(spark, sf_dir):
    """LTTB CHART DOWNSAMPLING (Steinarsson 2013, largest-triangle-
    three-buckets), the PARALLEL fixed-anchor variant: per
    (event_type, 6h bucket) keep the single point forming the largest
    triangle against the PREVIOUS bucket's last point and the NEXT
    bucket's first point — the downsampler dashboards use to draw
    100 TB of points as thousands while preserving visual extremes
    (q_time_ohlc keeps per-bucket extremes; LTTB keeps the point that
    bends the line). Classic LTTB anchors on the previously SELECTED
    point, a sequential chain; anchoring on the neighbor bucket's
    boundary points instead makes every bucket independent — fully
    parallel, same guarantee class — and is deterministic: the first/
    last bucket per series keep their boundary point verbatim (kind
    'first'/'last'), interior argmax ties break on (x, event_id).

    Exactness: coordinates are integer microseconds and integer cents
    (the events cents contract); the doubled triangle area is two
    integer products in decimal(38,0)/HUGEINT (dx ~ 2.6e12 us x dy
    cents can pass 5e17 — bigint-safe today, but products of SUMS at
    bigger SFs are exactly where the s2i HUGEINT precedent says to
    widen), abs, then one bigint cast. No float arithmetic anywhere.

    Plan shape: one (event_type, bucket) partial aggregate; lag/lead
    over the BUCKET relation (aggregate spine — the low-cardinality
    window gate's documented clean case); one join back to the points
    and a (event_type, bucket)-partitioned rank window (high-card
    partition). Output is 3 x n_buckets-ish rows."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    pts = e.select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("x"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("y"),
        F.expr(f"unix_micros(ts) div {_LTTB_BUCKET_US}").alias("b"),
    )
    ends = pts.groupBy("event_type", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pts"),
        F.min(F.struct("x", "event_id", "y")).alias("fst"),
        F.max(F.struct("x", "event_id", "y")).alias("lst"),
    )
    wb = Window.partitionBy("event_type").orderBy("b")
    anch = ends.select(
        "event_type",
        "b",
        "n_pts",
        "fst",
        "lst",
        F.lag("lst").over(wb).alias("a"),
        F.lead("fst").over(wb).alias("c"),
    )
    dec = "decimal(38,0)"
    inter = (
        pts.alias("p")
        .join(
            anch.alias("an"),
            (F.col("p.event_type") == F.col("an.event_type"))
            & (F.col("p.b") == F.col("an.b")),
        )
        .filter(F.col("an.a").isNotNull() & F.col("an.c").isNotNull())
        .select(
            F.col("p.event_type").alias("event_type"),
            F.col("p.b").alias("b"),
            F.col("an.n_pts").alias("n_pts"),
            F.col("p.x").alias("x"),
            F.col("p.event_id").alias("event_id"),
            F.col("p.y").alias("y"),
            F.abs(
                (F.col("an.a.x") - F.col("an.c.x")).cast(dec)
                * (F.col("p.y") - F.col("an.a.y")).cast(dec)
                - (F.col("an.a.x") - F.col("p.x")).cast(dec)
                * (F.col("an.c.y") - F.col("an.a.y")).cast(dec)
            ).alias("area2"),
        )
    )
    ws = Window.partitionBy("event_type", "b").orderBy(
        F.desc("area2"), F.asc("x"), F.asc("event_id")
    )
    sel = (
        inter.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("b").cast("bigint").alias("b"),
            "n_pts",
            F.col("x").cast("bigint").alias("sel_us"),
            F.col("y").cast("bigint").alias("sel_cents"),
            F.col("area2").cast("bigint").alias("area2"),
            F.lit("interior").alias("kind"),
        )
    )
    first = anch.filter(F.col("a").isNull()).select(
        "event_type",
        F.col("b").cast("bigint").alias("b"),
        "n_pts",
        F.col("fst.x").cast("bigint").alias("sel_us"),
        F.col("fst.y").cast("bigint").alias("sel_cents"),
        F.lit(0).cast("bigint").alias("area2"),
        F.lit("first").alias("kind"),
    )
    last = anch.filter(
        F.col("c").isNull() & F.col("a").isNotNull()
    ).select(
        "event_type",
        F.col("b").cast("bigint").alias("b"),
        "n_pts",
        F.col("lst.x").cast("bigint").alias("sel_us"),
        F.col("lst.y").cast("bigint").alias("sel_cents"),
        F.lit(0).cast("bigint").alias("area2"),
        F.lit("last").alias("kind"),
    )
    return sel.unionByName(first).unionByName(last)
