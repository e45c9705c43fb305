"""Incremental continuous aggregates — streaming mirrors of five
batch keys (queries/events_q.py): ``q_events_rollup`` (multi-grain
hypertable rollup), ``q_time_gapfill`` (fixed-grid resample + LOCF),
``q_time_ohlc`` (candles), ``q_events_dau_wau`` (engagement series),
and ``q_events_retention`` (weekly cohort matrix).

This is the foreachBatch slot-aggregate upsert (the TimescaleDB
continuous-aggregate pattern): the carry holds FINEST-GRAIN partials
only —

  rollup:    (event_type, y, m, d)    -> (cnt, psum)
  gapfill:   (event_type, slot)       -> (cnt, slot_sum)
  ohlc:      (event_type, slot)       -> decomposable candle partials
  dau/wau:   the deduplicated (user, day) SET
  retention: the deduplicated (user, week) SET

and every coarser read-side artifact (the ROLLUP grains, the dense
grid + forward fill) is derived from the carry at emission time. Both
partial aggregates are decomposable (COUNT and exact DECIMAL SUM are
associative and commutative), so unlike the CUSUM mirror there is NO
ordered-arrival contract: epochs may arrive in any order, sliced any
way, and the merged carry is BIT-IDENTICAL to the single-shot
aggregation — pytest asserts equality against the batch keys' own
output, not closeness.

State size: O(observed finest-grain groups) — (types x days) for the
rollup, (types x slots) for the grid — independent of the event
count. Per epoch: one map-side-combined shuffle of the batch slice on
the finest grain plus a carry-sized outer-join merge; emission costs
O(carry), never O(events). The versioned parquet carry contract
(streaming/state.py) makes restarts and epoch retries safe: read the
newest version strictly below the current epoch id, write this
epoch's version, prune to two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_similarity_join_spark.streaming.state import (
    prune_carries,
    read_latest_carry,
)

_DEC = "decimal(38,6)"

ROLLUP_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("y", T.LongType()),
        T.StructField("m", T.LongType()),
        T.StructField("d", T.LongType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("psum", T.DecimalType(38, 6)),
    ]
)

GAPFILL_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("slot", T.TimestampType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("slot_sum", T.DecimalType(38, 6)),
    ]
)


def rollup_partials(batch: DataFrame) -> DataFrame:
    """Day-grain partials of a raw events slice (event_type, ts, value)."""
    return (
        batch.filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.year("ts").cast("bigint").alias("y"),
            F.month("ts").cast("bigint").alias("m"),
            F.dayofmonth("ts").cast("bigint").alias("d"),
            F.col("value").cast("decimal(18,6)").alias("x"),
        )
        .groupBy("event_type", "y", "m", "d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum("x").cast(_DEC).alias("psum"),
        )
    )


def gapfill_partials(batch: DataFrame) -> DataFrame:
    """15-minute slot partials of a raw events slice."""
    return (
        batch.filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.window("ts", "15 minutes")["start"].alias("slot"),
            F.col("value").cast("decimal(18,6)").alias("x"),
        )
        .groupBy("event_type", "slot")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum("x").cast(_DEC).alias("slot_sum"),
        )
    )


def merge_partials(
    carry: DataFrame | None,
    delta: DataFrame,
    keys: list[str],
    sums: list[str],
) -> DataFrame:
    """Upsert ``delta`` partials into ``carry`` by summing the partial
    columns per key — exact for COUNT and DECIMAL SUM in any epoch
    order (associative + commutative), which is what makes the mirror
    bit-identical to single-shot."""
    if carry is None:
        return delta
    c = carry.select(keys + [F.col(s).alias(f"_c_{s}") for s in sums])
    d = delta.select(keys + [F.col(s).alias(f"_d_{s}") for s in sums])
    j = c.join(d, keys, "full")
    merged = [
        (
            F.coalesce(F.col(f"_c_{s}"), F.lit(0))
            + F.coalesce(F.col(f"_d_{s}"), F.lit(0))
        )
        .cast("bigint" if s == "cnt" else _DEC)
        .alias(s)
        for s in sums
    ]
    return j.select(*keys, *merged)


def emit_rollup(carry: DataFrame) -> DataFrame:
    """q_events_rollup's exact output from the day-grain carry: one
    ROLLUP over O(types x days) partials — cnt re-sums the partial
    counts, sum_value re-sums the exact decimals (same value as the
    batch key's decimal(18,6) event sum) and casts to double at the
    edge, the identical emission shape."""
    grain = (
        F.when(F.grouping("d") == 0, F.lit("day"))
        .when(F.grouping("m") == 0, F.lit("month"))
        .when(F.grouping("y") == 0, F.lit("year"))
        .when(F.grouping("event_type") == 0, F.lit("type"))
        .otherwise(F.lit("all"))
    )
    return (
        carry.rollup("event_type", "y", "m", "d")
        .agg(
            grain.alias("grain"),
            F.sum("cnt").cast("bigint").alias("cnt"),
            F.sum("psum").cast("double").alias("sum_value"),
        )
        .select("event_type", "y", "m", "d", "grain", "cnt", "sum_value")
    )


def emit_gapfill(carry: DataFrame) -> DataFrame:
    """q_time_gapfill's exact output from the slot carry: dense grid
    over each type's observed span, LOCF over the slot sums — all
    O(grid), the batch key's own read-side shape."""
    span = carry.groupBy("event_type").agg(
        F.min("slot").alias("s0"), F.max("slot").alias("s1")
    )
    grid = span.select(
        "event_type",
        F.explode(
            F.sequence("s0", "s1", F.expr("interval 15 minutes"))
        ).alias("slot"),
    )
    joined = grid.join(carry, ["event_type", "slot"], "left")
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


def _make_query(
    stream: DataFrame,
    state_dir: str,
    partials,
    carry_schema,
    merge,
    checkpoint_dir: str | None = None,
):
    """Shared foreachBatch wiring: partials -> versioned-carry merge ->
    epoch-named summary snapshot (overwrite, so a retried epoch
    rewrites rather than duplicates). ``merge(carry_or_None, delta)``
    must be associative/commutative for the any-order exactness
    guarantee."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        carry = read_latest_carry(
            spark, state_dir, carry_schema, below_epoch=epoch_id
        )
        new_carry = merge(carry, partials(batch))
        new_carry.write.mode("overwrite").parquet(
            f"{state_dir}/carry_v{epoch_id}"
        )
        spark.read.schema(carry_schema).parquet(
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


def incremental_rollup(
    stream: DataFrame, state_dir: str, checkpoint_dir: str | None = None
):
    """Continuous multi-grain rollup over a raw events stream
    (event_type, ts, value, ...). The latest summary snapshot IS the
    day-grain carry; read it and call emit_rollup for the serving
    grains."""
    return _make_query(
        stream,
        state_dir,
        rollup_partials,
        ROLLUP_CARRY_SCHEMA,
        lambda c, d: merge_partials(
            c, d, ["event_type", "y", "m", "d"], ["cnt", "psum"]
        ),
        checkpoint_dir,
    )


def incremental_gapfill(
    stream: DataFrame, state_dir: str, checkpoint_dir: str | None = None
):
    """Continuous slot aggregate for the gap-filled grid; read the
    latest summary snapshot and call emit_gapfill for the dense
    forward-filled series."""
    return _make_query(
        stream,
        state_dir,
        gapfill_partials,
        GAPFILL_CARRY_SCHEMA,
        lambda c, d: merge_partials(
            c, d, ["event_type", "slot"], ["cnt", "slot_sum"]
        ),
        checkpoint_dir,
    )


# ---- OHLC candles: decomposable via struct-min/max open/close ----

_OHLC_PT = T.StructType(
    [
        T.StructField("tsu", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("x", T.DecimalType(18, 6)),
    ]
)

OHLC_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("slot", T.TimestampType()),
        T.StructField("n", T.LongType()),
        T.StructField("volume", T.DecimalType(38, 6)),
        T.StructField("high", T.DecimalType(18, 6)),
        T.StructField("low", T.DecimalType(18, 6)),
        T.StructField("o", _OHLC_PT),
        T.StructField("c", _OHLC_PT),
    ]
)


def ohlc_partials(batch: DataFrame) -> DataFrame:
    """Per-(type, 1h slot) candle partials of a raw events slice. The
    open/close carriers are MIN/MAX over (tsu, event_id, x) structs —
    lexicographic struct order on the (ts, id) total order, so merging
    two epochs' carriers with least/greatest lands on exactly the
    q_time_ohlc row_number winner."""
    return (
        batch.filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.window("ts", "1 hour")["start"].alias("slot"),
            F.col("ts").alias("tsu"),
            F.col("event_id").cast("bigint").alias("event_id"),
            F.col("value").cast("decimal(18,6)").alias("x"),
        )
        .groupBy("event_type", "slot")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast(_DEC).alias("volume"),
            F.max("x").alias("high"),
            F.min("x").alias("low"),
            F.min(F.struct("tsu", "event_id", "x")).alias("o"),
            F.max(F.struct("tsu", "event_id", "x")).alias("c"),
        )
    )


def merge_ohlc(carry: DataFrame | None, delta: DataFrame) -> DataFrame:
    if carry is None:
        return delta
    keys = ["event_type", "slot"]
    cols = ["n", "volume", "high", "low", "o", "c"]
    c = carry.select(keys + [F.col(x).alias(f"_c_{x}") for x in cols])
    d = delta.select(keys + [F.col(x).alias(f"_d_{x}") for x in cols])
    j = c.join(d, keys, "full")
    # least/greatest skip NULLs (a slot present in only one side keeps
    # that side's value), which is exactly the upsert semantics
    return j.select(
        *keys,
        (
            F.coalesce(F.col("_c_n"), F.lit(0))
            + F.coalesce(F.col("_d_n"), F.lit(0))
        ).cast("bigint").alias("n"),
        (
            F.coalesce(F.col("_c_volume"), F.lit(0))
            + F.coalesce(F.col("_d_volume"), F.lit(0))
        ).cast(_DEC).alias("volume"),
        F.greatest("_c_high", "_d_high").alias("high"),
        F.least("_c_low", "_d_low").alias("low"),
        F.least("_c_o", "_d_o").alias("o"),
        F.greatest("_c_c", "_d_c").alias("c"),
    )


def emit_ohlc(carry: DataFrame) -> DataFrame:
    """q_time_ohlc's exact output from the candle carry."""
    return carry.select(
        "event_type",
        F.date_format("slot", "yyyy-MM-dd HH:mm:ss").alias("slot_start"),
        "n",
        F.col("o")["x"].cast("double").alias("open"),
        F.col("high").cast("double").alias("high"),
        F.col("low").cast("double").alias("low"),
        F.col("c")["x"].cast("double").alias("close"),
        F.col("volume").cast("double").alias("volume"),
    )


def incremental_ohlc(
    stream: DataFrame, state_dir: str, checkpoint_dir: str | None = None
):
    """Continuous OHLC candle maintenance; read the latest summary
    snapshot and call emit_ohlc for the serving candles."""
    return _make_query(
        stream,
        state_dir,
        ohlc_partials,
        OHLC_CARRY_SCHEMA,
        merge_ohlc,
        checkpoint_dir,
    )


# ---- DAU/WAU: the carry is the deduplicated (user, day) SET ----

DAU_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("day", T.TimestampType()),
    ]
)


def dau_partials(batch: DataFrame) -> DataFrame:
    """Distinct (user, day) pairs of a raw events slice. Rolling
    DISTINCT does not decompose as a sum, but the deduplicated pair
    SET does (set union is associative/commutative/idempotent), so
    the carry holds the finest-grain set and the DAU/WAU read derives
    from it — O(users x days) state, independent of event volume."""
    return (
        batch.filter(F.col("ts").isNotNull())
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.date_trunc("day", "ts").alias("day"),
        )
        .distinct()
    )


def merge_dau(carry: DataFrame | None, delta: DataFrame) -> DataFrame:
    if carry is None:
        return delta
    # idempotent set union: replayed or overlapping epochs cannot
    # double-count a user-day
    return carry.unionAll(delta).distinct()


def emit_dau_wau(carry: DataFrame) -> DataFrame:
    """q_events_dau_wau's exact output from the user-day carry."""
    days = carry.select("day").distinct()
    dau = carry.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    grid = days.select(F.col("day").alias("_d"))
    wau = (
        F.broadcast(grid)
        .join(
            carry,
            (F.col("day") <= F.col("_d"))
            & (F.col("day") >= F.col("_d") - F.expr("INTERVAL 6 DAYS")),
        )
        .groupBy("_d")
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
        .select(F.col("_d").alias("day"), "wau")
    )
    return dau.join(wau, "day").select(
        F.date_format("day", "yyyy-MM-dd HH:mm:ss").alias("day"),
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
            "stickiness"
        ),
    )


def incremental_dau_wau(
    stream: DataFrame, state_dir: str, checkpoint_dir: str | None = None
):
    """Continuous engagement series; read the latest summary snapshot
    and call emit_dau_wau for the DAU/WAU/stickiness table."""
    return _make_query(
        stream,
        state_dir,
        dau_partials,
        DAU_CARRY_SCHEMA,
        merge_dau,
        checkpoint_dir,
    )


# ---- weekly cohort retention: the carry is the (user, week) SET ----

RETENTION_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("wk", T.TimestampType()),
    ]
)


def retention_partials(batch: DataFrame) -> DataFrame:
    """Distinct (user, ISO-week) pairs of a raw events slice. Cohort
    assignment (min week per user) does not decompose as a summable
    partial — a user's cohort can MOVE when an earlier-week event
    arrives late — but the deduplicated pair SET does (set union is
    associative/commutative/idempotent), and the cohort dictionary,
    activity matrix, and cohort sizes are all derived views of that
    set at emission time. O(users x weeks) state, independent of
    event volume — the same carry shape as DAU/WAU one grain up."""
    return (
        batch.filter(F.col("ts").isNotNull())
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.date_trunc("week", "ts").alias("wk"),
        )
        .distinct()
    )


def merge_retention(carry: DataFrame | None, delta: DataFrame) -> DataFrame:
    if carry is None:
        return delta
    # idempotent set union: replayed or overlapping epochs cannot
    # double-count a user-week, and late data re-cohorts cleanly
    return carry.unionAll(delta).distinct()


def emit_retention(carry: DataFrame) -> DataFrame:
    """q_events_retention's exact output from the user-week carry —
    the identical cohort -> activity-offset -> size composition as the
    batch key (queries/events_q.py), run over the O(users x weeks)
    set instead of raw events."""
    cohort = carry.groupBy("user_id").agg(F.min("wk").alias("c0"))
    active = (
        carry.join(cohort, "user_id")
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


def incremental_retention(
    stream: DataFrame, state_dir: str, checkpoint_dir: str | None = None
):
    """Continuous weekly-cohort retention; read the latest summary
    snapshot and call emit_retention for the cohort matrix."""
    return _make_query(
        stream,
        state_dir,
        retention_partials,
        RETENTION_CARRY_SCHEMA,
        merge_retention,
        checkpoint_dir,
    )


# ---- value histogram: (type, bin) counts are summable partials ----

HIST_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("bin", T.LongType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def hist_partials(batch: DataFrame) -> DataFrame:
    """Per-(type, bin) counts of a raw events slice — the exact
    integer-cents binning of q_agg_value_histogram
    (queries/relational_q.py), trivially decomposable (COUNT sums)."""
    from hive_similarity_join_spark.queries.relational_q import HIST_W_CENTS

    return (
        batch.select(
            "event_type",
            F.expr(
                f"CAST(floor(value * 100 + 0.5) AS BIGINT) div {HIST_W_CENTS}"
            ).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def merge_hist(carry: DataFrame | None, delta: DataFrame) -> DataFrame:
    return merge_partials(carry, delta, ["event_type", "bin"], ["cnt"])


def emit_hist(carry: DataFrame) -> DataFrame:
    """q_agg_value_histogram's exact output from the (type, bin)
    carry — bounds and fractions are derived at read time from the
    O(types x bins) state."""
    from hive_similarity_join_spark.queries.relational_q import HIST_W_CENTS

    t = carry.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("total")
    )
    return carry.join(F.broadcast(t), "event_type").select(
        "event_type",
        F.col("bin").cast("bigint").alias("bin"),
        (F.col("bin") * HIST_W_CENTS).cast("double").alias("_lo_c"),
        ((F.col("bin") + 1) * HIST_W_CENTS).cast("double").alias("_hi_c"),
        F.col("cnt").cast("bigint").alias("cnt"),
        (F.col("cnt").cast("double") / F.col("total").cast("double")).alias(
            "frac"
        ),
    ).select(
        "event_type",
        "bin",
        (F.col("_lo_c") / F.lit(100.0)).alias("bin_lo"),
        (F.col("_hi_c") / F.lit(100.0)).alias("bin_hi"),
        "cnt",
        "frac",
    )


def incremental_hist(
    stream: DataFrame, state_dir: str, checkpoint_dir: str | None = None
):
    """Continuous per-type value histogram; read the latest summary
    snapshot and call emit_hist for the distribution profile."""
    return _make_query(
        stream,
        state_dir,
        hist_partials,
        HIST_CARRY_SCHEMA,
        merge_hist,
        checkpoint_dir,
    )


# ---- mergeable quantile sketch: carry is the bottom-K-by-md5 sample


def _sketch_k() -> int:
    from hive_similarity_join_spark.queries.text_q import _SKETCH_K

    return _SKETCH_K


QSKETCH_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("h", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def qsketch_partials(batch: DataFrame) -> DataFrame:
    """Bottom-K documents by md5(doc_id) from a batch slice — the
    q_agg_quantile_sketch sample (queries/text_q.py). Mergeability is
    the whole point of this sketch family: the bottom-K of a set
    under a fixed hash order is associative, commutative, AND
    idempotent (min-K of a union = min-K of min-Ks), so the carry is
    exact in any epoch order and under replays — unlike KLL/t-digest,
    whose merges are approximate and order-sensitive."""
    k = _sketch_k()
    return (
        batch.select(
            F.md5(F.col("doc_id").cast("string")).alias("h"),
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
        )
        .orderBy("h", "doc_id")
        .limit(k)
    )


def merge_qsketch(carry: DataFrame | None, delta: DataFrame) -> DataFrame:
    k = _sketch_k()
    if carry is None:
        return delta
    # Union of two <=K-row samples, re-truncated: TakeOrdered over at
    # most 2K rows. Dedup is by the (h, doc_id) KEY, not the full row
    # (ADVICE r10): a replayed epoch is idempotent either way, but a
    # doc_id reappearing with a CHANGED n_chars must not occupy two of
    # the K slots — max(n_chars) is the DETERMINISTIC pick (order-free,
    # so merges stay associative/commutative; it is NOT latest-wins —
    # ADVICE r11). Under the tested append-only + replay contract both
    # rows are identical and max is a no-op; if latest-wins were ever
    # required, the carry would need an epoch column to arg-max on.
    return (
        carry.unionByName(delta)
        .groupBy("h", "doc_id")
        .agg(F.max("n_chars").alias("n_chars"))
        .orderBy("h", "doc_id")
        .limit(k)
    )


def emit_qsketch(carry: DataFrame) -> DataFrame:
    """The sketch's percentile estimates from the bottom-K carry —
    the q_agg_quantile_sketch estimate legs (p50/p90/p99 at rank
    ceil(q*k) within the sample's own value order)."""
    w = Window.orderBy("n_chars", "doc_id")
    wk = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sr = carry.select(
        "n_chars",
        F.row_number().over(w).cast("bigint").alias("sr"),
        F.count(F.lit(1)).over(wk).cast("bigint").alias("k"),
    )

    def pick(num, den, name):
        target = F.expr(f"({num} * k + {den - 1}) div {den}")
        return F.max(
            F.when(F.col("sr") == target, F.col("n_chars"))
        ).alias(name)

    return sr.agg(
        F.any_value("k").alias("k_sample"),
        pick(50, 100, "p50_est"),
        pick(90, 100, "p90_est"),
        pick(99, 100, "p99_est"),
    )


def incremental_qsketch(
    stream: DataFrame, state_dir: str, checkpoint_dir: str | None = None
):
    """Continuous quantile-sketch maintenance over a document stream;
    read the latest summary snapshot and call emit_qsketch for the
    percentile estimates."""
    return _make_query(
        stream,
        state_dir,
        qsketch_partials,
        QSKETCH_CARRY_SCHEMA,
        merge_qsketch,
        checkpoint_dir,
    )


# ------------- Gopher repetition report (mirror of q_text_gopher_rules)

GOPHER_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("total", T.LongType()),
        T.StructField("top2_chars", T.LongType()),
        T.StructField("dup5_chars", T.LongType()),
    ]
)


def gopher_partials(batch: DataFrame) -> DataFrame:
    """Per-doc repetition metrics from a batch slice — EXACTLY the
    batch key's gopher_doc_metrics (shared function, so the mirror
    cannot drift from q_text_gopher_rules). Each row is a pure
    function of its document, which is what makes the carry merge
    below idempotent."""
    from hive_similarity_join_spark.queries.hygiene_q import (
        gopher_doc_metrics,
    )

    return gopher_doc_metrics(batch)


def merge_gopher(carry: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Union + dedup by the doc_id KEY (max on the metric columns is a
    deterministic pick; duplicates are bit-identical rows anyway since
    the metrics are pure functions of the doc) — associative,
    commutative, idempotent, so epochs may arrive in any order and
    replayed epochs cannot double-count a document. Carry size is
    O(docs) rows of five scalars — the same class as the DAU mirror's
    (user, day) set, and the price of exactness for a report whose
    flags are per-document (a flagged doc must not flip back when a
    replay re-delivers it)."""
    if carry is None:
        merged = delta
    else:
        merged = carry.unionByName(delta)
    return merged.groupBy("doc_id").agg(
        F.max("source").alias("source"),
        F.max("total").alias("total"),
        F.max("top2_chars").alias("top2_chars"),
        F.max("dup5_chars").alias("dup5_chars"),
    )


def emit_gopher(carry: DataFrame) -> DataFrame:
    """The per-source Gopher report from the carry — the batch key's
    own gopher_report aggregate, verbatim."""
    from hive_similarity_join_spark.queries.hygiene_q import gopher_report

    return gopher_report(carry)


def incremental_gopher(
    stream: DataFrame, state_dir: str, checkpoint_dir: str | None = None
):
    """Continuous Gopher repetition-report maintenance over a document
    stream (NINTH continuous-aggregate mirror); read the latest
    summary snapshot and call emit_gopher for the per-source report."""
    return _make_query(
        stream,
        state_dir,
        gopher_partials,
        GOPHER_CARRY_SCHEMA,
        merge_gopher,
        checkpoint_dir,
    )


# ---- incremental median / MAD (TENTH mirror: q_events_anomaly_mad)

MAD_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("cents", T.LongType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def mad_partials(batch: DataFrame) -> DataFrame:
    """Exact value histogram of an events slice in integer cents —
    `value` carries two decimal places (the q_events_outliers corpus
    contract), so the count-per-cents histogram is a LOSSLESS, bounded
    (O(types x distinct cents), independent of event count) and
    SUMMABLE carry for a median/MAD, which is not otherwise a
    decomposable aggregate. Precondition (as with the other mirrors'
    documented contracts): value is non-null — the batch key counts
    null-value rows in n_total while excluding them from the
    percentiles, a split a histogram row with a null bucket would have
    to carry separately."""
    return (
        batch.select(
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def merge_mad(carry: DataFrame | None, delta: DataFrame) -> DataFrame:
    return merge_partials(carry, delta, ["event_type", "cents"], ["cnt"])


def emit_mad(carry: DataFrame) -> DataFrame:
    """q_events_anomaly_mad's exact output reconstructed from the
    cents histogram. Bit-equality argument: a 2-decimal double IS the
    correctly-rounded value of cents/100, so `cents/100.0` here equals
    the original data double; percentile_disc(0.5) = smallest value
    with cume_dist >= 0.5 = smallest cents with 2*cumsum(cnt) >= n
    (cents order and double order agree — IEEE subtraction/division
    are monotone and cent-granular values are far above double
    resolution); the dev percentile orders by the DOUBLE dev exactly
    as the batch key does, with Spark's default RANGE frame counting
    peer rows the way cume_dist does; the outlier fence re-applies the
    identical abs/multiply/compare double ops, weighted by cnt. All
    windows here run over the BOUNDED carry, never an event log."""
    wv = Window.partitionBy("event_type").orderBy("cents")
    tots = carry.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n_total")
    )
    c1 = carry.withColumn("cum", F.sum("cnt").over(wv)).join(tots, "event_type")
    med = (
        c1.filter(F.lit(2) * F.col("cum") >= F.col("n_total"))
        .groupBy("event_type")
        .agg(F.min("cents").alias("med_cents"))
        .select(
            "event_type",
            (F.col("med_cents") / F.lit(100.0)).alias("med_value"),
        )
    )
    d = (
        carry.join(med, "event_type")
        .join(tots, "event_type")
        .withColumn(
            "dev",
            F.abs(F.col("cents") / F.lit(100.0) - F.col("med_value")),
        )
    )
    wd = Window.partitionBy("event_type").orderBy("dev")
    mad = (
        d.withColumn("cum", F.sum("cnt").over(wd))
        .filter(F.lit(2) * F.col("cum") >= F.col("n_total"))
        .groupBy("event_type")
        .agg(F.min("dev").alias("mad_value"))
    )
    is_out = F.when(
        F.col("dev") > F.lit(3.0) * F.col("mad_value"), F.col("cnt")
    ).otherwise(F.lit(0))
    return (
        d.join(mad, "event_type")
        .groupBy("event_type", "med_value", "mad_value")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_total"),
            F.sum(is_out).cast("bigint").alias("n_outliers"),
            (
                F.sum(is_out).cast("double")
                / F.sum("cnt").cast("double")
            ).alias("outlier_frac"),
        )
        .select(
            "event_type", "n_total", "med_value", "mad_value",
            "n_outliers", "outlier_frac",
        )
        .orderBy("event_type")
    )


def incremental_mad(
    stream: DataFrame, state_dir: str, checkpoint_dir: str | None = None
):
    """Continuous exact median/MAD anomaly-report maintenance over an
    events stream (TENTH continuous-aggregate mirror): the carry is
    the per-type cents histogram — the bounded-domain dual of the
    qsketch mirror's bottom-K sample (exact when the value domain is
    bounded, as 2-decimal metrics are; sampling when it is not). Read
    the latest summary snapshot and call emit_mad for the report."""
    return _make_query(
        stream,
        state_dir,
        mad_partials,
        MAD_CARRY_SCHEMA,
        merge_mad,
        checkpoint_dir,
    )


# ---- mixture-composition monitor (TWELFTH mirror: q_mixture_drift)

MIXTURE_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def mixture_partials(batch: DataFrame) -> DataFrame:
    """Per-(source, lang) doc counts of a documents slice — the
    finest-grain partial of q_mixture_drift (queries/hygiene_q.py):
    both marginals and the corpus total are derivable from the cell
    counts, so the carry holds ONLY cells. COUNT sums, so merging is
    exact in any epoch order."""
    return batch.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def merge_mixture(carry: DataFrame | None, delta: DataFrame) -> DataFrame:
    return merge_partials(carry, delta, ["source", "lang"], ["cnt"])


def emit_mixture(carry: DataFrame) -> DataFrame:
    """q_mixture_drift's exact output from the (source, lang) carry:
    marginals and the total re-derive from the cells (never stored, so
    they cannot desync), and every share is the batch key's identical
    single int/int division — bit-equal emission."""
    per_src = carry.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("src_total")
    )
    per_lang = carry.groupBy("lang").agg(
        F.sum("cnt").cast("bigint").alias("lang_total")
    )
    n_all = carry.agg(F.sum("cnt").cast("bigint").alias("total"))
    src_share = F.col("cnt").cast("double") / F.col("src_total")
    corpus_share = F.col("lang_total").cast("double") / F.col("total")
    return (
        carry.join(F.broadcast(per_src), "source")
        .join(F.broadcast(per_lang), "lang")
        .crossJoin(F.broadcast(n_all))
        .select(
            "source",
            "lang",
            F.col("cnt").cast("bigint").alias("n"),
            src_share.alias("src_share"),
            corpus_share.alias("corpus_share"),
            (src_share / corpus_share).alias("share_ratio"),
        )
    )


def incremental_mixture(
    stream: DataFrame, state_dir: str, checkpoint_dir: str | None = None
):
    """Continuous corpus-composition monitoring over a documents
    stream (TWELFTH continuous-aggregate mirror): the live form of the
    q_mixture_drift report a multi-source ingest watches to catch a
    crawler or source feed skewing the mixture MID-INGEST, not at the
    next batch audit — the diagnose arc of the mixture loop
    (q_mixture_reweight optimizes, q_mixture_reweight_apply samples)
    running continuously. Carry is O(sources x langs) cells; per epoch
    one map-side-combined shuffle of the slice plus the cell-sized
    merge. Read the latest summary snapshot and call emit_mixture."""
    return _make_query(
        stream,
        state_dir,
        mixture_partials,
        MIXTURE_CARRY_SCHEMA,
        merge_mixture,
        checkpoint_dir,
    )


# -- continuous DoReMi weights (THIRTEENTH mirror: q_mixture_reweight)

REWEIGHT_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),   # 'r' ref-vocab / 'h' held / 'd' doc-count
        T.StructField("source", T.StringType()),
        T.StructField("w1", T.StringType()),
        T.StructField("w2", T.StringType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def reweight_partials(batch: DataFrame) -> DataFrame:
    """Three partial relations of a documents slice in one tagged
    carry: the slice's reference-half bigram TYPES ('r' rows — cnt
    carries the type's occurrence count but only existence matters),
    the held-out-half per-(source, w1, w2) occurrence counts ('h'),
    and per-source doc counts ('d'). Bigram extraction and the md5
    ref/held coin are operators/reweight.py doc_bigrams — the batch
    key's own front, shared so the mirror cannot drift on
    tokenization or the split. A doc's half-assignment is a pure
    function of doc_id, so every partial is decomposable: counts sum,
    and the ref-vocab rows are union-dedup (sum keeps existence)."""
    from hive_similarity_join_spark.operators.reweight import doc_bigrams

    bg = doc_bigrams(batch)
    ref = (
        bg.filter(F.col("is_ref"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            F.lit("r").alias("kind"), F.lit("").alias("source"),
            "w1", "w2", "cnt",
        )
    )
    held = (
        bg.filter(~F.col("is_ref"))
        .groupBy("_dom", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            F.lit("h").alias("kind"), F.col("_dom").alias("source"),
            "w1", "w2", "cnt",
        )
    )
    docs = (
        batch.groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            F.lit("d").alias("kind"), "source",
            F.lit("").alias("w1"), F.lit("").alias("w2"), "cnt",
        )
    )
    return ref.unionByName(held).unionByName(docs)


def merge_reweight(carry: DataFrame | None, delta: DataFrame) -> DataFrame:
    return merge_partials(carry, delta, ["kind", "source", "w1", "w2"], ["cnt"])


def emit_reweight(carry: DataFrame) -> DataFrame:
    """q_mixture_reweight's exact output from the carry: the loss
    proxy re-derives from the 'r'/'h' relations
    (operators/reweight.py oov_loss_from_parts — all occurrences of a
    bigram type share OOV status, so per-type counts reproduce the
    per-occurrence numbers exactly), shares from the 'd' rows, and
    the MW rounds + report are the batch key's own reweight_report.
    Emission cost is O(bigram types), never O(docs); the MW loop runs
    on the D-row loss relation. Unlike most mirrors' O(groups) emit,
    the ref-vocab probe makes this emit a real join — the price of a
    loss proxy that is NOT decomposable per domain (a later reference
    doc can flip an earlier held-out bigram from OOV to in-vocab;
    storing per-type counts instead of a per-domain scalar is what
    keeps the mirror exact under that retraction)."""
    from hive_similarity_join_spark.operators.cache import pin
    from hive_similarity_join_spark.operators.reweight import (
        oov_loss_from_parts,
        reweight_report,
    )

    refv = carry.filter(F.col("kind") == "r").select("w1", "w2")
    held = carry.filter(F.col("kind") == "h").select(
        F.col("source").alias("_dom"), "w1", "w2", "cnt"
    )
    shares = carry.filter(F.col("kind") == "d").select(
        "source", F.col("cnt").cast("bigint").alias("n_docs")
    )
    loss = pin(oov_loss_from_parts(refv, held))
    return reweight_report(loss, shares)


def incremental_reweight(
    stream: DataFrame, state_dir: str, checkpoint_dir: str | None = None
):
    """Continuous DoReMi domain weights over a documents stream
    (THIRTEENTH continuous-aggregate mirror): live mixture
    optimization — as docs arrive, the carry accumulates the
    reference vocabulary, the held-out per-type counts, and the doc
    counts, and every snapshot emits the SAME converged weights the
    batch q_mixture_reweight computes on the corpus so far. The full
    mixture loop (diagnose q_mixture_drift -> optimize this ->
    apply q_mixture_reweight_apply) now runs continuously. Carry is
    O(bigram types); read the latest summary snapshot and call
    emit_reweight for the weights."""
    return _make_query(
        stream,
        state_dir,
        reweight_partials,
        REWEIGHT_CARRY_SCHEMA,
        merge_reweight,
        checkpoint_dir,
    )


# ---- continuous sequence packing (FOURTEENTH mirror: q_pack_sequences)

PACK_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def pack_partials(batch: DataFrame) -> DataFrame:
    """Per-doc packing inputs of a documents slice — (doc_id, source,
    n_chars), each row a pure function of its document."""
    return batch.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )


def merge_pack(carry: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Union + dedup by the doc_id KEY (max is a deterministic pick;
    duplicate rows are bit-identical anyway since the columns are pure
    functions of the doc) — associative, commutative, idempotent, so
    epochs arrive in any order and replays cannot double-pack a doc.
    Carry is O(docs) rows of three scalars — the gopher mirror's
    class, and unavoidable: a doc's bin depends on the prefix sum of
    ALL smaller-id docs in its source, including ones that arrive
    LATER (packing is not a per-group decomposable aggregate; the
    doc-level set is its finest decomposition)."""
    if carry is None:
        merged = delta
    else:
        merged = carry.unionByName(delta)
    return merged.groupBy("doc_id").agg(
        F.max("source").alias("source"),
        F.max("n_chars").alias("n_chars"),
    )


def emit_pack(carry: DataFrame) -> DataFrame:
    """q_pack_sequences' exact output from the doc carry — the batch
    key's own grouped_prefix_scan layout (two-pass distributed running
    sum, no low-cardinality window) over the packed-so-far corpus:
    every snapshot IS the shard layout of the data that has arrived,
    and a late doc re-binning its source's suffix is the documented
    semantics (stable shard prefixes need id-ordered arrival, which
    the versioned-carry contract does not require)."""
    from hive_similarity_join_spark.operators.scan import (
        grouped_prefix_scan,
    )
    from hive_similarity_join_spark.queries.pipeline_q import PACK_BUDGET

    cum = grouped_prefix_scan(
        carry, ["source"], ["doc_id"], [("n_chars", "sum", "_incl")]
    )
    start = F.col("_incl") - F.col("n_chars")
    return cum.select(
        "doc_id",
        "source",
        F.floor(start / F.lit(float(PACK_BUDGET)))
        .cast("bigint")
        .alias("bin_id"),
        start.cast("bigint").alias("start_offset"),
    )


def incremental_pack(
    stream: DataFrame, state_dir: str, checkpoint_dir: str | None = None
):
    """Continuous sequence-packing maintenance over a documents stream
    (FOURTEENTH continuous-aggregate mirror): the live form of the
    pretraining shard layout — as docs arrive, every snapshot emits
    the SAME per-doc (bin, offset) assignment the batch
    q_pack_sequences computes on the corpus so far. Read the latest
    summary snapshot and call emit_pack for the layout."""
    return _make_query(
        stream,
        state_dir,
        pack_partials,
        PACK_CARRY_SCHEMA,
        merge_pack,
        checkpoint_dir,
    )
