"""Incremental CUSUM monitoring — the streaming mirror of
``q_events_cusum`` (queries/events_q.py) in its SPC deployment form:
two-sided CUSUM excursions per key against a FIXED reference mean,
maintained exactly across micro-batch boundaries.

The batch key estimates the mean from the data it scans (a
changepoint SCAN over a closed dataset); a monitor cannot — the
reference level mu0 is a parameter learned from a control period,
which is precisely how CUSUM control charts are specified. With mu0
fixed, the closed form S_k = P_k - min(0, min_{j<=k} P_j) over prefix
sums P of (x - mu0) decomposes across epochs: a batch slice only
needs the carried prefix total, the carried running min/max, and the
carried best excursions to extend the recursion exactly.

State per key is ONE row of exact decimals:

  (key, p, rmin, rmax, s_pos_max, s_neg_max, cp_ts, n)

  p     — prefix sum of deviations over everything seen;
  rmin  — min(0, min over all prefixes) so far;  rmax — the mirror;
  s_pos_max / s_neg_max — the max excursions so far;
  cp_ts — timestamp of the positive peak (earliest on ties).

Per epoch: one window pass over the batch (partitioned by key,
ordered by the (tsu, uid) total order — the ordered-arrival contract
shared with incremental_novelty / incremental_intervals) computes
within-batch running prefixes; adding the carried ``p`` shifts them
to global prefixes, so excursions against least(rmin, ...) are the
SAME exact decimals the batch closed form produces. A full outer join
against the carry keeps keys silent in this epoch. Everything is
decimal arithmetic — no floats in state, so no accumulation drift,
ever: pytest asserts the multi-epoch state is IDENTICAL to the
single-shot computation, not merely close.

State is O(keys); the per-epoch cost is one shuffle of the batch on
key plus a carry-sized join. The versioned parquet carry contract
(streaming/state.py) makes it restart-durable and retry-safe: read
the newest version strictly below the current epoch id, write this
epoch's version, prune to two.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_similarity_join_spark.streaming.state import (
    prune_carries,
    read_latest_carry,
)

_DEC = "decimal(38,6)"

_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("p", T.DecimalType(38, 6)),
        T.StructField("rmin", T.DecimalType(38, 6)),
        T.StructField("rmax", T.DecimalType(38, 6)),
        T.StructField("s_pos_max", T.DecimalType(38, 6)),
        T.StructField("s_neg_max", T.DecimalType(38, 6)),
        T.StructField("cp_ts", T.TimestampType()),
        T.StructField("n", T.LongType()),
    ]
)


def process_epoch(
    batch: DataFrame, carry: DataFrame | None, mu0: Decimal
) -> DataFrame:
    """Pure per-epoch core. ``batch`` is (key, tsu, uid, x) with x a
    decimal(18,6) reading and (tsu, uid) a total order; returns the
    updated carry. With ``carry=None`` this IS the closed-form batch
    computation against mu0, which the equivalence test exploits."""
    zero = F.lit(0).cast(_DEC)
    d = (F.col("x") - F.lit(mu0).cast("decimal(18,6)")).cast(_DEC)
    w_run = (
        Window.partitionBy("key")
        .orderBy("tsu", "uid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rows = batch.select("key", "tsu", "uid", d.alias("d")).select(
        "key",
        "tsu",
        "uid",
        F.sum("d").over(w_run).cast(_DEC).alias("pre_b"),
    )
    rows = rows.select(
        "key",
        "tsu",
        "uid",
        "pre_b",
        F.min("pre_b").over(w_run).cast(_DEC).alias("minb"),
        F.max("pre_b").over(w_run).cast(_DEC).alias("maxb"),
    )
    if carry is not None:
        c = carry.select(
            "key",
            F.col("p").alias("_p0"),
            F.col("rmin").alias("_rmin0"),
            F.col("rmax").alias("_rmax0"),
            F.col("s_pos_max").alias("_spos0"),
            F.col("s_neg_max").alias("_sneg0"),
            F.col("cp_ts").alias("_cp0"),
            F.col("n").alias("_n0"),
        )
    else:
        spark = batch.sparkSession
        c = spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("key", T.StringType()),
                    T.StructField("_p0", T.DecimalType(38, 6)),
                    T.StructField("_rmin0", T.DecimalType(38, 6)),
                    T.StructField("_rmax0", T.DecimalType(38, 6)),
                    T.StructField("_spos0", T.DecimalType(38, 6)),
                    T.StructField("_sneg0", T.DecimalType(38, 6)),
                    T.StructField("_cp0", T.TimestampType()),
                    T.StructField("_n0", T.LongType()),
                ]
            ),
        )
    j = rows.join(c, "key", "full")
    p0 = F.coalesce(F.col("_p0"), zero)
    rmin0 = F.coalesce(F.col("_rmin0"), zero)
    rmax0 = F.coalesce(F.col("_rmax0"), zero)
    scored = j.select(
        "key",
        "tsu",
        "uid",
        "pre_b",
        "minb",
        "maxb",
        "_spos0",
        "_sneg0",
        "_cp0",
        "_n0",
        p0.alias("p0"),
        rmin0.alias("rmin0"),
        rmax0.alias("rmax0"),
        ((p0 + F.col("pre_b")) - F.least(rmin0, p0 + F.col("minb")))
        .cast(_DEC)
        .alias("s_pos"),
        (F.greatest(rmax0, p0 + F.col("maxb")) - (p0 + F.col("pre_b")))
        .cast(_DEC)
        .alias("s_neg"),
    )
    w_best = Window.partitionBy("key").orderBy(
        F.col("s_pos").desc(), "tsu", "uid"
    )
    w_last = Window.partitionBy("key").orderBy("tsu", "uid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # every w_last aggregate is computed BEFORE the rank filter — a
    # window in a post-filter select would see only the surviving row
    agg = (
        scored.select(
            "*",
            F.row_number().over(w_best).alias("_rn"),
            F.last("pre_b").over(w_last).alias("_pre_last"),
            F.min("pre_b").over(w_last).cast(_DEC).alias("_minb_all"),
            F.max("pre_b").over(w_last).cast(_DEC).alias("_maxb_all"),
            F.max("s_neg").over(w_last).cast(_DEC).alias("_bsneg"),
            F.count("uid").over(w_last).alias("_bn"),
        )
        .filter(F.col("_rn") == 1)
        .select(
            "key",
            "_spos0",
            "_sneg0",
            "_cp0",
            "_n0",
            "p0",
            "rmin0",
            "rmax0",
            # silent key (carry row with no batch rows): every batch
            # column is NULL, the coalesces below keep the old state
            F.col("s_pos").alias("_bspos"),
            F.col("tsu").alias("_bts"),
            (F.col("p0") + F.col("_pre_last")).cast(_DEC).alias("_pnew"),
            F.least(F.col("rmin0"), F.col("p0") + F.col("_minb_all"))
            .cast(_DEC)
            .alias("_rminnew"),
            F.greatest(F.col("rmax0"), F.col("p0") + F.col("_maxb_all"))
            .cast(_DEC)
            .alias("_rmaxnew"),
            "_bsneg",
            "_bn",
        )
    )
    spos0 = F.coalesce(F.col("_spos0"), zero)
    sneg0 = F.coalesce(F.col("_sneg0"), zero)
    bspos = F.coalesce(F.col("_bspos"), zero)
    bsneg = F.coalesce(F.col("_bsneg"), zero)
    return agg.select(
        "key",
        F.coalesce("_pnew", "p0").alias("p"),
        F.coalesce("_rminnew", "rmin0").alias("rmin"),
        F.coalesce("_rmaxnew", "rmax0").alias("rmax"),
        F.greatest(spos0, bspos).alias("s_pos_max"),
        F.greatest(sneg0, bsneg).alias("s_neg_max"),
        # >= keeps the EARLIEST peak on exact ties (the carry is
        # strictly earlier than any batch row under ordered arrival)
        F.when(F.col("_cp0").isNotNull() & (spos0 >= bspos), F.col("_cp0"))
        .otherwise(F.col("_bts"))
        .alias("cp_ts"),
        (F.coalesce(F.col("_n0"), F.lit(0)) + F.coalesce(F.col("_bn"), F.lit(0)))
        .cast("bigint")
        .alias("n"),
    )


def incremental_cusum(
    stream: DataFrame,
    state_dir: str,
    mu0: Decimal,
    checkpoint_dir: str | None = None,
):
    """Start the monitor over a (key, tsu, uid, x) reading stream.
    The carry (= the live CUSUM summary per key) lives in versioned
    dirs ``{state_dir}/carry_v{epoch}`` per the streaming/state.py
    contract; each epoch also snapshots it to an epoch-named overwrite
    dir under ``{state_dir}/summary`` so a retried epoch rewrites
    rather than duplicates."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        carry = read_latest_carry(
            spark, state_dir, _CARRY_SCHEMA, below_epoch=epoch_id
        )
        new_carry = process_epoch(batch, carry, mu0)
        new_carry.write.mode("overwrite").parquet(
            f"{state_dir}/carry_v{epoch_id}"
        )
        spark.read.schema(_CARRY_SCHEMA).parquet(
            f"{state_dir}/carry_v{epoch_id}"
        ).write.mode("overwrite").parquet(
            f"{state_dir}/summary/epoch_{epoch_id}"
        )
        prune_carries(state_dir)

    writer = stream.writeStream.foreachBatch(process).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
