"""Distributed grouped prefix scans (running sum / min / max).

A running aggregate over a whole relation partitioned only by a
low-cardinality column is the serial-sort bottleneck the plan gate
(plans/inspect.py ``low_cardinality_window_violations``) forbids: five
event types means the entire fact table sorts through five tasks. But
prefix SUM/MIN/MAX are associative scans, and the classic two-pass
parallel-prefix decomposition (Blelloch scan, the same scheme
:mod:`operators.rank` uses for the special case ``value = 1``) runs
them at full cluster width:

1. ``repartitionByRange`` on (group, order) — each partition holds a
   contiguous slice of the total order, a giant group spans MANY
   partitions, partition ids ordered by key.
2. ``localCheckpoint`` freezes the partitioning (the range sampler's
   seed varies with RDD identity; without the freeze the two passes
   could disagree on boundaries and corrupt the scan).
3. Per-(partition, group) partial aggregates — one map-side-combined
   shuffle of O(n_part x |groups|) rows.
4. EXCLUSIVE prefix of the partials per group across partition ids —
   a window over the tiny partials relation (no driver collect at
   all: the combine stays distributed and handles compound group
   keys for free; :mod:`operators.rank`'s ``ranked_by`` is the
   ``group_cols=[]``, ``value = 1`` special case since round 11).
5. Broadcast-join the offsets back and combine with the
   WITHIN-partition running aggregate: ``off + run`` for sum,
   ``least/greatest(off, run)`` for min/max (Spark's least/greatest
   skip nulls, which is exactly the empty-prefix identity).

Partition boundaries do not affect the result — the running value at
a row is determined by the total order alone — so the output is
deterministic across sessions whenever ``order_cols`` is a strict
total order within each group (with ties, per-row running values are
tie-order-dependent on BOTH engines; callers relying on
tie-invariant downstream aggregates — weighted-median's threshold
crossing — document that invariance instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hive_similarity_join_spark.operators.partitions import parallelism

#: (value column name, kind, output column name)
Scan = tuple[str, str, str]

_RUN = {"sum": F.sum, "min": F.min, "max": F.max}
_COMBINE = {
    "sum": lambda off, run: F.coalesce(off, F.lit(0)) + run,
    "min": lambda off, run: F.least(off, run),
    "max": lambda off, run: F.greatest(off, run),
}


def grouped_prefix_scan(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str | Column],
    scans: list[Scan],
) -> DataFrame:
    """Append running-aggregate columns over each group's total order.

    ``scans`` is a list of ``(value_col, kind, out_col)`` with kind in
    ``sum | min | max``; all scans share the two passes. Sum output
    types follow Spark's widening (bigint stays bigint, decimal
    widens) — cast at the call site where a narrower type is wanted.
    ``group_cols`` must be low-cardinality relative to the partition
    count for the partials relation to stay tiny (that is the use
    case: HIGH-card groups should just use an ordinary partitioned
    window, which is already parallel).
    """
    spark = df.sparkSession
    n_part = parallelism(spark)
    order = [F.asc(c) if isinstance(c, str) else c for c in order_cols]
    ranged = (
        df.repartitionByRange(n_part, *[F.col(g) for g in group_cols], *order)
        .withColumn("_ps_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    partials = ranged.groupBy("_ps_pid", *group_cols).agg(
        *[_RUN[kind](v).alias(f"_pp_{out}") for v, kind, out in scans]
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("_ps_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = partials.select(
        "_ps_pid",
        *group_cols,
        *[
            _RUN[kind](f"_pp_{out}").over(w_off).alias(f"_off_{out}")
            for _, kind, out in scans
        ],
    )
    # Null-safe join-back (ADVICE r10): a plain equi-join would drop the
    # offset for a NULL group key (null != null), silently restarting
    # the running aggregate per range partition — diverging from the
    # Window.partitionBy semantics this operator replaces (windows
    # treat NULL as a group). eqNullSafe keeps NULL-group rows correct;
    # _ps_pid itself is never null (spark_partition_id). Offset-side
    # columns are renamed so the condition join doesn't duplicate names.
    off_side = offsets.select(
        F.col("_ps_pid").alias("_off_pid"),
        *[F.col(g).alias(f"_offg_{i}") for i, g in enumerate(group_cols)],
        *[F.col(f"_off_{s[2]}") for s in scans],
    )
    cond = F.col("_ps_pid") == F.col("_off_pid")
    for i, g in enumerate(group_cols):
        cond = cond & F.col(g).eqNullSafe(F.col(f"_offg_{i}"))
    joined = ranged.join(F.broadcast(off_side), cond, "left").drop(
        "_off_pid", *[f"_offg_{i}" for i in range(len(group_cols))]
    )
    w_run = (
        Window.partitionBy("_ps_pid", *group_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined.select(
        "*",
        *[
            _COMBINE[kind](
                F.col(f"_off_{out}"), _RUN[kind](v).over(w_run)
            ).alias(out)
            for v, kind, out in scans
        ],
    )
    return out.drop("_ps_pid", *[f"_off_{s[2]}" for s in scans])
