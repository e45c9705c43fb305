"""Distributed total-order ranking.

A global ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY
collapses the input to one task (``Exchange SinglePartition``) — a
serial sort that becomes the bottleneck the moment the vocabulary is
not small (web-scale corpora: typos, URLs, numbers). This module
provides the scale-safe equivalent: a two-pass range-partitioned rank.

Scheme (classic distributed ranking, cf. Spark's own zipWithIndex):

1. ``repartitionByRange`` on the sort key — each partition holds a
   contiguous key range, partition ids ordered by key.
2. ``localCheckpoint`` freezes the partitioning, so the counting pass
   and the ranking pass cannot see different range boundaries (the
   range sampler's seed varies with RDD identity; without the freeze
   the two passes could disagree and corrupt ranks).
3. Count rows per partition — a bounded driver-side collect of at most
   ``spark.sql.shuffle.partitions`` rows (same bounded-collect pattern
   as IVF's centroid pull, operators/ivf.py).
4. ``row_number`` windowed WITHIN each partition plus the partition's
   cumulative offset (a literal array indexed by partition id).

Partition boundaries themselves do not affect the result — rank is the
global position in the total order wherever the cuts land — so the
output is deterministic across sessions for a strict total order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from hive_similarity_join_spark.operators.partitions import parallelism


def ranked_by(df: DataFrame, order_cols: list[str | Column], rank_col: str) -> DataFrame:
    """Append 1-based dense row-number ``rank_col`` ordered by
    ``order_cols`` ascending, computed without a single-partition sort.

    ``order_cols`` must form a strict total order (no duplicate key
    tuples) for the result to be deterministic.
    """
    spark = df.sparkSession
    n_part = parallelism(spark)
    cols = [F.asc(c) if isinstance(c, str) else c for c in order_cols]
    ranged = (
        df.repartitionByRange(n_part, *cols)
        .withColumn("_rk_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["_rk_pid"]: r["_rk_cnt"]
        for r in ranged.groupBy("_rk_pid")
        .agg(F.count(F.lit(1)).alias("_rk_cnt"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in range(max(n_part, max(counts, default=0) + 1)):
        offsets.append(acc)
        acc += counts.get(pid, 0)
    w = Window.partitionBy("_rk_pid").orderBy(*cols)
    # bigint throughout: a 100 TB fact table exceeds 2^31 rows, and the
    # per-partition offsets are sums over the whole relation
    off = F.element_at(
        F.array(*[F.lit(o).cast("bigint") for o in offsets]),
        F.col("_rk_pid") + 1,
    )
    return ranged.withColumn(
        rank_col, (F.row_number().over(w) + off).cast("bigint")
    ).drop("_rk_pid")


def ranked_topk(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Global top-``k`` by ``order_cols`` with a 1-based ``rank_col``.

    Invariant that makes this scale-safe: the unpartitioned window runs
    AFTER ``limit(k)``, so it only ever sees ``k`` rows — the global
    ordering itself plans as ``TakeOrderedAndProject`` (per-partition
    heaps, no full sort, no single-partition exchange over the input).
    Windowing BEFORE the limit would collapse the whole relation to one
    task; use :func:`ranked_by` when every row needs a rank.

    ``order_cols`` must form a strict total order over the input for a
    deterministic result (ties would make row_number nondeterministic).
    """
    w = Window.orderBy(*order_cols)
    return (
        df.orderBy(*order_cols)
        .limit(k)
        .withColumn(rank_col, F.row_number().over(w).cast("bigint"))
    )
