"""Incremental Count-Min-Sketch maintenance over a document stream —
the streaming mirror of q_agg_cms_topk's counter build, exercising the
property that makes CMS the streaming-native frequency sketch:
counters are exact integer sums, so counters(A ∪ B) = counters(A) +
counters(B) cell-wise, and a micro-batch updates the standing sketch
with one vocab-sized aggregation + one <= D*W-cell merge.

``foreachBatch`` composition like the other incremental operators: the
counter table lives as VERSIONED parquet carries under
``counters_dir`` (at most CMS_D x CMS_W rows — kilobytes); per epoch
the batch's token counts fold into the newest version strictly below
the current epoch id and the next version is written
(streaming/state.py contract — a retried epoch never double-folds its
batch). The bounded
driver-side collect of the OLD counter table is the sketch's whole
point — state is O(D*W) regardless of stream volume (contrast the
exact seen-shingle store in incremental_novelty.py, which grows with
the data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_similarity_join_spark.operators import cms
from hive_similarity_join_spark.streaming.state import (
    carry_versions,
    prune_carries,
)

_COUNTER_SCHEMA = T.StructType(
    [
        T.StructField("r", T.IntegerType()),
        T.StructField("b", T.LongType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def _read_counters(
    spark: SparkSession, counters_dir: str, below_epoch: int | None = None
) -> list[Row]:
    """Standing counter cells (bounded by D*W rows) from the newest
    carry version (strictly below ``below_epoch`` when given — the
    retry-safe read of the streaming/state.py contract), or [] before
    the first epoch. Collected driver-side: state is O(D*W) by
    construction, the sketch's whole point."""
    versions = carry_versions(counters_dir, below_epoch=below_epoch)
    if not versions:
        return []
    try:
        return (
            spark.read.schema(_COUNTER_SCHEMA).parquet(versions[-1]).collect()
        )
    except Exception:
        return []


def update_counters(
    batch: DataFrame,
    old: list[Row],
    tokens_col,
) -> DataFrame:
    """The per-epoch core (pure batch function): old cells + the
    batch's cells, merged cell-wise."""
    spark = batch.sparkSession
    tc = (
        batch.select(F.explode(tokens_col).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    delta = cms.counters_from_token_counts(tc)
    if not old:
        return delta
    prev = spark.createDataFrame(old, _COUNTER_SCHEMA).select(
        F.col("r").cast("int").alias("r"),
        F.col("b").cast("bigint").alias("b"),
        F.col("cnt").cast("bigint").alias("cnt"),
    )
    return cms.merge_counters(
        delta.select(
            F.col("r").cast("int"), F.col("b").cast("bigint"), "cnt"
        ),
        prev,
    )


def incremental_cms(
    stream: DataFrame,
    counters_dir: str,
    tokens_col,
    checkpoint_dir: str | None = None,
):
    """Start the streaming query; returns the StreamingQuery handle.
    ``counters_dir`` holds the standing sketch as parquet."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        old = _read_counters(spark, counters_dir, below_epoch=epoch_id)
        merged = update_counters(batch, old, tokens_col)
        # versioned carry dirs (streaming/state.py): a retried epoch
        # re-reads the PRIOR version, so the batch never double-folds
        merged.coalesce(1).write.mode("overwrite").parquet(
            f"{counters_dir}/carry_v{epoch_id}"
        )
        prune_carries(counters_dir)

    writer = stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
