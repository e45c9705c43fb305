"""Explicit repartition sizing for AQE-exempt candidate joins.

Several operators repartition explicitly because their joins have tiny
INPUTS but quadratic candidate OUTPUTS — AQE sizes post-shuffle
partitions by map-output bytes and would coalesce the join (and the
verify behind it) to ~1 task. Those explicit counts must NOT inherit
``spark.sql.shuffle.partitions`` verbatim: the session conf is sized
for generic large shuffles (the external driver's plain session runs
Spark's default 200), while these relations are corpus-bounded — a
200-way repartition of a ~50k-row band relation pays ~6x the
task-scheduling overhead of the work itself (driver r4/r5:
q_dedup_minhash_lsh 21s vs the 8.6s builder baseline at 32; VERDICT r5
flagged this as the one reproducible systematic gap).

``sc.defaultParallelism`` is the right signal instead: total cluster
cores (local[32] -> 32 in BOTH the builder's and the driver's session;
a 1000-executor x 4-core cluster -> 4000), i.e. one wave of tasks over
whatever hardware actually exists, independent of the generic shuffle
sizing knob. Callers that need MORE than one wave (e.g. memory-bound
verify fan-out) can scale the returned value explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def parallelism(obj: DataFrame | SparkSession) -> int:
    """Total scheduler cores for ``obj``'s session (see module doc)."""
    spark = obj.sparkSession if isinstance(obj, DataFrame) else obj
    try:
        return int(spark.sparkContext.defaultParallelism)
    except Exception:
        # Sessions without a driver-side SparkContext (Connect-style):
        # fall back to the conf rather than guessing at hardware.
        return int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
