"""Dynamic partition pruning: the runtime-pruning device
q_join_partition_pruned demonstrates, pinned at the PLAN level — the
oracle checks the answer, this checks the mechanism."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_dpp_plants_runtime_filter_and_prunes(spark):
    from hive_similarity_join_spark.queries.relational_q import (
        q_join_partition_pruned,
    )

    df = q_join_partition_pruned(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the fact scan's PartitionFilters must carry the runtime subquery
    assert "dynamicpruning" in plan, plan
    # ...and the answer is the quarter's three months
    rows = df.collect()
    assert sorted(r.om for r in rows) == ["1996-04", "1996-05", "1996-06"]
    # pruning is real: the same fact read WITH a static filter on the
    # three months scans the same data the DPP join did
    want = {(r.om, r.n_orders) for r in rows}
    import re as _re

    tag = _re.sub(r"[^0-9a-zA-Z]", "_", spark.sparkContext.applicationId)
    fact = spark.read.parquet(f"/tmp/hsjs_dpp_{tag}/orders")
    static = (
        fact.filter(F.col("om").isin("1996-04", "1996-05", "1996-06"))
        .groupBy("om")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    assert {(r.om, r.n_orders) for r in static.collect()} == want
