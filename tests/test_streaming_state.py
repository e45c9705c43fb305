"""The versioned-carry state contract (streaming/state.py): a retried
epoch must never consume the carry its own failed attempt wrote."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import types as T

from hive_similarity_join_spark.streaming.state import (
    carry_versions,
    read_latest_carry,
)

_SCHEMA = T.StructType([T.StructField("v", T.LongType())])


def test_retry_reads_only_prior_epoch_carry(spark, tmp_path):
    state = str(tmp_path / "state")
    for epoch, val in [(0, 10), (1, 20)]:
        spark.createDataFrame([Row(v=val)], _SCHEMA).write.parquet(
            f"{state}/carry_v{epoch}"
        )
    # epoch 1 retrying: must read v0 (its own failed write v1 exists)
    got = read_latest_carry(spark, state, _SCHEMA, below_epoch=1)
    assert [r.v for r in got.collect()] == [10]
    # epoch 2 (fresh): reads v1
    got = read_latest_carry(spark, state, _SCHEMA, below_epoch=2)
    assert [r.v for r in got.collect()] == [20]
    # epoch 0 retrying on a dirty dir: no prior carry at all
    assert read_latest_carry(spark, state, _SCHEMA, below_epoch=0) is None
    assert len(carry_versions(state)) == 2
    assert len(carry_versions(state, below_epoch=1)) == 1
