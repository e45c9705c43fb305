"""salted_join: result-identical to the plain join, with the salt
visible in the physical shuffle keys."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hive_similarity_join_spark.operators.skew import salted_join
from hive_similarity_join_spark.plans.inspect import explain_str
from hive_similarity_join_spark.sources.loader import load_table
from tests.conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def test_inner_join_multiset_identical_under_skew(spark):
    """A pathologically hot key (every left row shares it) must produce
    exactly the plain join's multiset."""
    left = spark.createDataFrame(
        [Row(k=1 if i % 10 else i, id=i, v=i * 2) for i in range(500)]
    )
    right = spark.createDataFrame(
        [Row(k=i, w=f"r{i}") for i in range(0, 50)]
        + [Row(k=1, w="hot2")]  # duplicate right key: output blowup
    )
    cols = ["k", "id", "v", "w"]
    got = _rows(salted_join(left, right, "k", spread_col="id", n_salts=8), cols)
    want = _rows(left.join(right, "k"), cols)
    assert got == want and got


def test_left_join_keeps_unmatched_left_rows_once(spark):
    left = spark.createDataFrame([Row(k=i % 3, id=i) for i in range(30)])
    right = spark.createDataFrame([Row(k=0, w="a"), Row(k=0, w="b")])
    cols = ["k", "id", "w"]
    got = _rows(
        salted_join(left, right, "k", spread_col="id", how="left", n_salts=4),
        cols,
    )
    want = _rows(left.join(right, "k", "left"), cols)
    assert got == want


def test_salt_reaches_the_shuffle_keys(spark):
    """The salt must be part of the join's partitioning so the hot key
    actually spreads — assert it appears in the physical plan's
    hashpartitioning / join keys (broadcast would hide it, so force a
    big-enough right side via the real tables)."""
    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    j = salted_join(
        li.select("o_orderkey", "l_linenumber", "l_quantity"),
        o.select("o_orderkey", "o_totalprice"),
        "o_orderkey",
        spread_col=["o_orderkey", "l_linenumber"],
        n_salts=4,
    )
    plan = explain_str(j)
    assert "_skew_salt" in plan
    # result columns don't leak the salt
    assert "_skew_salt" not in j.columns


def test_guards(spark):
    df = spark.createDataFrame([Row(k=1, id=1)])
    with pytest.raises(ValueError):
        salted_join(df, df, "k", spread_col="k")
    with pytest.raises(ValueError):
        salted_join(df, df, "k", spread_col=["k"])
    with pytest.raises(ValueError):
        salted_join(df, df, "k", spread_col="id", how="full")
    # key + discriminator is allowed — the combined hash varies
    assert salted_join(df, df, "k", spread_col=["k", "id"]).count() == 1


def test_hot_key_actually_spreads(spark):
    """The point of the operator: a hot key's left rows must land in
    many distinct salts (the review case — a 7-value spread column
    reached at most 6 of 32 salts)."""
    from hive_similarity_join_spark.operators.skew import _SALT  # noqa

    left = spark.createDataFrame(
        [Row(k=1, id=i) for i in range(400)]  # one pathological key
    )
    salted = left.withColumn(
        "_s", F.pmod(F.hash(F.col("k"), F.col("id")), F.lit(16))
    )
    assert salted.select("_s").distinct().count() == 16
