"""Segment-filtered edit join ≡ brute-force levenshtein join."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.operators.editjoin import edit_distance_join
from hive_similarity_join_spark.sources.loader import load_table
from tests.conftest import SF_SMOKE


def _brute(spark, df, id_col, str_col, k):
    a = df.select(F.col(id_col).alias("id1"), F.col(str_col).alias("_a"))
    b = df.select(F.col(id_col).alias("id2"), F.col(str_col).alias("_b"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("dist", F.levenshtein("_a", "_b").cast("bigint"))
        .filter(F.col("dist") <= k)
        .select("id1", "id2", "dist")
    )


@pytest.mark.parametrize("k", [0, 1, 2])
def test_matches_brute_force_on_supplier_names(spark, k):
    sup = load_table(spark, SF_SMOKE, "supplier").select("s_suppkey", "s_name")
    got = sorted(
        map(tuple, edit_distance_join(sup, "s_suppkey", "s_name", k=k).collect())
    )
    want = sorted(map(tuple, _brute(spark, sup, "s_suppkey", "s_name", k).collect()))
    assert got == want


def test_matches_brute_force_on_random_strings(spark):
    rng = random.Random(42)
    alphabet = "abc"
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    for k in (1, 2):
        got = sorted(map(tuple, edit_distance_join(df, "id", "s", k=k).collect()))
        want = sorted(map(tuple, _brute(spark, df, "id", "s", k).collect()))
        assert got == want, f"k={k}"


def test_candidate_reduction_is_real(spark):
    """The filter must touch far fewer pairs than the cross product —
    the whole point of segment-based candidate generation."""
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_name")
    n = cust.count()
    pairs = edit_distance_join(cust, "c_custkey", "c_name", k=1)
    # result correctness vs brute force on a sample-sized table
    want = _brute(spark, cust, "c_custkey", "c_name", 1).count()
    assert pairs.count() == want
    assert want < n * (n - 1) / 2  # sanity: non-degenerate instance
