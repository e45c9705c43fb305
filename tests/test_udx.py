"""UDTF/UDAF surface: SQL registration, lateral join, semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.functions.udx import register_udx
from hive_similarity_join_spark.operators.similarity import tokenize
from hive_similarity_join_spark.sources.loader import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_udx(spark)


def test_udtf_direct_call(spark):
    rows = spark.sql(
        "SELECT * FROM tokenize_rows('The quick the FOX fox jumps')"
    ).collect()
    assert [(r.pos, r.token) for r in rows] == [
        (0, "the"),
        (1, "quick"),
        (3, "fox"),
        (5, "jumps"),
    ]


def test_udtf_lateral_matches_kernel_tokenizer(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    docs.createOrReplaceTempView("_udtf_docs")
    got = spark.sql(
        """
        SELECT d.doc_id, t.token
        FROM _udtf_docs d, LATERAL tokenize_rows(d.text) t
        """
    )
    want = docs.select(
        "doc_id", F.explode(tokenize("text")).alias("token")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_harmonic_mean_semantics(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 4.0), ("a", 4.0), ("b", 2.0), ("b", None), ("b", -5.0)],
        "k string, v double",
    )
    got = {
        r.k: r.hm
        for r in df.groupBy("k").agg(F.expr("harmonic_mean(v)").alias("hm")).collect()
    }
    # a: 3 / (1 + 0.25 + 0.25) = 2.0 ; b: only the single positive value
    assert got["a"] == pytest.approx(2.0)
    assert got["b"] == pytest.approx(2.0)


def test_harmonic_mean_in_sql_over_events(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    ev.createOrReplaceTempView("_udx_events")
    got = spark.sql(
        """
        SELECT event_type, harmonic_mean(value) AS hm
        FROM _udx_events WHERE value > 0 GROUP BY event_type
        """
    )
    rows = got.collect()
    assert len(rows) > 0 and all(r.hm is None or r.hm > 0 for r in rows)
