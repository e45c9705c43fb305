"""Unit tests for text/vector column expression libraries."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hive_similarity_join_spark.functions import text as TX
from hive_similarity_join_spark.functions import vectors as V


def test_bag_vs_set_tokens(spark):
    df = spark.createDataFrame([Row(text="b a b  c")])
    row = df.select(
        TX.bag_tokens("text").alias("bag"), TX.set_tokens("text").alias("st")
    ).collect()[0]
    assert row.bag == ["b", "a", "b", "c"]  # order + duplicates preserved
    assert sorted(row.st) == ["a", "b", "c"]


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame([Row(text="a b"), Row(text="a b c d")])
    out = df.select(TX.word_ngrams(TX.bag_tokens("text"), 3).alias("g")).collect()
    assert out[0].g == []
    assert out[1].g == ["a b c", "b c d"]


def test_lang_id_deterministic_tiebreak(spark):
    df = spark.createDataFrame([Row(text="join stream customer")])  # 1 hit each
    out = df.select(TX.lang_id(TX.set_tokens("text")).alias("l")).collect()[0].l
    assert out == "sqlish"  # first key wins ties


def test_quality_score_range(spark):
    df = spark.createDataFrame([Row(text="a b c d e f g"), Row(text="the the the")])
    scores = [r.q for r in
              df.select(TX.quality_score("text").alias("q")).collect()]
    assert all(0.0 <= s <= 1.0 for s in scores)
    assert scores[0] > scores[1]  # diverse text beats stopword spam


def test_fingerprint_invariances(spark):
    df = spark.createDataFrame(
        [Row(id=1, text="b a  c"), Row(id=2, text="c c b a"), Row(id=3, text="a b d")]
    )
    fps = {r.id: r.fp for r in
           df.select("id", TX.fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[2]  # order/dup/whitespace-insensitive
    assert fps[1] != fps[3]


def test_vector_math(spark):
    df = spark.createDataFrame([Row(a=[3.0, 4.0], b=[4.0, 3.0])])
    r = df.select(
        V.dot(F.col("a"), F.col("b")).alias("dot"),
        V.norm(F.col("a")).alias("na"),
        V.cosine(F.col("a"), F.col("b")).alias("cos"),
        V.l2(F.col("a"), F.col("b")).alias("l2"),
    ).collect()[0]
    assert r.dot == 24.0
    assert r.na == 5.0
    assert math.isclose(r.cos, 24.0 / 25.0)
    assert math.isclose(r.l2, math.sqrt(2.0))


def test_cosine_self_is_one(spark):
    df = spark.createDataFrame([Row(a=[1.0, 2.0, -3.0])])
    r = df.select(V.cosine(F.col("a"), F.col("a")).alias("c")).collect()[0]
    assert math.isclose(r.c, 1.0)
