"""ANN and SimHash operator tests: determinism, recall vs exact, and
blocking losslessness at the supported radius."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from hive_similarity_join_spark.operators.dedup import simhash_pairs
from hive_similarity_join_spark.operators.knn import ann_topk
from hive_similarity_join_spark.registry import QUERIES, load_registry
from tests.conftest import SF_SMOKE

load_registry()


def test_ann_recall_vs_exact(spark):
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    probes = e.filter(F.col("vec_id") < 10)
    ann = ann_topk(e, probes, k=5, n_planes=4)
    exact = QUERIES["q_vec_knn"](spark, SF_SMOKE)
    ann_set = {(r.probe_id, r.vec_id) for r in ann.collect()}
    exact_set = {(r.probe_id, r.vec_id) for r in exact.collect()}
    # near-orthogonal synthetic vectors are LSH-hostile; require
    # meaningful overlap, and full shape (5 results per probe)
    assert len(ann_set & exact_set) >= 0.25 * len(exact_set)
    counts = ann.groupBy("probe_id").count().collect()
    assert all(r["count"] == 5 for r in counts)


def test_ann_deterministic(spark):
    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    probes = e.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, ann_topk(e, probes, k=3).collect()))
    b = sorted(map(tuple, ann_topk(e, probes, k=3).collect()))
    assert a == b


def test_simhash_identical_docs_distance_zero(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, text="alpha beta gamma delta"),
            Row(id=2, text="delta gamma beta alpha"),  # same token set
            Row(id=3, text="completely different words entirely here"),
        ]
    )
    pairs = {(r.id1, r.id2): r.hamming for r in
             simhash_pairs(df, "id", "text", max_hamming=60).collect()}
    assert pairs.get((1, 2)) == 0


def test_simhash_blocking_lossless_within_radius(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(150)
    from hive_similarity_join_spark.operators.dedup import simhash_fingerprints

    fps = simhash_fingerprints(docs, "doc_id", "text")
    a = fps.select(F.col("_id").alias("id1"), F.col("_fp").alias("f1"))
    b = fps.select(F.col("_id").alias("id2"), F.col("_fp").alias("f2"))
    brute = (
        a.join(b, F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.bit_count(F.col("f1").bitwiseXOR(F.col("f2"))).cast("bigint").alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )
    banded = simhash_pairs(docs, "doc_id", "text", max_hamming=3)
    assert sorted(map(tuple, banded.collect())) == sorted(map(tuple, brute.collect()))


def test_sq8_recall_vs_exact(spark):
    """SQ8 two-stage ANN (q_vec_knn_quantized): int8 candidate gen +
    exact rerank must recover >=90% of the exact top-5 at smoke scale
    (measured: 1.0 at sf0.001 AND sf0.01 — int8 distortion is far
    below the candidate margin at C=50), with full per-probe shape."""
    quant = QUERIES["q_vec_knn_quantized"](spark, SF_SMOKE)
    exact = QUERIES["q_vec_knn"](spark, SF_SMOKE)
    q_set = {(r.probe_id, r.vec_id) for r in quant.collect()}
    e_set = {(r.probe_id, r.vec_id) for r in exact.collect()}
    assert len(q_set & e_set) >= 0.9 * len(e_set)
    counts = quant.groupBy("probe_id").count().collect()
    assert all(r["count"] == 5 for r in counts)
