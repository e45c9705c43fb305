"""PQ/ADC ANN: codebook-relation shape, encode invariants, recall vs
exact kNN, and the full-candidates degenerate case."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hive_similarity_join_spark.functions import vectors as V
from hive_similarity_join_spark.operators.pq import (
    PQ_K,
    PQ_M,
    adc_topk,
    codebook_relation,
    encode,
)
from hive_similarity_join_spark.sources.loader import load_table
from tests.conftest import SF_SMOKE

K = 5
N_PROBES = 20


def _exact_topk(e, probes):
    a = probes.select(
        F.col("vec_id").alias("probe_id"), V.as_double("embedding").alias("_p")
    )
    b = e.select(
        F.col("vec_id").alias("vec_id2"), V.as_double("embedding").alias("_v")
    )
    sim = V.cosine(F.col("_p"), F.col("_v"))
    scored = (
        F.broadcast(a)
        .join(b, F.col("probe_id") != F.col("vec_id2"))
        .select("probe_id", F.col("vec_id2").alias("vec_id"), sim.alias("sim"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= K
    )


def test_codebook_relation_shape_and_determinism(spark):
    e = load_table(spark, SF_SMOKE, "embeddings")
    cb = codebook_relation(e)
    rows = cb.collect()
    assert len(rows) == PQ_M * PQ_K
    per_m = {}
    for r in rows:
        per_m.setdefault(r.m, set()).add(r.c)
        assert len(r.sv) == V.DIM // PQ_M
    assert all(cs == set(range(PQ_K)) for cs in per_m.values())
    # deterministic across builds
    again = sorted((r.m, r.c, tuple(r.sv)) for r in codebook_relation(e).collect())
    assert again == sorted((r.m, r.c, tuple(r.sv)) for r in rows)


def test_encode_gives_every_vector_m_codes(spark):
    e = load_table(spark, SF_SMOKE, "embeddings")
    cb = codebook_relation(e)
    enc = encode(e, cb)
    assert enc.count() == e.count()
    bad = enc.filter(
        (F.size("cd") != PQ_M)
        | F.exists("cd", lambda c: (c < 0) | (c >= PQ_K))
    )
    assert bad.count() == 0


def test_adc_recall_vs_exact(spark):
    e = load_table(spark, SF_SMOKE, "embeddings")
    probes = e.filter(F.col("vec_id") < N_PROBES)
    approx = adc_topk(e, probes, k=K, n_candidates=20).collect()
    per_probe = {}
    for r in approx:
        per_probe.setdefault(r.probe_id, set()).add(r.vec_id)
    assert all(len(v) == K for v in per_probe.values())
    want = {}
    for r in _exact_topk(e, probes).collect():
        want.setdefault(r.probe_id, set()).add(r.vec_id)
    hits = sum(len(per_probe[p] & want[p]) for p in want)
    recall = hits / (len(want) * K)
    # 8x16 codebooks + rerank-20 on near-orthogonal synthetic vectors:
    # well above chance (chance ~ K/corpus = 1%); exactness is the
    # brute-force twin's job
    assert recall >= 0.3, recall


def test_full_candidates_equals_exact(spark):
    """With n_candidates = corpus size the ADC stage only orders the
    rerank input — the exact cosine top-k must come out identically."""
    e = load_table(spark, SF_SMOKE, "embeddings").limit(200)
    probes = e.filter(F.col("vec_id") < 5)
    approx = adc_topk(e, probes, k=K, n_candidates=200)
    exact = _exact_topk(e, probes)
    assert sorted(
        map(tuple, approx.select("probe_id", "vec_id").collect())
    ) == sorted(map(tuple, exact.select("probe_id", "vec_id").collect()))
