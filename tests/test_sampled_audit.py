"""Sampled-denominator recall audit (q_dedup_lsh_recall_sampled).

VERDICT r11 item 4: at 100 TB the full exact pair graph is a
cluster-day job, so the audit family needs a sampled mode. These tests
pin the two invariants the key's docstring claims:

1. The sampled exact generator is EXACTLY the restriction of the full
   exact pair graph to sampled endpoints (Jaccard of a pair does not
   depend on which other docs are in the corpus), so the sampled
   denominator is the true |exact ∩ S×S| — not an approximation of it.
2. The sampled recall tracks the full recall (ratio estimator): the
   measured gap at smoke scale stays inside a loose tolerance, so a
   regression that breaks the estimator (e.g. sampling only one join
   side) fails loudly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_similarity_join_spark.queries.dedup_q import (
    MINHASH_T,
    _sampled_docs_pred,
    q_dedup_lsh_recall,
    q_dedup_lsh_recall_sampled,
)
from hive_similarity_join_spark.operators.similarity import similarity_join
from hive_similarity_join_spark.sources.loader import load_table
from tests.conftest import SF_SMOKE


def test_sampled_exact_pairs_are_restriction_of_full(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    sampled_ids = docs.filter(_sampled_docs_pred()).select("doc_id")
    full = similarity_join(
        docs, "doc_id", "text", threshold=MINHASH_T, measure="jaccard"
    ).select("id1", "id2")
    restricted = full.join(
        sampled_ids.withColumnRenamed("doc_id", "id1"), "id1", "semi"
    ).join(sampled_ids.withColumnRenamed("doc_id", "id2"), "id2", "semi")
    sampled = similarity_join(
        docs.filter(_sampled_docs_pred()),
        "doc_id",
        "text",
        threshold=MINHASH_T,
        measure="jaccard",
    ).select("id1", "id2")
    only_sampled = sampled.exceptAll(restricted.select("id1", "id2")).count()
    only_full = restricted.select("id1", "id2").exceptAll(sampled).count()
    assert only_sampled == 0 and only_full == 0


def test_sampled_recall_tracks_full(spark):
    s = q_dedup_lsh_recall_sampled(spark, SF_SMOKE).collect()[0]
    f = q_dedup_lsh_recall(spark, SF_SMOKE).collect()[0]
    assert s["n_docs_sampled"] > 0
    assert 0 < s["n_docs_sampled"] < s["n_docs"]
    # dup-dense corpus: the sample must still contain true pairs, or the
    # audit degenerates (0/0) — guards a future corpus/sample-rate change
    assert s["n_exact_sampled"] > 0
    # LSH verifies candidates at exact Jaccard -> precision 1.0 exactly
    assert s["precision_sampled"] == 1.0
    # measured at sf0.001: sampled 0.735 vs full 0.793; at sf0.01:
    # 0.787 vs 0.790 — the tolerance is deliberately loose (smoke-scale
    # samples are small) but far tighter than what a broken estimator
    # produces (one-sided sampling collapses recall toward 0)
    assert abs(s["recall_sampled"] - f["recall"]) < 0.1
