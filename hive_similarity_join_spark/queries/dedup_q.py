"""MinHash-LSH and connected-components dedup query keys (EXT)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_similarity_join_spark.operators.dedup import (
    connected_components,
    connected_components_alternating,
    duck_minhash_oracle,
    minhash_lsh_pairs,
    simhash_pairs,
)
from hive_similarity_join_spark.operators.knn import ann_topk
from hive_similarity_join_spark.operators.similarity import similarity_join
from hive_similarity_join_spark.registry import query
from hive_similarity_join_spark.sources.loader import load_table

MINHASH_T = 0.8
CC_T = 0.9


@query("q_dedup_minhash_lsh", oracle=duck_minhash_oracle(MINHASH_T))
def q_dedup_minhash_lsh(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "doc_id", "text", threshold=MINHASH_T)


@query("q_text_simhash")  # md5-hex->int not expressible in DuckDB 1.0 SQL
def q_text_simhash(spark, sf_dir):
    """SimHash near-dup pairs (Hamming <= 3 over 60-bit fingerprints).
    Banded blocking is lossless for this radius (pigeonhole over 4
    bands); deterministic but rows-only checked — DuckDB 1.0 has no
    hex->int conversion to mirror the md5-derived token hashes."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, "doc_id", "text", max_hamming=3)


@query("q_vec_knn_ann")  # approximate by design -> rows-only
def q_vec_knn_ann(spark, sf_dir):
    """ANN top-k via random-hyperplane LSH + multi-probe + exact
    re-scoring — the scale path whose exact twin is q_vec_knn."""
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 10)
    return ann_topk(e, probes, k=5, n_planes=4)


@query("q_vec_knn_ivf")  # approximate by design -> rows-only
def q_vec_knn_ivf(spark, sf_dir):
    """IVF-Flat ANN: coarse k-means cells + nprobe-cell search + exact
    re-scoring (operators/ivf.py) — the inverted-list scale path; at
    100 TB the corpus is bucketed by cell id so a probe reads
    nprobe/n_cells of the data."""
    from hive_similarity_join_spark.operators.ivf import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 10)
    return ivf_topk(e, probes, k=5, n_cells=16, nprobe=4)


@query("q_dedup_embedding_lsh")  # approximate blocking -> rows-only
def q_dedup_embedding_lsh(spark, sf_dir):
    """Embedding near-dup pairs with hyperplane-LSH blocking — the
    100 TB twin of the exact all-pairs q_dedup_embedding: candidates
    only form inside a shared sign-bucket (expected bucket size
    |corpus| / 2^n_planes), then exact cosine verifies. Approximate by
    blocking (recall < 1), hence rows-only."""
    from hive_similarity_join_spark.functions import vectors as V
    from hive_similarity_join_spark.operators.knn import _hyperplanes, bucket_expr

    e = load_table(spark, sf_dir, "embeddings")
    planes = _hyperplanes(4)
    v = e.select(
        F.col("vec_id").alias("_id"), V.as_double("embedding").alias("_v")
    ).withColumn("_bkt", bucket_expr(F.col("_v"), planes))
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    a = v.select(
        F.col("_id").alias("id1"), F.col("_v").alias("_v1"), "_bkt"
    ).repartition(n_part, "_bkt")
    b = v.select(
        F.col("_id").alias("id2"), F.col("_v").alias("_v2"), F.col("_bkt").alias("_bkt2")
    )
    sim = V.cosine(F.col("_v1"), F.col("_v2"))
    return (
        a.join(b, (F.col("_bkt") == F.col("_bkt2")) & (F.col("id1") < F.col("id2")))
        .select("id1", "id2", sim.alias("sim"))
        .filter(F.col("sim") >= 0.3)
    )


@query("q_dedup_connected")  # iterative -> no single-statement oracle
def q_dedup_connected(spark, sf_dir):
    """Transitive-closure near-dup clustering: (doc_id, component id).
    Iterative min-label propagation — genuinely non-SQL-expressible in
    one statement, so rows-only checked; clustering correctness is
    pytest-verified on hand-built graphs (tests/test_dedup.py)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = similarity_join(docs, "doc_id", "text", threshold=CC_T)
    return connected_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component")
    )


@query("q_dedup_connected_star")  # iterative -> no single-statement oracle
def q_dedup_connected_star(spark, sf_dir):
    """Same clustering as q_dedup_connected, computed by alternating
    large-star/small-star contraction (Kiveris et al., SoCC 2014) —
    the O(log n)-round scale path whose round count is independent of
    graph diameter, vs min-label propagation's O(diameter). Registered
    on the SAME pair graph so the two algorithms are directly
    comparable in the bench; pytest asserts identical labelings
    (tests/test_dedup.py)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = similarity_join(docs, "doc_id", "text", threshold=CC_T)
    return connected_components_alternating(pairs).select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component")
    )
