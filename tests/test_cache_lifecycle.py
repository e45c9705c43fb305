"""Persist-lifecycle guard (r8 VERDICT "what's wrong" #1).

Builders persist shared subtrees the returned plan still references, so
they register them via operators/cache.pin instead of bare .persist();
the registry wrapper releases the previous key's pins on entry to the
next builder. A long-lived session running the whole suite must
therefore hold a BOUNDED number of cached relations at any moment —
previously it accumulated one per persisting key.
"""

from __future__ import annotations

from hive_similarity_join_spark.operators import cache
from hive_similarity_join_spark.registry import QUERIES, load_registry
from tests.conftest import SF_SMOKE

load_registry()

# Keys spanning every converted persist site family: CMS token counts
# (dedup_q), BPE word freqs (hygiene_q), corpus-clean survivors
# (pipeline_q), PCA centered relation (vectors_q), vocab-stats shared
# subtree (text_q), jaccard sorted-prefix relations (similarity.py).
_PERSISTING_KEYS = (
    "q_agg_cms_topk",
    "q_bpe_merges",
    "q_pipeline_corpus_clean",
    "q_vec_pca_power",
    "q_text_vocab_stats",
    "q_simjoin_jaccard_self",
)


def test_full_sequence_holds_bounded_cache(spark):
    """Running persisting keys back-to-back through the registry (the
    driver's access path) must not accumulate cached relations: after
    each builder entry the previous key's pins are gone, so the JVM
    cache never holds more than one key's worth (<= 4 relations)."""
    # Delta-based: earlier tests in a shared session legitimately leave
    # persistent RDDs behind (localCheckpoint blocks are not released by
    # clearCache), so assert what THIS sequence adds, not absolutes.
    cache.release_pins()
    baseline = spark.sparkContext._jsc.getPersistentRDDs().size()
    try:
        for key in _PERSISTING_KEYS:
            QUERIES[key](spark, SF_SMOKE).count()
            # pins of THIS key may be live (the returned plan used them),
            # bounded by the max per-builder pin count
            assert cache.pinned_count() <= 4, key
            n_rdds = spark.sparkContext._jsc.getPersistentRDDs().size()
            assert n_rdds - baseline <= 4, (
                f"{key}: {n_rdds - baseline} persistent RDDs accumulated"
            )
    finally:
        released = cache.release_pins()
    assert released <= 4


def test_release_pins_resets_tracking(spark):
    from pyspark.sql import functions as F

    df = spark.range(10).select(F.col("id"))
    cache.pin(df)
    assert cache.pinned_count() == 1
    assert cache.release_pins() == 1
    assert cache.pinned_count() == 0
