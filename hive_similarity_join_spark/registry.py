"""Query-key registry — the driver contract's backbone.

Each operator from SURVEY.md §2 registers here under its query key:
a builder ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
the equivalent ANSI SQL the DuckDB oracle runs on the same parquet
tables. ``__spark_entry__.py`` re-exports these dicts verbatim.

Alias discipline (SURVEY §7): every computed column is aliased
identically in the Spark builder and the oracle SQL — the driver's
compare sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder; ``oracle=None`` marks a genuinely
    non-SQL-expressible op (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        # A duplicate name would silently REPLACE the earlier key's
        # builder+oracle (dict assignment) and orphan its verdict
        # history — caught once in round 9 (a second q_agg_histogram);
        # fail loudly at import time instead. ValueError, not assert:
        # the guard must survive `python -O` (ADVICE r9).
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        # Registry consumers (driver/selfcheck/bench/tests go through
        # QUERIES[k]) get the pin-release wrapper: entering any builder
        # frees the PREVIOUS key's tracked persists, so a long-lived
        # session holds at most one key's pins (r8 VERDICT lifecycle
        # item). The RAW fn is returned so builder-to-builder calls
        # inside a module (e.g. cluster_sizes -> q_dedup_ngram) never
        # release their own caller's pins mid-build.
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            from hive_similarity_join_spark.operators.cache import release_pins

            release_pins()
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The external driver truncates CORRECTNESS checks to the FIRST 50 keys
# in queries() insertion order (observed round 1: exactly 50 rows). Keys
# listed here are emitted first so never-yet-checked keys get a driver
# verdict; rotate per round as coverage accumulates. Keys not listed
# follow in registration order.
PRIORITY: list[str] = [
    # ---- round-13 window (positions 1-50) ----
    # The precomputed rotation from the r12 checklist (CLAUDE.md +
    # VERDICT r12 item #1), valid verbatim because all 50 r12 window
    # keys landed green verdicts (CORRECTNESS_r12: 49 full + the
    # rows-only-by-design HLL key, 0 failures, 0 err — verified r13
    # start). Head: the 10 round-12 additions in their staged order —
    # none has ANY driver verdict.
    "q_unigram_lm_seed", "q_unigram_lm_em", "q_unigram_segment",
    "q_dedup_lsh_recall_sampled", "q_mixture_reweight",
    "q_mixture_reweight_apply", "q_unigram_encode_docs",
    "q_tokenizer_compare", "q_mixture_reweight_trace",
    "q_dedup_blocking_ensemble",
    # Backfill (40): oldest-latest-verdict keys, recomputed r13 start
    # from CORRECTNESS_r0{1..12}: the 48 r8-era keys in CORRECTNESS_r08
    # file order; the first 40 fit, the last 8 (q_dedup_near
    # q_dedup_ngram q_dedup_minhash_lsh q_text_simhash q_dedup_connected
    # q_dedup_connected_star q_dedup_representatives q_dedup_embedding)
    # spill to the r14 window.
    "q_vec_knn_ivf", "q_bpe_merges", "q_bpe_segment", "q_dedup_semantic",
    "q_agg_cms_topk", "q_decontaminate_bloom", "q_events_pattern",
    "q_bpe_encode_docs", "q_join_skew_salted", "q_vec_knn_pq",
    "q_vec_knn_ivfadc", "q_pipeline_llm_corpus", "q_merge_upsert",
    "q_dq_checks", "q_text_encode", "q_decontaminate", "q_search_bm25",
    "q_text_inverted_index", "q_docs_to_chunks", "q_corpus_profile",
    "q_minhash_estimate", "q_simjoin_dice", "q_simjoin_cosine",
    "q_simjoin_grouped", "q_simjoin_edit_scalable", "q_vec_l2",
    "q_vec_centroid", "q_text_langid", "q_text_quality",
    "q_text_tokencount", "q_text_fingerprint", "q_text_repetition",
    "q_unpivot", "q_split_train_val", "q_sample_mixture",
    "q_sample_stratified", "q_shuffle_export", "q_simjoin_jaccard_self",
    "q_simjoin_jaccard_rs", "q_dedup_exact",
    # ---- positions 51+ (round-14 head candidates) ----
    # Stage round-13 additions here as they land; rotate to head at r14
    # (then backfill with the next-oldest keys — the 8 spilled r8-era
    # keys above first, then the oldest r9-era keys in CORRECTNESS_r09
    # file order — recompute from CORRECTNESS_r0{1..13} at r14 start as
    # always).
    "q_unigram_nbest", "q_unigram_encode_sampled", "q_vec_knn_ivfadc_res",
    "q_dedup_ensemble_representatives", "q_vec_pq_distortion_res",
    "q_unigram_vocab_sweep", "q_bpe_rounds_sweep",
    "q_pack_sequences_tokens",
]


def ordered(mapping: dict[str, object]) -> dict:
    """Return a copy of ``mapping`` with PRIORITY keys first (in PRIORITY
    order), then the rest in original insertion order."""
    head = {k: mapping[k] for k in PRIORITY if k in mapping}
    return head | {k: v for k, v in mapping.items() if k not in head}


_loaded = False


def load_registry() -> None:
    """Import every query module exactly once (they self-register)."""
    global _loaded
    if _loaded:
        return
    import hive_similarity_join_spark.queries  # noqa: F401

    # A typo'd / renamed PRIORITY entry would otherwise silently shift
    # the driver's 50-key CORRECTNESS window (ordered() skips unknowns).
    stale = [k for k in PRIORITY if k not in QUERIES]
    assert not stale, f"PRIORITY names not in QUERIES: {stale}"
    dupes = [k for k in PRIORITY if PRIORITY.count(k) > 1]
    assert not dupes, f"duplicate PRIORITY entries: {sorted(set(dupes))}"

    _loaded = True
