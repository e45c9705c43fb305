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
    # ---- round-14 window (positions 1-50) ----
    # The precomputed rotation from the r13 checklist (CLAUDE.md +
    # VERDICT r13 item #1), valid verbatim because all 50 r13 window
    # keys landed FULL green verdicts (CORRECTNESS_r13: 50/50
    # rows+schema+hash, 0 failures, 0 err — verified r14 start).
    # Head: the 8 round-13 additions in their staged order — none has
    # ANY driver verdict (all 8 selfchecked bit-exact at r13).
    "q_unigram_nbest", "q_unigram_encode_sampled", "q_vec_knn_ivfadc_res",
    "q_dedup_ensemble_representatives", "q_vec_pq_distortion_res",
    "q_unigram_vocab_sweep", "q_bpe_rounds_sweep",
    "q_pack_sequences_tokens",
    # Backfill (42): oldest-latest-verdict keys, recomputed r14 start
    # from CORRECTNESS_r0{1..13}. First the 8 r8-era keys that spilled
    # from the r13 window (CORRECTNESS_r08 file order):
    "q_dedup_near", "q_dedup_ngram", "q_dedup_minhash_lsh",
    "q_text_simhash", "q_dedup_connected", "q_dedup_connected_star",
    "q_dedup_representatives", "q_dedup_embedding",
    # ...then the first 34 r9-era keys in CORRECTNESS_r09 file order,
    # SKIPPING q_agg_weighted_median and q_events_cusum (both
    # re-verified at r11 — not oldest; the recompute caught this, the
    # verbatim "first 34 of the r09 file" would not have — so the 34
    # extend two slots past the file's 34th entry, through
    # q_vec_pca_outliers). The remaining r9-era keys (q_agg_argmax
    # q_agg_collect q_array_funcs ...) spill to r15.
    "q_dedup_embedding_lsh", "q_vec_ann_recall", "q_dedup_substring",
    "q_graph_pagerank", "q_zorder_layout", "q_graph_triangles",
    "q_events_transitions", "q_agg_corr", "q_decontaminate_fuzzy",
    "q_vec_kmeans", "q_skyline_docs", "q_sample_reservoir",
    "q_dedup_incremental", "q_intervals_merge", "q_agg_mode",
    "q_text_entropy", "q_table_diff", "q_range_splits",
    "q_events_rollup", "q_report_concentration", "q_text_bigram_lm",
    "q_time_gapfill", "q_agg_mad", "q_text_collocations",
    "q_events_attribution", "q_docs_mutual_info", "q_vec_pca_power",
    "q_events_rolling", "q_market_basket", "q_events_seasonality",
    "q_events_paths", "q_text_hashing_trick", "q_report_rfm",
    "q_vec_pca_outliers",
    # ---- positions 51+ (round-15 head candidates) ----
    # Stage round-14 additions here as they land; rotate to head at r15
    # (then backfill with the next-oldest keys — the ~14 spilled r9-era
    # keys first in CORRECTNESS_r09 file order — recompute from
    # CORRECTNESS_r0{1..14} at r15 start as always).
    "q_unigram_oov", "q_unigram_prune", "q_bpe_oov", "q_zonemap_pruning",
    "q_vec_hard_negatives", "q_cdc_compact", "q_curriculum_order",
    "q_sample_coreset", "q_graph_communities", "q_dedup_cc_vs_lpa",
    "q_agg_equidepth_hist", "q_wordpiece_merges", "q_wordpiece_encode",
    "q_join_anti_nullaware", "q_wordpiece_encode_docs", "q_join_nullsafe",
    "q_split_leakage", "q_report_dedup_savings", "q_roundtrip_serde",
    "q_wordpiece_rounds_sweep", "q_agg_bitwise", "q_map_funcs",
    "q_join_bucketed", "q_agg_string_agg", "q_str_regexp_extract_all",
    "q_join_lateral", "q_agg_bool",
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
