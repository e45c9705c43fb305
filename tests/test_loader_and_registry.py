"""Loader schema conformance + registry contract tests."""

from __future__ import annotations

from hive_similarity_join_spark.registry import ORACLES, QUERIES, load_registry
from hive_similarity_join_spark.sources.loader import SCHEMAS, TABLES, load_all, load_table
from tests.conftest import SF_SMOKE


def test_all_tables_load_with_declared_schema(spark):
    dfs = load_all(spark, SF_SMOKE)
    for name, df in dfs.items():
        declared = {f.name: f.dataType.simpleString() for f in SCHEMAS[name].fields}
        actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        assert actual == declared, f"{name}: {actual} != {declared}"


def test_events_ts_is_microsecond_timestamp(spark):
    e = load_table(spark, SF_SMOKE, "events")
    assert dict(e.dtypes)["ts"] == "timestamp"
    row = e.selectExpr("min(ts) AS lo", "max(ts) AS hi").collect()[0]
    assert row.lo.year == 2024 and row.hi.year == 2024


def test_registry_contract(spark):
    load_registry()
    assert len(QUERIES) >= 50
    # every oracle belongs to a registered query
    assert set(ORACLES) <= set(QUERIES)
    # spot-run one cheap key end-to-end through the registry
    df = QUERIES["q_agg_groupby"](spark, SF_SMOKE)
    cols = set(df.columns)
    assert {"l_returnflag", "l_linestatus", "sum_qty", "cnt"} <= cols


def test_priority_window_resolves():
    """Every PRIORITY name must be a registered key (a typo would
    silently shift the driver's 50-key CORRECTNESS window), the head
    must be duplicate-free, and it must fill the full 50-key window."""
    from hive_similarity_join_spark.registry import PRIORITY, ordered

    load_registry()
    assert set(PRIORITY) <= set(QUERIES), sorted(set(PRIORITY) - set(QUERIES))
    assert len(PRIORITY) == len(set(PRIORITY))
    assert len(PRIORITY) >= 50
    head = list(ordered(QUERIES))[: len(PRIORITY)]
    assert head == PRIORITY


def test_view_registration(spark):
    from hive_similarity_join_spark.sources.loader import register_views

    register_views(spark, SF_SMOKE)
    got = spark.sql("SELECT count(*) AS c FROM lineitem").collect()[0].c
    assert got == 6000
    assert set(TABLES) <= {t.name for t in spark.catalog.listTables()}


def test_events_loader_handles_both_ts_physical_types(spark, tmp_path):
    """The driver's testdata has shipped events.ts as TIMESTAMP(NANOS)
    (rounds 1-2) and TIMESTAMP(MICROS) (rounds 3-4); the loader keeps a
    leg for each. The MICROS leg is exercised by every events key on
    current testdata — this pins the NANOS leg so a flip back never
    lands on dead code."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hive_similarity_join_spark.sources.loader import load_table

    micros = [1_700_000_000_000_000, 1_700_000_123_456_789]
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([m * 1000 for m in micros], pa.timestamp("ns")),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["a", "b"], pa.string()),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }
    )
    pq.write_table(table, tmp_path / "events.parquet")
    df = load_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [
        r.micros
        for r in df.selectExpr("unix_micros(ts) AS micros")
        .orderBy("event_id")
        .collect()
    ]
    assert got == micros


def test_round14_correctness_window_composition():
    """The driver grades the FIRST 50 keys in queries() insertion
    order. Round-14 contract (the rotation precomputed at r13 end,
    valid verbatim because CORRECTNESS_r13 was 50/50 full green): the
    8 round-13 additions lead the window in their staged order (none
    has any driver verdict), then 42 oldest-latest-verdict keys
    backfill — the 8 r8-era keys that spilled from the r13 window
    (CORRECTNESS_r08 file order), then the first 34 r9-era keys in
    CORRECTNESS_r09 file order SKIPPING q_agg_weighted_median and
    q_events_cusum (re-verified r11, not oldest). Round-14 additions
    stay at 51+ (verdicts in the round-15 rotation). A PRIORITY edit
    that accidentally reorders the window fails here, loudly."""
    from hive_similarity_join_spark.registry import QUERIES, ordered

    load_registry()
    head = list(ordered(QUERIES))[:50]
    # Spot-pin the stage boundaries so an off-by-one is loud.
    assert head[0] == "q_unigram_nbest"
    assert head[7] == "q_pack_sequences_tokens"
    assert head[8] == "q_dedup_near"
    assert head[15] == "q_dedup_embedding"
    assert head[16] == "q_dedup_embedding_lsh"
    assert head[48] == "q_report_rfm"
    assert head[49] == "q_vec_pca_outliers"
    staged_r13 = {
        "q_unigram_nbest", "q_unigram_encode_sampled",
        "q_vec_knn_ivfadc_res", "q_dedup_ensemble_representatives",
        "q_vec_pq_distortion_res", "q_unigram_vocab_sweep",
        "q_bpe_rounds_sweep", "q_pack_sequences_tokens",
    }
    assert set(head[:8]) == staged_r13, set(head[:8]) ^ staged_r13
    backfill_r8_spill = {
        "q_dedup_near", "q_dedup_ngram", "q_dedup_minhash_lsh",
        "q_text_simhash", "q_dedup_connected", "q_dedup_connected_star",
        "q_dedup_representatives", "q_dedup_embedding",
    }
    assert set(head[8:16]) == backfill_r8_spill
    backfill_r9 = {
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
    }
    assert set(head[16:50]) == backfill_r9, set(head[16:50]) ^ backfill_r9
    # The two r11-reverified keys must NOT be in the window.
    assert "q_agg_weighted_median" not in head
    assert "q_events_cusum" not in head


def test_get_spark_applies_shuffle_conf_on_reused_session(spark):
    """getOrCreate() on a process with an existing session ignores
    builder configs; get_spark must still honor the caller's shuffle
    sizing via a runtime set (the r4/r5 driver-bench 2.5x on
    explicitly-repartitioned keys traced to exactly this silent
    conf drop)."""
    from hive_similarity_join_spark.session import get_spark

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        s = get_spark(shuffle_partitions=7)
        assert s is spark  # same JVM session reused
        assert s.conf.get("spark.sql.shuffle.partitions") == "7"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_get_spark_from_fresh_thread_respects_owner_conf(spark):
    """getActiveSession() is thread-local but getOrCreate() reuses the
    process-global session: a get_spark() call from a thread that never
    activated the session must still see it as pre-existing and leave
    the owner's shuffle sizing alone (ADVICE r6 — the old code clobbered
    it with the local default)."""
    import threading

    from hive_similarity_join_spark.session import get_spark

    old = spark.conf.get("spark.sql.shuffle.partitions")
    res = {}

    def worker():
        s = get_spark()  # no explicit request
        res["same"] = s is spark
        res["shuffle"] = s.conf.get("spark.sql.shuffle.partitions")

    try:
        spark.conf.set("spark.sql.shuffle.partitions", "77")
        t = threading.Thread(target=worker)
        t.start()
        t.join()
        assert res == {"same": True, "shuffle": "77"}, res
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_parallelism_ignores_session_shuffle_conf(spark):
    """Explicit candidate-join repartition counts must track hardware
    (sc.defaultParallelism), not the generic shuffle sizing knob — the
    root cause of the r4/r5 driver-bench gap (see
    operators/partitions.py)."""
    from hive_similarity_join_spark.operators.partitions import parallelism

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        assert parallelism(spark) == spark.sparkContext.defaultParallelism
        assert parallelism(spark) != 200
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
