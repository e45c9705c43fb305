"""Hygiene-key properties (oracle exactness is covered by
tools/selfcheck.py; these pin the structural/semantic invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_similarity_join_spark.queries.hygiene_q import (
    _BOILER_MIN_DOCS,
    _CONTAM_FLAG_T,
)
from hive_similarity_join_spark.queries.search_q import _DECON_MOD
from hive_similarity_join_spark.registry import QUERIES, load_registry
from tests.conftest import SF_SMOKE

load_registry()


def test_pii_redact_leaves_no_digits(spark):
    out = QUERIES["q_pii_redact"](spark, SF_SMOKE)
    assert out.filter(F.col("name_redacted").rlike("[0-9]")).count() == 0
    # every customer name carries its numeric id -> audit count positive
    assert out.filter(F.col("n_digits") <= 0).count() == 0


def test_pii_redact_is_map_side_only(spark):
    plan = QUERIES["q_pii_redact"](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: scan -> project


def test_boilerplate_passages_all_cross_document(spark):
    rows = QUERIES["q_boilerplate_passages"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.n_docs >= _BOILER_MIN_DOCS
        assert len(r.passage.split(" ")) == 8


def test_contamination_report_covers_all_training_docs(spark):
    out = QUERIES["q_contamination_report"](spark, SF_SMOKE).collect()
    # one row per training doc long enough to shingle; no eval docs
    assert all(r.doc_id % _DECON_MOD != 0 for r in out)
    for r in out:
        assert 0 <= r.n_shared <= r.n_grams
        assert abs(r.contamination_frac - r.n_shared / r.n_grams) < 1e-15
        assert r.flagged == (1 if r.contamination_frac >= _CONTAM_FLAG_T else 0)
    # the binary screen is exactly the nonzero slice of the report
    flagged_any = {r.doc_id for r in out if r.n_shared > 0}
    screen = {
        r.doc_id
        for r in QUERIES["q_decontaminate"](spark, SF_SMOKE).collect()
    }
    assert flagged_any == screen


def test_hashed_decontaminate_matches_string_variant(spark):
    a = {
        (r.doc_id, r.n_shared_ngrams)
        for r in QUERIES["q_decontaminate"](spark, SF_SMOKE).collect()
    }
    b = {
        (r.doc_id, r.n_shared_ngrams)
        for r in QUERIES["q_decontaminate_hashed"](spark, SF_SMOKE).collect()
    }
    assert a == b  # 60-bit md5 prefixes are collision-free on this corpus


def test_decontaminate_hashed_broadcasts_eval_side(spark):
    plan = QUERIES["q_decontaminate_hashed"](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sample_temperature_flattens_mixture(spark):
    from hive_similarity_join_spark.sources.loader import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    before = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    out = QUERIES["q_sample_temperature"](spark, SF_SMOKE)
    rows = out.collect()
    after = {}
    rates = {}
    for r in rows:
        after[r.lang] = after.get(r.lang, 0) + 1
        rates[r.lang] = r.sample_rate
    # every language survives; rates in (0, 1]; the minority language
    # keeps rate exactly 1.0 and the dominant language is downsampled
    assert set(after) == set(before)
    n_min = min(before.values())
    for lang, rate in rates.items():
        assert 0 < rate <= 1.0
        assert abs(rate - (n_min / before[lang]) ** 0.5) < 1e-12
    dominant = max(before, key=lambda k: before[k])
    assert rates[dominant] < 0.8
    assert after[dominant] < before[dominant]
    # flatter: dominant/minority ratio strictly shrinks
    assert after[dominant] / min(after.values()) < before[dominant] / n_min
