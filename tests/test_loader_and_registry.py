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


def test_view_registration(spark):
    from hive_similarity_join_spark.sources.loader import register_views

    register_views(spark, SF_SMOKE)
    got = spark.sql("SELECT count(*) AS c FROM lineitem").collect()[0].c
    assert got == 6000
    assert set(TABLES) <= {t.name for t in spark.catalog.listTables()}
