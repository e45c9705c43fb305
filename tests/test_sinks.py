"""Source/sink round-trips: every format preserves rows + declared
schema; partitioned writes lay out Hive-style directories and prune."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.sources.loader import SCHEMAS, load_table
from hive_similarity_join_spark.sources.sinks import FORMATS, read_files, write_table
from tests.conftest import SF_SMOKE

REPO_TMP = Path(__file__).resolve().parent / "_sink_tmp"


@pytest.fixture()
def tmp_table_dir():
    REPO_TMP.mkdir(exist_ok=True)
    d = tempfile.mkdtemp(dir=REPO_TMP)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip_orders(spark, tmp_table_dir, fmt):
    o = load_table(spark, SF_SMOKE, "orders")
    # NTZ timestamps serialize tz-dependently in text formats; pin the
    # comparison to the loader's UTC session either way
    write_table(o, f"{tmp_table_dir}/orders_{fmt}", fmt=fmt)
    back = read_files(spark, f"{tmp_table_dir}/orders_{fmt}", fmt, SCHEMAS["orders"])
    assert back.schema == o.schema
    assert _rows(back) == _rows(o)


def test_roundtrip_nested_embeddings_parquet_json(spark, tmp_table_dir):
    e = load_table(spark, SF_SMOKE, "embeddings")
    for fmt in ("parquet", "json"):
        write_table(e, f"{tmp_table_dir}/emb_{fmt}", fmt=fmt)
        back = read_files(spark, f"{tmp_table_dir}/emb_{fmt}", fmt, SCHEMAS["embeddings"])
        assert back.schema == e.schema
        assert _rows(back.select("vec_id", "label")) == _rows(e.select("vec_id", "label"))


def test_csv_rejects_nested(spark, tmp_table_dir):
    e = load_table(spark, SF_SMOKE, "embeddings")
    with pytest.raises(ValueError, match="nested"):
        write_table(e, f"{tmp_table_dir}/emb_csv", fmt="csv")


def test_append_mode_is_insert_into(spark, tmp_table_dir):
    o = load_table(spark, SF_SMOKE, "orders")
    path = f"{tmp_table_dir}/orders_append"
    write_table(o, path, fmt="parquet")
    write_table(o, path, fmt="parquet", mode="append")
    back = read_files(spark, path, "parquet", SCHEMAS["orders"])
    assert back.count() == 2 * o.count()


def test_partitioned_write_prunes(spark, tmp_table_dir):
    o = load_table(spark, SF_SMOKE, "orders")
    path = f"{tmp_table_dir}/orders_part"
    write_table(o, path, fmt="parquet", partition_by=("o_orderstatus",))
    # Hive-style directory layout
    assert any(p.name.startswith("o_orderstatus=") for p in Path(path).iterdir())
    back = read_files(spark, path, "parquet", SCHEMAS["orders"])
    sel = back.filter(F.col("o_orderstatus") == "F")
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
    want = o.filter(F.col("o_orderstatus") == "F")
    assert sel.count() == want.count()
