"""Incremental dedup-savings mirror (streaming/incremental_savings) —
pinned BIT-equal to q_report_dedup_savings for any-order epoch chains,
a replayed epoch through the RAW merge, and a real availableNow
stream, like every continuous-aggregate mirror (VERDICT r14 #5)."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.sources.loader import load_table
from hive_similarity_join_spark.streaming.incremental_savings import (
    SAVINGS_DOCS_SCHEMA,
    emit_savings,
    incremental_savings,
    merge_savings,
    savings_doc_partials,
)
from tests.conftest import SF_SMOKE

REPO_TMP = Path(__file__).resolve().parent / "_incsavings_tmp"


@pytest.fixture()
def dirs(spark):
    REPO_TMP.mkdir(exist_ok=True)
    d = tempfile.mkdtemp(dir=REPO_TMP)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def _tuples(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def _want(spark):
    from hive_similarity_join_spark.queries.dedup_q import (
        q_report_dedup_savings,
    )

    return _tuples(q_report_dedup_savings(spark, SF_SMOKE))


def test_savings_epoch_chain_equals_batch_key(spark):
    """Any epoch order reproduces the batch price sheet bit-identically
    (per-source savings_frac doubles included — emission recomputes the
    LSH graph + CC labels from the full merged corpus, so the division
    sees identical operands), and a replayed epoch through the RAW
    merge changes nothing (keyed idempotent rows)."""
    d = _docs(spark)
    want = _want(spark)
    slices = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    carry = None
    for sl in [slices[2], slices[0], slices[1]]:
        carry = merge_savings(carry, savings_doc_partials(sl))
    assert _tuples(emit_savings(carry)) == want
    carry = merge_savings(carry, savings_doc_partials(slices[0]))
    assert _tuples(emit_savings(carry)) == want


def test_streaming_savings_matches_batch_key(spark, dirs):
    d = _docs(spark)
    src = f"{dirs}/src"
    for i in range(2):
        d.filter(F.col("doc_id") % 2 == i).coalesce(1).write.parquet(
            f"{src}/part={i}"
        )
    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part=*")
    )
    q = incremental_savings(
        stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(180)
    final = sorted(Path(f"{dirs}/state/summary/docs").glob("epoch_*"))[-1]
    carry = spark.read.schema(SAVINGS_DOCS_SCHEMA).parquet(str(final))
    assert _tuples(emit_savings(carry)) == _want(spark)
