"""Incremental streaming decontamination: the streamed clean+quarantine
split must equal the batch q_decontaminate verdicts on the same corpus."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.queries.search_q import _DECON_MOD, _DECON_N
from hive_similarity_join_spark.registry import QUERIES, load_registry
from hive_similarity_join_spark.sources.loader import load_table
from hive_similarity_join_spark.streaming.incremental_decontaminate import (
    eval_shingles,
    incremental_decontaminate,
    screen_batch,
)
from tests.conftest import SF_SMOKE

load_registry()

REPO_TMP = Path(__file__).resolve().parent / "_incdecon_tmp"


@pytest.fixture()
def dirs(spark):
    REPO_TMP.mkdir(exist_ok=True)
    d = tempfile.mkdtemp(dir=REPO_TMP)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _split(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    ev = docs.filter(F.col("doc_id") % _DECON_MOD == 0)
    train = docs.filter(F.col("doc_id") % _DECON_MOD != 0)
    return ev, train


def test_screen_batch_matches_batch_key(spark):
    ev, train = _split(spark)
    shingles = eval_shingles(ev, n=_DECON_N)
    clean, contaminated = screen_batch(train, shingles, n=_DECON_N)
    got = {
        r.doc_id: r.n_shared_ngrams
        for r in contaminated.select("doc_id", "n_shared_ngrams").collect()
    }
    want = {
        r.doc_id: r.n_shared_ngrams
        for r in QUERIES["q_decontaminate"](spark, SF_SMOKE).collect()
    }
    assert got == want
    clean_ids = {r.doc_id for r in clean.select("doc_id").collect()}
    assert clean_ids.isdisjoint(got)
    assert len(clean_ids) + len(got) == train.count()


def test_hashed_screen_matches_string_screen(spark):
    """hashed=True joins on 60-bit md5-prefix hashes (the 100 TB
    broadcast form, batch twin q_decontaminate_hashed) and must produce
    identical verdicts on this corpus."""
    ev, train = _split(spark)
    sh_str = eval_shingles(ev, n=_DECON_N)
    sh_h = eval_shingles(ev, n=_DECON_N, hashed=True)
    _, cont_str = screen_batch(train, sh_str, n=_DECON_N)
    _, cont_h = screen_batch(train, sh_h, n=_DECON_N, hashed=True)
    a = {
        (r.doc_id, r.n_shared_ngrams)
        for r in cont_str.select("doc_id", "n_shared_ngrams").collect()
    }
    b = {
        (r.doc_id, r.n_shared_ngrams)
        for r in cont_h.select("doc_id", "n_shared_ngrams").collect()
    }
    assert a == b
    # the hashed eval set broadcasts longs, not strings
    assert dict(sh_h.dtypes)["g"] == "bigint"


def test_streamed_split_equals_batch_split(spark, dirs):
    ev, train = _split(spark)
    shingles = eval_shingles(ev, n=_DECON_N)
    src = f"{dirs}/src"
    train.repartition(4).write.parquet(src)  # several files -> several batches
    stream = (
        spark.readStream.schema(train.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_decontaminate(
        stream,
        shingles,
        clean_dir=f"{dirs}/clean",
        quarantine_dir=f"{dirs}/quarantine",
        n=_DECON_N,
        checkpoint_dir=f"{dirs}/ckpt",
    )
    q.awaitTermination(300)
    got = {
        r.doc_id: r.n_shared_ngrams
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(f"{dirs}/quarantine")
        .collect()
    }
    want = {
        r.doc_id: r.n_shared_ngrams
        for r in QUERIES["q_decontaminate"](spark, SF_SMOKE).collect()
    }
    assert got == want
    clean_ids = {
        r.doc_id
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(f"{dirs}/clean")
        .select("doc_id")
        .collect()
    }
    assert clean_ids.isdisjoint(got)
    assert len(clean_ids) + len(got) == train.count()
