"""Incremental ensemble-dedup mirror (streaming/incremental_ensemble)
— pinned BIT-equal to q_dedup_ensemble_representatives for any-order
epoch chains, a replayed epoch through the RAW merge, and a real
availableNow stream, like every continuous-aggregate mirror.

Also pins the monotonicity split the module docstring claims: the
SimHash-wide delta accumulation reproduces the full batch self-join
exactly (the pairwise predicate), which is what licenses carrying
that leg while recomputing the two ranking-dependent legs at emit.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.sources.loader import load_table
from hive_similarity_join_spark.streaming.incremental_ensemble import (
    ENSEMBLE_DOCS_SCHEMA,
    ENSEMBLE_PAIRS_SCHEMA,
    emit_ensemble_reps,
    ensemble_doc_partials,
    incremental_ensemble,
    merge_ensemble,
)
from tests.conftest import SF_SMOKE

REPO_TMP = Path(__file__).resolve().parent / "_incensemble_tmp"


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
        q_dedup_ensemble_representatives,
    )

    return _tuples(q_dedup_ensemble_representatives(spark, SF_SMOKE))


def test_simhash_delta_accumulation_matches_full_selfjoin(spark):
    """The monotone leg's license: accumulating new-vs-all deltas over
    id-hash epoch slices (any order) lands exactly the batch
    simhash_pairs_wide pair set — the wide-radius predicate is purely
    pairwise, so pair (a, b) materializes when the LATER of the two
    docs arrives, whatever the order."""
    from hive_similarity_join_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_pairs_wide,
        simhash_wide_delta_pairs,
    )

    d = _docs(spark)
    want = _tuples(simhash_pairs_wide(d, "doc_id", "text"))
    fps = simhash_fingerprints(d, "doc_id", "text")
    slices = [fps.filter(F.col("_id") % 3 == i) for i in range(3)]
    seen = None
    pairs = None
    for sl in [slices[1], slices[2], slices[0]]:
        seen = sl if seen is None else seen.unionByName(sl)
        delta = simhash_wide_delta_pairs(seen, sl)
        pairs = (
            delta
            if pairs is None
            else pairs.unionByName(delta).dropDuplicates(["id1", "id2"])
        )
    assert _tuples(pairs) == want


def test_ensemble_epoch_chain_equals_batch_key(spark):
    """Any epoch order reproduces the batch representatives artifact
    bit-identically, and a replayed epoch through the RAW merge (no
    versioned-carry protection) changes nothing: the doc carry is
    keyed idempotent rows, the pair carry is an idempotent set union,
    and emission recomputes the ranking-dependent legs from the full
    merged corpus."""
    d = _docs(spark)
    want = _want(spark)
    slices = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    docs_c, pairs_c = None, None
    for sl in [slices[2], slices[0], slices[1]]:
        docs_c, pairs_c = merge_ensemble(
            docs_c, pairs_c, ensemble_doc_partials(sl)
        )
    assert _tuples(emit_ensemble_reps(docs_c, pairs_c)) == want
    # replay an epoch through the raw merge — harmless
    docs_c, pairs_c = merge_ensemble(
        docs_c, pairs_c, ensemble_doc_partials(slices[0])
    )
    assert _tuples(emit_ensemble_reps(docs_c, pairs_c)) == want


def test_streaming_ensemble_matches_batch_key(spark, dirs):
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
    q = incremental_ensemble(
        stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(180)
    final_docs = sorted(Path(f"{dirs}/state/summary/docs").glob("epoch_*"))[-1]
    final_pairs = sorted(
        Path(f"{dirs}/state/summary/pairs").glob("epoch_*")
    )[-1]
    docs_c = spark.read.schema(ENSEMBLE_DOCS_SCHEMA).parquet(str(final_docs))
    pairs_c = spark.read.schema(ENSEMBLE_PAIRS_SCHEMA).parquet(
        str(final_pairs)
    )
    assert _tuples(emit_ensemble_reps(docs_c, pairs_c)) == _want(spark)
