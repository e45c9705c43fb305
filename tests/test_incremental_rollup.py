"""Incremental continuous aggregates: the merged multi-epoch carry
must reproduce the batch keys' output BIT-identically (exact decimal
partials), in ANY epoch order — rollup and gapfill partials are
decomposable, unlike the ordered-arrival CUSUM carry."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.queries.events_q import (
    q_events_rollup,
    q_time_gapfill,
)
from hive_similarity_join_spark.sources.loader import load_table
from hive_similarity_join_spark.streaming.incremental_rollup import (
    GAPFILL_CARRY_SCHEMA,
    ROLLUP_CARRY_SCHEMA,
    emit_gapfill,
    emit_rollup,
    gapfill_partials,
    incremental_rollup,
    merge_partials,
    rollup_partials,
)
from tests.conftest import SF_SMOKE

REPO_TMP = Path(__file__).resolve().parent / "_incrollup_tmp"


@pytest.fixture()
def dirs(spark):
    REPO_TMP.mkdir(exist_ok=True)
    d = tempfile.mkdtemp(dir=REPO_TMP)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events(spark):
    return load_table(spark, SF_SMOKE, "events")


def _tuples(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def _epoch_slices(e, n=3):
    # id-hash slicing, deliberately NOT time-ordered: decomposable
    # partials must merge exactly in any arrival order
    return [e.filter(F.col("event_id") % n == i) for i in range(n)]


def test_rollup_epoch_chain_equals_batch_key(spark):
    e = _events(spark)
    carry = None
    for sl in _epoch_slices(e):
        assert sl.count()
        carry = merge_partials(
            carry, rollup_partials(sl), ["event_type", "y", "m", "d"],
            ["cnt", "psum"],
        )
    got = emit_rollup(carry)
    want = q_events_rollup(spark, SF_SMOKE)
    assert _tuples(got) == _tuples(want)


def test_gapfill_epoch_chain_equals_batch_key(spark):
    e = _events(spark)
    carry = None
    for sl in _epoch_slices(e):
        carry = merge_partials(
            carry, gapfill_partials(sl), ["event_type", "slot"],
            ["cnt", "slot_sum"],
        )
    got = emit_gapfill(carry)
    want = q_time_gapfill(spark, SF_SMOKE)
    assert _tuples(got) == _tuples(want)


def test_streaming_rollup_matches_batch_key(spark, dirs):
    """End-to-end foreachBatch + versioned carry: files arrive one per
    micro-batch (arbitrary order is fine here); the final summary
    snapshot, passed through emit_rollup, equals the batch key."""
    src = f"{dirs}/src"
    e = _events(spark).select("event_type", "ts", "value")
    for i, sl in enumerate(_epoch_slices(e, 2)):
        sl.coalesce(1).write.parquet(f"{src}/part={i}")
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part=*")
    )
    q = incremental_rollup(stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt")
    q.awaitTermination(120)
    final = sorted(Path(f"{dirs}/state/summary").glob("epoch_*"))[-1]
    carry = spark.read.schema(ROLLUP_CARRY_SCHEMA).parquet(str(final))
    assert _tuples(emit_rollup(carry)) == _tuples(
        q_events_rollup(spark, SF_SMOKE)
    )


def test_streaming_gapfill_matches_batch_key(spark, dirs):
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        incremental_gapfill,
    )

    src = f"{dirs}/src"
    e = _events(spark).select("event_type", "ts", "value")
    for i, sl in enumerate(_epoch_slices(e, 2)):
        sl.coalesce(1).write.parquet(f"{src}/part={i}")
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part=*")
    )
    q = incremental_gapfill(stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt")
    q.awaitTermination(120)
    final = sorted(Path(f"{dirs}/state/summary").glob("epoch_*"))[-1]
    carry = spark.read.schema(GAPFILL_CARRY_SCHEMA).parquet(str(final))
    assert _tuples(emit_gapfill(carry)) == _tuples(
        q_time_gapfill(spark, SF_SMOKE)
    )


def test_ohlc_epoch_chain_equals_batch_key(spark):
    from hive_similarity_join_spark.queries.events_q import q_time_ohlc
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        emit_ohlc,
        merge_ohlc,
        ohlc_partials,
    )

    e = _events(spark)
    carry = None
    for sl in _epoch_slices(e):
        carry = merge_ohlc(carry, ohlc_partials(sl))
    got = emit_ohlc(carry)
    want = q_time_ohlc(spark, SF_SMOKE)
    assert _tuples(got) == _tuples(want)


def test_streaming_ohlc_matches_batch_key(spark, dirs):
    from hive_similarity_join_spark.queries.events_q import q_time_ohlc
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        OHLC_CARRY_SCHEMA,
        emit_ohlc,
        incremental_ohlc,
    )

    src = f"{dirs}/src"
    e = _events(spark).select("event_type", "event_id", "ts", "value")
    for i, sl in enumerate(_epoch_slices(e, 2)):
        sl.coalesce(1).write.parquet(f"{src}/part={i}")
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part=*")
    )
    q = incremental_ohlc(stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt")
    q.awaitTermination(120)
    final = sorted(Path(f"{dirs}/state/summary").glob("epoch_*"))[-1]
    carry = spark.read.schema(OHLC_CARRY_SCHEMA).parquet(str(final))
    assert _tuples(emit_ohlc(carry)) == _tuples(q_time_ohlc(spark, SF_SMOKE))


def test_dau_epoch_chain_equals_batch_key(spark):
    from hive_similarity_join_spark.queries.events_q import q_events_dau_wau
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        dau_partials,
        emit_dau_wau,
        merge_dau,
    )

    e = _events(spark)
    carry = None
    for sl in _epoch_slices(e):
        carry = merge_dau(carry, dau_partials(sl))
    # replay an epoch: idempotent set union must not change the result
    carry = merge_dau(carry, dau_partials(_epoch_slices(e)[0]))
    assert _tuples(emit_dau_wau(carry)) == _tuples(
        q_events_dau_wau(spark, SF_SMOKE)
    )


def test_streaming_dau_matches_batch_key(spark, dirs):
    from hive_similarity_join_spark.queries.events_q import q_events_dau_wau
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        DAU_CARRY_SCHEMA,
        emit_dau_wau,
        incremental_dau_wau,
    )

    src = f"{dirs}/src"
    e = _events(spark).select("user_id", "ts")
    for i, sl in enumerate(_epoch_slices(e, 2)):
        sl.coalesce(1).write.parquet(f"{src}/part={i}")
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part=*")
    )
    q = incremental_dau_wau(
        stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(120)
    final = sorted(Path(f"{dirs}/state/summary").glob("epoch_*"))[-1]
    carry = spark.read.schema(DAU_CARRY_SCHEMA).parquet(str(final))
    assert _tuples(emit_dau_wau(carry)) == _tuples(
        q_events_dau_wau(spark, SF_SMOKE)
    )


def test_retention_epoch_chain_equals_batch_key(spark):
    from hive_similarity_join_spark.queries.events_q import q_events_retention
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        emit_retention,
        merge_retention,
        retention_partials,
    )

    e = _events(spark)
    carry = None
    # reversed slices: late-arriving earlier weeks must RE-COHORT users
    # (min-week moves), which the derived-view emission handles and a
    # summable cohort partial could not
    for sl in reversed(_epoch_slices(e)):
        carry = merge_retention(carry, retention_partials(sl))
    # replay an epoch: idempotent set union must not change the result
    carry = merge_retention(carry, retention_partials(_epoch_slices(e)[1]))
    assert _tuples(emit_retention(carry)) == _tuples(
        q_events_retention(spark, SF_SMOKE)
    )


def test_streaming_retention_matches_batch_key(spark, dirs):
    from hive_similarity_join_spark.queries.events_q import q_events_retention
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        RETENTION_CARRY_SCHEMA,
        emit_retention,
        incremental_retention,
    )

    src = f"{dirs}/src"
    e = _events(spark).select("user_id", "ts")
    for i, sl in enumerate(_epoch_slices(e, 2)):
        sl.coalesce(1).write.parquet(f"{src}/part={i}")
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part=*")
    )
    q = incremental_retention(
        stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(120)
    final = sorted(Path(f"{dirs}/state/summary").glob("epoch_*"))[-1]
    carry = spark.read.schema(RETENTION_CARRY_SCHEMA).parquet(str(final))
    assert _tuples(emit_retention(carry)) == _tuples(
        q_events_retention(spark, SF_SMOKE)
    )


def test_hist_epoch_chain_equals_batch_key(spark):
    from hive_similarity_join_spark.queries.relational_q import (
        q_agg_value_histogram,
    )
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        emit_hist,
        hist_partials,
        merge_hist,
    )

    e = _events(spark)
    carry = None
    for sl in reversed(_epoch_slices(e)):
        carry = merge_hist(carry, hist_partials(sl))
    assert _tuples(emit_hist(carry)) == _tuples(
        q_agg_value_histogram(spark, SF_SMOKE)
    )


def test_streaming_hist_matches_batch_key(spark, dirs):
    from hive_similarity_join_spark.queries.relational_q import (
        q_agg_value_histogram,
    )
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        HIST_CARRY_SCHEMA,
        emit_hist,
        incremental_hist,
    )

    src = f"{dirs}/src"
    e = _events(spark).select("event_type", "value")
    for i, sl in enumerate(_epoch_slices(e, 2)):
        sl.coalesce(1).write.parquet(f"{src}/part={i}")
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part=*")
    )
    q = incremental_hist(
        stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(120)
    final = sorted(Path(f"{dirs}/state/summary").glob("epoch_*"))[-1]
    carry = spark.read.schema(HIST_CARRY_SCHEMA).parquet(str(final))
    assert _tuples(emit_hist(carry)) == _tuples(
        q_agg_value_histogram(spark, SF_SMOKE)
    )


def test_qsketch_epoch_chain_equals_single_shot(spark):
    """Bottom-K-by-hash is associative, commutative, idempotent: any
    epoch order + a replayed epoch must yield the single-shot sample
    and estimates bit-identically."""
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        emit_qsketch,
        merge_qsketch,
        qsketch_partials,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    slices = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    carry = None
    for sl in reversed(slices):
        carry = merge_qsketch(carry, qsketch_partials(sl))
    carry = merge_qsketch(carry, qsketch_partials(slices[1]))  # replay
    want_carry = qsketch_partials(d)
    assert _tuples(carry) == _tuples(want_carry)
    assert _tuples(emit_qsketch(carry)) == _tuples(emit_qsketch(want_carry))


def test_qsketch_estimates_match_audit_key_legs(spark):
    """The mirror's estimates must equal the q_agg_quantile_sketch
    audit key's *_est columns — one sample definition, two surfaces."""
    from hive_similarity_join_spark.queries.text_q import (
        q_agg_quantile_sketch,
    )
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        emit_qsketch,
        qsketch_partials,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    est = emit_qsketch(qsketch_partials(d)).collect()[0]
    audit = q_agg_quantile_sketch(spark, SF_SMOKE).collect()[0]
    assert est.k_sample == audit.k_sample
    assert est.p50_est == audit.p50_est
    assert est.p90_est == audit.p90_est
    assert est.p99_est == audit.p99_est


def test_streaming_qsketch_matches_single_shot(spark, dirs):
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        QSKETCH_CARRY_SCHEMA,
        emit_qsketch,
        incremental_qsketch,
        qsketch_partials,
    )

    d = load_table(spark, SF_SMOKE, "documents").select("doc_id", "n_chars")
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
    q = incremental_qsketch(
        stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(120)
    final = sorted(Path(f"{dirs}/state/summary").glob("epoch_*"))[-1]
    carry = spark.read.schema(QSKETCH_CARRY_SCHEMA).parquet(str(final))
    assert _tuples(emit_qsketch(carry)) == _tuples(
        emit_qsketch(qsketch_partials(load_table(spark, SF_SMOKE, "documents")))
    )


def test_gopher_epoch_chain_equals_batch_key(spark):
    """Any epoch order + a replayed epoch must reproduce the batch
    q_text_gopher_rules report bit-identically — the per-doc metrics
    are pure functions of each document, so the keyed carry merge is
    associative, commutative, AND idempotent."""
    from hive_similarity_join_spark.queries.hygiene_q import (
        q_text_gopher_rules,
    )
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        emit_gopher,
        gopher_partials,
        merge_gopher,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    slices = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    carry = None
    for sl in reversed(slices):
        carry = merge_gopher(carry, gopher_partials(sl))
    carry = merge_gopher(carry, gopher_partials(slices[1]))  # replay
    assert _tuples(emit_gopher(carry)) == _tuples(
        q_text_gopher_rules(spark, SF_SMOKE)
    )


def test_streaming_gopher_matches_batch_key(spark, dirs):
    from hive_similarity_join_spark.queries.hygiene_q import (
        q_text_gopher_rules,
    )
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        GOPHER_CARRY_SCHEMA,
        emit_gopher,
        incremental_gopher,
    )

    d = load_table(spark, SF_SMOKE, "documents")
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
    q = incremental_gopher(
        stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(120)
    final = sorted(Path(f"{dirs}/state/summary").glob("epoch_*"))[-1]
    carry = spark.read.schema(GOPHER_CARRY_SCHEMA).parquet(str(final))
    assert _tuples(emit_gopher(carry)) == _tuples(
        q_text_gopher_rules(spark, SF_SMOKE)
    )


def test_mad_epoch_chain_equals_batch_key(spark):
    """Any-order merged cents-histogram carry must reproduce the batch
    q_events_anomaly_mad report bit-identically — the histogram counts
    are summable partials; epoch RETRIES are the versioned-carry
    contract's job (read below_epoch), as with rollup/gapfill/ohlc."""
    from hive_similarity_join_spark.queries.events_q import (
        q_events_anomaly_mad,
    )
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        emit_mad,
        mad_partials,
        merge_mad,
    )

    e = _events(spark)
    # mad_partials' cents bucketing is lossless ONLY under the corpus
    # 2-decimal contract — assert the round-trip here so a regenerated
    # corpus with more precision fails this test loudly instead of
    # silently drifting from the batch key (ADVICE r11; schema_dump
    # checks the same contract at round start).
    n_bad = (
        e.select(
            (
                F.floor(F.col("value") * 100 + F.lit(0.5)) / 100.0
                != F.col("value")
            ).alias("bad")
        )
        .filter("bad")
        .count()
    )
    assert n_bad == 0, "events.value is not cents-exact — mad mirror void"
    carry = None
    for sl in reversed(_epoch_slices(e)):
        carry = merge_mad(carry, mad_partials(sl))
    assert _tuples(emit_mad(carry)) == _tuples(
        q_events_anomaly_mad(spark, SF_SMOKE)
    )


def test_streaming_mad_matches_batch_key(spark, dirs):
    from hive_similarity_join_spark.queries.events_q import (
        q_events_anomaly_mad,
    )
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        MAD_CARRY_SCHEMA,
        emit_mad,
        incremental_mad,
    )

    e = _events(spark)
    src = f"{dirs}/src"
    for i in range(2):
        e.filter(F.col("event_id") % 2 == i).coalesce(1).write.parquet(
            f"{src}/part={i}"
        )
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part=*")
    )
    q = incremental_mad(
        stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(120)
    final = sorted(Path(f"{dirs}/state/summary").glob("epoch_*"))[-1]
    carry = spark.read.schema(MAD_CARRY_SCHEMA).parquet(str(final))
    assert _tuples(emit_mad(carry)) == _tuples(
        q_events_anomaly_mad(spark, SF_SMOKE)
    )


def test_sessions_merge_any_order_and_replay_idempotent(spark):
    """The session carry's single-linkage merge is associative,
    commutative, AND idempotent: any epoch order reproduces the batch
    q_join_interval_overlap histogram bit-identically, and a replayed
    epoch through the RAW merge (no versioned-carry protection)
    changes nothing — the third carry algebra in the mirror family
    after summable counts and keyed idempotent rows."""
    from hive_similarity_join_spark.queries.pipeline_q import (
        q_join_interval_overlap,
    )
    from hive_similarity_join_spark.streaming.incremental_sessions import (
        emit_sessions,
        merge_sessions,
        session_partials,
    )

    e = _events(spark)
    want = _tuples(q_join_interval_overlap(spark, SF_SMOKE))
    slices = _epoch_slices(e)
    carry = None
    for sl in [slices[2], slices[0], slices[1]]:
        carry = merge_sessions(carry, session_partials(sl))
    assert _tuples(emit_sessions(carry)) == want
    carry = merge_sessions(carry, session_partials(slices[0]))  # replay
    assert _tuples(emit_sessions(carry)) == want


def test_sessions_merge_bridges_cross_epoch_chains(spark):
    """A chain 0 / 29min / 58min split across three epochs must fuse
    into ONE session: the middle point bridges two islands that were
    disjoint in their own epochs (gap 58min >= 30min) — the reducible-
    clustering property the docstring claims, pinned on a literal."""
    from hive_similarity_join_spark.streaming.incremental_sessions import (
        emit_sessions,
        merge_sessions,
        session_partials,
    )

    MIN = 60 * 1_000_000
    rows = [(0, 1), (29 * MIN, 2), (58 * MIN, 3)]
    dfs = [
        spark.createDataFrame(
            [(7, t)], "user_id bigint, us bigint"
        ).select("user_id", F.timestamp_micros("us").alias("ts"))
        for t, _ in rows
    ]
    carry = None
    for d in [dfs[0], dfs[2], dfs[1]]:  # ends first, bridge last
        carry = merge_sessions(carry, session_partials(d))
    got = [(r.user_id, r.s, r.e) for r in carry.collect()]
    assert got == [(7, 0, 58 * MIN)]
    hist = _tuples(emit_sessions(carry))
    assert hist == [("0", "1")]  # one session, zero concurrency


def test_streaming_sessions_matches_batch_key(spark, dirs):
    from hive_similarity_join_spark.queries.pipeline_q import (
        q_join_interval_overlap,
    )
    from hive_similarity_join_spark.streaming.incremental_sessions import (
        SESSIONS_CARRY_SCHEMA,
        emit_sessions,
        incremental_sessions,
    )

    e = _events(spark)
    src = f"{dirs}/src"
    for i in range(2):
        e.filter(F.col("event_id") % 2 == i).coalesce(1).write.parquet(
            f"{src}/part={i}"
        )
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part=*")
    )
    q = incremental_sessions(
        stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(120)
    final = sorted(Path(f"{dirs}/state/summary").glob("epoch_*"))[-1]
    carry = spark.read.schema(SESSIONS_CARRY_SCHEMA).parquet(str(final))
    assert _tuples(emit_sessions(carry)) == _tuples(
        q_join_interval_overlap(spark, SF_SMOKE)
    )


def test_mixture_epoch_chain_equals_batch_key(spark):
    """Any epoch order must reproduce the batch q_mixture_drift report
    bit-identically — (source, lang) cell counts are decomposable, and
    marginals/total re-derive from the merged cells at emit time."""
    from hive_similarity_join_spark.queries.hygiene_q import q_mixture_drift
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        emit_mixture,
        merge_mixture,
        mixture_partials,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    slices = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    carry = None
    for sl in reversed(slices):
        carry = merge_mixture(carry, mixture_partials(sl))
    assert _tuples(emit_mixture(carry)) == _tuples(
        q_mixture_drift(spark, SF_SMOKE)
    )


def test_streaming_mixture_matches_batch_key(spark, dirs):
    from hive_similarity_join_spark.queries.hygiene_q import q_mixture_drift
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        MIXTURE_CARRY_SCHEMA,
        emit_mixture,
        incremental_mixture,
    )

    d = load_table(spark, SF_SMOKE, "documents")
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
    q = incremental_mixture(
        stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(120)
    final = sorted(Path(f"{dirs}/state/summary").glob("epoch_*"))[-1]
    carry = spark.read.schema(MIXTURE_CARRY_SCHEMA).parquet(str(final))
    assert _tuples(emit_mixture(carry)) == _tuples(
        q_mixture_drift(spark, SF_SMOKE)
    )


def test_reweight_epoch_chain_equals_batch_key(spark):
    """Any epoch order + a replayed slice's partials must reproduce the
    batch q_mixture_reweight output bit-identically. The loss proxy is
    NOT decomposable per domain (a later reference doc can flip an
    earlier held-out bigram from OOV to in-vocab), so the carry stores
    per-type counts and the emit re-derives the loss — this test's
    out-of-order slices exercise exactly that retraction."""
    from hive_similarity_join_spark.queries.hygiene_q import (
        q_mixture_reweight,
    )
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        emit_reweight,
        merge_reweight,
        reweight_partials,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    slices = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    carry = None
    for sl in reversed(slices):
        carry = merge_reweight(carry, reweight_partials(sl))
    assert _tuples(emit_reweight(carry)) == _tuples(
        q_mixture_reweight(spark, SF_SMOKE)
    )


def test_streaming_reweight_matches_batch_key(spark, dirs):
    from hive_similarity_join_spark.queries.hygiene_q import (
        q_mixture_reweight,
    )
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        REWEIGHT_CARRY_SCHEMA,
        emit_reweight,
        incremental_reweight,
    )

    d = load_table(spark, SF_SMOKE, "documents")
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
    q = incremental_reweight(
        stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(120)
    final = sorted(Path(f"{dirs}/state/summary").glob("epoch_*"))[-1]
    carry = spark.read.schema(REWEIGHT_CARRY_SCHEMA).parquet(str(final))
    assert _tuples(emit_reweight(carry)) == _tuples(
        q_mixture_reweight(spark, SF_SMOKE)
    )


def test_pack_epoch_chain_equals_batch_key(spark):
    """Any epoch order + a replayed epoch must reproduce the batch
    q_pack_sequences layout bit-identically — the carry is the per-doc
    input set (pure function of each doc), so the keyed merge is
    associative, commutative, AND idempotent, and emission runs the
    batch key's own prefix scan."""
    from hive_similarity_join_spark.queries.pipeline_q import (
        q_pack_sequences,
    )
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        emit_pack,
        merge_pack,
        pack_partials,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    slices = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    carry = None
    for sl in reversed(slices):
        carry = merge_pack(carry, pack_partials(sl))
    carry = merge_pack(carry, pack_partials(slices[1]))  # replay
    assert _tuples(emit_pack(carry)) == _tuples(
        q_pack_sequences(spark, SF_SMOKE)
    )


def test_streaming_pack_matches_batch_key(spark, dirs):
    from hive_similarity_join_spark.queries.pipeline_q import (
        q_pack_sequences,
    )
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        PACK_CARRY_SCHEMA,
        emit_pack,
        incremental_pack,
    )

    d = load_table(spark, SF_SMOKE, "documents")
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
    q = incremental_pack(
        stream, f"{dirs}/state", checkpoint_dir=f"{dirs}/ckpt"
    )
    q.awaitTermination(120)
    final = sorted(Path(f"{dirs}/state/summary").glob("epoch_*"))[-1]
    carry = spark.read.schema(PACK_CARRY_SCHEMA).parquet(str(final))
    assert _tuples(emit_pack(carry)) == _tuples(
        q_pack_sequences(spark, SF_SMOKE)
    )
