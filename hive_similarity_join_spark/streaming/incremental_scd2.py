"""Incremental SCD2 maintenance — the streaming mirror of
``q_scd2_history`` (queries/pipeline_q.py).

The batch key rebuilds the full type-2 history with two stacked
windows; this operator MAINTAINS it: per-user ``GroupState`` holds the
OPEN interval (current event_type, valid_from, version) and each
micro-batch emits the intervals it CLOSES — exactly the rows a
warehouse MERGE would update-then-insert, without re-scanning history.
State is one tuple per active user (bounded by key cardinality, like
streaming/stateful.py's running totals), and each emitted row is final
— closed intervals never change — so the sink can be append-only.

Ordering contract (stated, not hidden): events are sorted by
(ts, event_id) WITHIN each micro-batch, and batches are assumed to
arrive in time order — the same in-order-ingestion assumption a
foreachBatch MERGE pipeline makes. A late event that lands before an
already-closed interval would require rewriting emitted history, which
no append-only streaming operator can do; the batch key is the
recompute path for that case (run it over the corrected log).

Python is deliberate here (imperative state transition, the §2.11
escape hatch); rows cross as Arrow-backed pandas batches, never
row-at-a-time pickles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_FMT = "%Y-%m-%d %H:%M:%S"

# Matches q_scd2_history's closed-interval rows bit-for-bit (timestamps
# as formatted strings, version/is_current as BIGINT).
SCD2_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("valid_from", StringType()),
        StructField("valid_to", StringType()),
        StructField("version", LongType()),
        StructField("is_current", LongType()),
    ]
)

# Open interval: (event_type, valid_from as epoch micros, version).
_STATE_SCHEMA = StructType(
    [
        StructField("cur_type", StringType()),
        StructField("valid_from_us", LongType()),
        StructField("version", LongType()),
    ]
)


def _fmt_us(us: int) -> str:
    return pd.Timestamp(us, unit="us").strftime(_FMT)


def _fold(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs))
    rows = rows.sort_values(["ts", "event_id"])
    if state.exists:
        cur_type, vf_us, ver = state.get
    else:
        cur_type, vf_us, ver = None, None, 0
    out: list[tuple] = []
    uid = key[0]
    for r in rows.itertuples():
        ts_us = r.ts.value // 1_000  # pandas ns -> micros
        if cur_type is None:
            cur_type, vf_us, ver = r.event_type, ts_us, 1
        elif r.event_type != cur_type:
            out.append(
                (uid, cur_type, _fmt_us(vf_us), _fmt_us(ts_us), ver, 0)
            )
            cur_type, vf_us, ver = r.event_type, ts_us, ver + 1
    state.update((cur_type, vf_us, ver))
    yield pd.DataFrame(
        out,
        columns=[
            "user_id",
            "event_type",
            "valid_from",
            "valid_to",
            "version",
            "is_current",
        ],
    )


def scd2_closed_intervals(events: DataFrame) -> DataFrame:
    """Closed SCD2 intervals as they happen: one output row per
    (user, version) the instant a newer event_type supersedes it.
    The union of all emitted rows equals the batch key's
    ``valid_to IS NOT NULL`` rows under in-order ingestion
    (asserted in tests/test_incremental_scd2.py); the open interval
    per user lives only in state until its closing event arrives."""
    return events.groupBy("user_id").applyInPandasWithState(
        _fold,
        SCD2_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
