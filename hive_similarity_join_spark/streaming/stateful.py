"""Arbitrary stateful streaming (SURVEY §2.10's escape hatch, made
real): a custom per-key running aggregate via ``applyInPandasWithState``.

Built-in windowed aggregations cover time-bucketed state; this operator
is the pattern for state the built-ins can't express — a per-user
lifetime counter that survives across micro-batches. It is the
Structured Streaming twin of a batch ``groupBy(user).agg(...)``:
under no late data, the LAST emitted row per user equals the batch
aggregate (asserted in tests/test_stateful_streaming.py).

Mechanics: rows group by ``user_id``; each micro-batch hands the group's
new rows to the function as Arrow-backed pandas batches together with a
``GroupState`` holding (count, sum); the function folds the batch into
the state and emits one updated row. State lives in the state store
(RocksDB/HDFS-backed on a cluster) and is evicted by the processing-time
timeout, so the store is bounded by ACTIVE key cardinality, not lifetime
key count — the knob that keeps this viable at 100 TB.

This is the one deliberately-Python streaming operator (state transition
logic is imperative by nature); data still crosses in Arrow batches, not
row-at-a-time pickling.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def running_user_totals(stream: DataFrame, ttl_minutes: int | None = None) -> DataFrame:
    """(user_id, n_events, total_value) updated every micro-batch.

    ``ttl_minutes`` sets a processing-time state timeout — idle keys are
    evicted, bounding the state store by active users. ``None`` keeps
    state forever (only sane for bounded key domains).
    """

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # idle-key eviction path: drop state, emit nothing
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            total += float(pdf["value"].sum())
        state.update((n, total))
        if ttl_minutes:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total]}
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes
        else GroupStateTimeout.NoTimeout
    )
    return stream.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


# --------------------------------------------------------------------------
# transformWithState (Spark 4.x): the successor API to
# applyInPandasWithState — typed state variables (value/list/map), timers,
# and TTL handled by the runtime instead of a hand-rolled tuple schema.
# Same operator semantics as running_user_totals above, expressed the
# Spark-4-native way. RUNTIME DEPENDENCY: the transformWithState state
# server speaks protobuf to the Python worker, so `google.protobuf`
# must be importable on workers — the test skips where it is absent
# (this container), and applyInPandasWithState above remains the
# dependency-free arbitrary-state path.
# --------------------------------------------------------------------------

try:  # public in Spark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningTotalsProcessor(StatefulProcessor):
        """Per-user lifetime (count, sum) in a typed ValueState."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n BIGINT, total DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                tuple(self._state.get()) if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += int(len(pdf))
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    def running_user_totals_tws(stream: DataFrame) -> DataFrame:
        """transformWithStateInPandas twin of running_user_totals: the
        state variable is declared with its own schema and lives in the
        state store per key; the runtime (not the operator) owns
        serialization, timers, and TTL. Update mode emits one row per
        touched user per micro-batch."""
        return (
            stream.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=_RunningTotalsProcessor(),
                outputStructType=RUNNING_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )

except ImportError:  # pragma: no cover — pre-4.0 Spark
    running_user_totals_tws = None  # type: ignore[assignment]
