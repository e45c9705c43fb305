"""Incremental gap-sessionization with an ANY-ORDER, REPLAY-IDEMPOTENT
carry — the streaming mirror of ``q_join_interval_overlap``
(queries/pipeline_q.py), ELEVENTH continuous-aggregate mirror.

Where ``incremental_intervals`` consolidates islands under an
ordered-arrival contract (O(keys) open-island state, closed islands
emitted exactly once), this mirror makes the OPPOSITE trade: the
carry holds the full per-user session-interval set and the merge is
single-linkage interval clustering —

    merge two intervals of a user iff  s2 - e1 < gap
    (sorted by start; overlapping intervals have s2 - e1 <= 0)

which is exactly the gaps-and-islands rule applied to interval
endpoints. Single-linkage clustering on the line is REDUCIBLE: the
islands of a point set equal the islands of any partition of it into
sub-islands, merged by this rule (the linking distance between two
islands is the gap between the last point of one and the first point
of the next, and each sub-island preserves exactly those boundary
points as its min/max). Hence the carry algebra is

  - ASSOCIATIVE + COMMUTATIVE: epochs merge bit-equal in any order
    and any slicing (chains across three epochs resolve in one merge
    pass — the island scan runs over the whole union);
  - IDEMPOTENT: a replayed epoch re-contributes intervals that merge
    into the islands they already formed, changing nothing — unlike
    the summable mirrors (rollup/gapfill/MAD), a retry is harmless
    even WITHOUT the versioned-carry protection.

That makes this the third carry algebra in the mirror family:
summable counts (rollup/MAD), keyed idempotent rows (gopher/dedup),
and now reducible clustering. State is O(sessions) — inherent, since
the mirrored key's output depends on every session interval.

Out-of-order tolerance is the point: Spark's native streaming
session_window needs a watermark and DROPS events later than it;
this carry accepts arbitrarily late events (they extend or bridge
old sessions retroactively) because emission recomputes from the
merged interval set. The cost is recompute-on-emit (O(carry)), the
same trade every mirror here makes.

Emission reuses the batch key's own ``overlap_histogram`` verbatim,
so the mirror cannot drift from what it mirrors; pytest asserts
bit-equality against ``q_join_interval_overlap`` for any-order epoch
chains, a replayed epoch through the RAW merge, and a real
availableNow stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_similarity_join_spark.streaming.state import (
    prune_carries,
    read_latest_carry,
)

GAP_US = 30 * 60 * 1_000_000

SESSIONS_CARRY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("s", T.LongType()),
        T.StructField("e", T.LongType()),
    ]
)


def session_partials(batch: DataFrame) -> DataFrame:
    """Per-user mini-session intervals of one events slice — the batch
    key's own event_sessions, verbatim."""
    from hive_similarity_join_spark.queries.pipeline_q import event_sessions

    return event_sessions(batch)


def merge_sessions(carry: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Single-linkage island merge of the unioned interval sets: per
    user, sorted by start, an interval starts a new island iff its
    start is >= gap past the running max end of everything before it
    (running MAX, not lag — an earlier long interval can swallow a
    later-starting shorter one). One window scan partitioned by
    user_id (high-cardinality — full cluster width), one aggregate."""
    u = delta if carry is None else carry.unionByName(delta)
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_e.isNull() | (F.col("s") - prev_e >= GAP_US), 1
    ).otherwise(0)
    return (
        u.withColumn(
            "island",
            F.sum(new_island).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "island")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .select("user_id", "s", "e")
    )


def emit_sessions(carry: DataFrame) -> DataFrame:
    """q_join_interval_overlap's concurrency histogram from the merged
    session carry — the batch key's own overlap_histogram, verbatim."""
    from hive_similarity_join_spark.queries.pipeline_q import (
        overlap_histogram,
    )

    return overlap_histogram(carry)


def incremental_sessions(
    stream: DataFrame, state_dir: str, checkpoint_dir: str | None = None
):
    """Continuous sessionization + concurrency-histogram maintenance
    over an events stream (ELEVENTH mirror); read the latest summary
    snapshot and call emit_sessions for the histogram."""
    from hive_similarity_join_spark.streaming.incremental_rollup import (
        _make_query,
    )

    return _make_query(
        stream,
        state_dir,
        session_partials,
        SESSIONS_CARRY_SCHEMA,
        merge_sessions,
        checkpoint_dir,
    )
