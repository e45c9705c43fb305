"""Shared versioned-carry state helpers for the foreachBatch
incremental mirrors (incremental_pattern, incremental_intervals).

Layout contract: per-epoch state lives in ``{state_dir}/carry_v{N}``
where N is the foreachBatch epoch id. An epoch READS the newest
version written by a PRIOR epoch (version index < current epoch id)
and WRITES its own version — never read-then-overwrite on one path,
and never a driver round-trip of the state rows. Reading strictly
below the current epoch id is what makes a retried epoch safe: after
a mid-write crash Structured Streaming re-runs the SAME epoch id, and
the retry must not consume the carry its failed attempt wrote (it may
be partial, and even if complete it already incorporates this batch —
reading it would double-count). Old versions are pruned to the last
two, so storage is bounded at 2x carry size while the previous
version stays re-readable for exactly that retry.

On a cluster filesystem the same contract runs on the Hadoop
FileSystem API — list version dirs, don't read them.
"""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import DataFrame, SparkSession


def read_state(spark: SparkSession, path: str, schema) -> DataFrame | None:
    try:
        return spark.read.schema(schema).parquet(path)
    except Exception:
        return None


def carry_versions(state_dir: str, below_epoch: int | None = None) -> list[str]:
    """Existing carry version dirs, oldest first; with ``below_epoch``
    only versions written by epochs strictly before it (the retry-safe
    read set)."""
    dirs = sorted(
        glob.glob(f"{state_dir}/carry_v*"),
        key=lambda p: int(p.rsplit("_v", 1)[1]),
    )
    if below_epoch is not None:
        dirs = [
            p for p in dirs if int(p.rsplit("_v", 1)[1]) < below_epoch
        ]
    return dirs


def read_latest_carry(
    spark: SparkSession, state_dir: str, schema, below_epoch: int
) -> DataFrame | None:
    """The carry a (possibly retried) epoch may consume: the newest
    version strictly below its own epoch id, or None on epoch 0 /
    first run."""
    versions = carry_versions(state_dir, below_epoch=below_epoch)
    return read_state(spark, versions[-1], schema) if versions else None


def prune_carries(state_dir: str, keep: int = 2) -> None:
    for old in carry_versions(state_dir)[:-keep]:
        shutil.rmtree(old, ignore_errors=True)
