"""Scalable edit-distance self-join — segment-filtered (the PassJoin
family: Li, Deng, Feng, "PASS-JOIN: a partition-based method for
similarity joins", VLDB 2012 — public algorithm), expressed UDF-free.

Why: ``q_simjoin_edit``'s broadcast nested-loop is right for a
dimension-sized side, but an edit join between two FACT-sized string
columns needs candidate generation that avoids the quadratic loop.

Partition lemma: split every string s into ``k+1`` contiguous segments
(even partition). If ``ed(r, s) <= k``, then r contains at least one of
s's segments as an EXACT substring — k edits cannot touch all k+1
segments — and that occurrence's start position differs from the
segment's home position by at most k. So:

- index side: each string emits its k+1 (segment, index, length) keys
  — O(k) rows per string;
- probe side: each string emits every substring that could match a
  segment of a string whose length is within k of its own —
  O((2k+1)^2 (k+1)) rows per string, small for the k <= 2 regime this
  targets;
- candidates = equi-join on (substring, segment index, indexed length);
  verification = native ``levenshtein`` (JVM) on the distinct pairs.

Everything is sequence/transform/explode Column algebra + one hash
join + one verify — no Python in the row path, shuffles keyed by
segment strings (bounded by data, not by the pair space).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seg_scheme(m: int, L: Column, i: Column) -> tuple[Column, Column]:
    """(start, length) of 0-based segment ``i`` under the even partition
    of a length-``L`` string into ``m`` segments: the first ``m - L%m``
    segments have length ``L div m``, the rest one more."""
    base = (L / m).cast("int")
    rem = L % m
    plain = m - rem  # number of base-length segments (they come first)
    length = F.when(i < plain, base).otherwise(base + 1)
    start = i * base + F.greatest(F.lit(0), i - plain)
    return start, length


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    k: int = 1,
) -> DataFrame:
    """(id1, id2, dist): all pairs with ``levenshtein <= k``, id1 < id2.

    Exact: the segment filter is lossless (partition lemma above);
    every candidate is verified with the exact edit distance.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    m = k + 1
    s = df.select(
        F.col(id_col).alias("_id"),
        F.col(str_col).alias("_s"),
        F.length(str_col).cast("int").alias("_L"),
    ).filter(F.col("_s").isNotNull() & (F.length(str_col) >= 1))

    # ---- index side: k+1 segments per string -------------------------
    seg_i = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("_i")
    idx = s.select("_id", "_s", "_L", seg_i)
    start, length = _seg_scheme(m, F.col("_L"), F.col("_i"))
    idx = idx.select(
        F.col("_id").alias("id2"),
        F.col("_s").alias("_s2"),
        F.col("_L").alias("_L2"),
        "_i",
        F.substring(F.col("_s"), start + 1, length).alias("_key"),
    )

    # ---- probe side: candidate substrings ----------------------------
    # for each indexed length L2 in [L1-k, L1+k], each segment index i,
    # each start within +-k of the segment's home position
    probes = s.select(
        F.col("_id").alias("id1"),
        F.col("_s").alias("_s1"),
        F.col("_L").alias("_L1"),
        F.explode(
            F.sequence(
                F.greatest(F.col("_L") - k, F.lit(1)), F.col("_L") + k
            )
        ).alias("_L2"),
    )
    probes = probes.select(
        "id1", "_s1", "_L1", "_L2",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("_i"),
    )
    p_start, p_len = _seg_scheme(m, F.col("_L2"), F.col("_i"))
    lo = F.greatest(p_start - k, F.lit(0))
    hi = F.least(p_start + k, F.col("_L1") - p_len)
    # sequence(lo, hi) DESCENDS when hi < lo — guard to an empty array
    # (explode then drops the row) instead of emitting bogus positions
    pos = F.when(hi >= lo, F.sequence(lo, hi)).otherwise(
        F.array().cast("array<int>")
    )
    probes = probes.select(
        "id1", "_s1", "_L1", "_L2", "_i",
        F.explode(pos).alias("_p"),
        p_len.alias("_plen"),
    )
    probes = probes.select(
        "id1", "_s1", "_L1", "_L2", "_i",
        F.substring(F.col("_s1"), F.col("_p") + 1, F.col("_plen")).alias("_key"),
    )

    cands = (
        probes.join(idx, ["_key", "_i", "_L2"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "_s1", "id2", "_s2")
        .dropDuplicates(["id1", "id2"])
    )
    dist = F.levenshtein(F.col("_s1"), F.col("_s2"))
    return (
        cands.withColumn("dist", dist.cast("bigint"))
        .filter(F.col("dist") <= k)
        .select("id1", "id2", "dist")
    )
