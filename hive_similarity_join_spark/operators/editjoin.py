"""Scalable edit-distance self-join — symmetric-deletion candidate
generation (the FastSS / SymSpell family: Bocek, Hunt, Stiller, "Fast
Similarity Search in Large Dictionaries", U. Zurich TR 2007 — public
algorithm), expressed UDF-free.

Why: ``q_simjoin_edit``'s broadcast nested-loop is right for a
dimension-sized side, but an edit join between two FACT-sized string
columns needs candidate generation that avoids the quadratic loop.

Candidate lemma: if ``ed(r, s) <= k`` then deleting at most k chars
from r and at most k chars from s can produce the SAME string (delete
the characters each string's side of an optimal alignment inserts or
substitutes). So each string emits its full <=k-deletion variant set as
join keys, and every true pair shares at least one key. The converse
does not hold, so candidates are verified with exact ``levenshtein``.

Why deletion variants and not positional segments (the PassJoin
scheme): segment keys are substrings of the ORIGINAL strings, so a
corpus with a low-entropy region — e.g. ids sharing a constant
``Customer#`` prefix, precisely the shape of synthetic/service keys —
collapses one segment to a single value shared by the whole corpus:
one join key, quadratic candidates, one straggler task. A deletion
variant spans the WHOLE string, so two strings only share a key when
they agree everywhere outside <=2k deleted positions — key selectivity
tracks actual similarity, not local substring entropy, and the skew
degenerates only when the RESULT itself is quadratic (near-identical
corpus), i.e. the join is output-bound, which no candidate scheme can
beat.

Cost: each string of length L emits O(L^k / k!) keys (L+1 at k=1,
~L^2/2 at k=2) of length >= L-k — linear scans and one string-keyed
hash join; shuffle volume is keys x corpus, never the pair space.
Everything is sequence/transform/explode Column algebra — no Python in
the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _del1(s: Column) -> Column:
    """All strings obtained by deleting exactly one char of ``s``
    (array<string>, one entry per position; empty array for '')."""
    L = F.length(s)
    return F.transform(
        F.sequence(F.lit(1), L),
        lambda j: F.concat(s.substr(F.lit(1), j - 1), s.substr(j + 1, F.lit(8192))),
    )


def _variants(s: Column, k: int) -> Column:
    """Distinct deletion variants of ``s`` with 0..k chars removed."""
    out = F.array(s)
    level = F.array(s)
    for _ in range(k):
        level = F.array_distinct(F.flatten(F.transform(level, _del1)))
        out = F.array_union(out, level)
    return out


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    k: int = 1,
) -> DataFrame:
    """(id1, id2, dist): all pairs with ``levenshtein <= k``, id1 < id2.

    Exact: the symmetric-deletion filter is lossless (lemma above);
    every candidate is verified with the exact edit distance. The
    length filter |L1-L2| <= k rides in the join condition for free
    (variant keys of strings differing by more than k in length never
    collide at equal key length — the explicit predicate just prunes
    the hash probe earlier).
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    s = df.select(
        F.col(id_col).alias("_id"),
        F.col(str_col).alias("_s"),
        F.length(str_col).cast("int").alias("_L"),
    ).filter(F.col("_s").isNotNull() & (F.length(str_col) >= 1))

    keys = s.select(
        "_id", "_s", "_L", F.explode(_variants(F.col("_s"), k)).alias("_key")
    )
    a = keys.select(
        F.col("_id").alias("id1"), F.col("_s").alias("_s1"),
        F.col("_L").alias("_L1"), "_key",
    )
    b = keys.select(
        F.col("_id").alias("id2"), F.col("_s").alias("_s2"),
        F.col("_L").alias("_L2"), F.col("_key").alias("_key2"),
    )
    cands = (
        a.join(
            b,
            (F.col("_key") == F.col("_key2"))
            & (F.col("id1") < F.col("id2"))
            & (F.abs(F.col("_L1") - F.col("_L2")) <= k),
        )
        .select("id1", "_s1", "id2", "_s2")
        .dropDuplicates(["id1", "id2"])
    )
    dist = F.levenshtein(F.col("_s1"), F.col("_s2"))
    return (
        cands.withColumn("dist", dist.cast("bigint"))
        .filter(F.col("dist") <= k)
        .select("id1", "id2", "dist")
    )
