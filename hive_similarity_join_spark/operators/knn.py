"""Approximate nearest-neighbor search — the 100 TB path for vector
similarity (SURVEY §2.9; exact brute force in queries/vectors_q.py is
the correctness baseline).

Random-hyperplane LSH (signed projections) with multi-probe:

- ``hyperplanes``: a fixed seeded matrix (deterministic across runs and
  engines), broadcast as literal arrays — n_planes x dim doubles.
- bucket id = sign bits of the projections (one long).
- candidate pairs = probe x corpus within the same bucket; multi-probe
  flips each single bit to also search the Hamming-1 neighborhood,
  trading (n_planes + 1)x probe fan-out for recall.
- exact cosine re-scores candidates; top-k per probe via window.

Scale shape: corpus is bucketed ONCE (one narrow shuffle on bucket id);
probes broadcast; per-bucket brute force touches |corpus| / 2^n_planes
vectors on average. No MLlib VectorUDT conversions — plain
array<double> + higher-order functions end to end.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hive_similarity_join_spark.functions import vectors as V
from hive_similarity_join_spark.operators.partitions import parallelism

# Single source of truth for the embedding dimension (functions/
# vectors.py): a regenerated-testdata dim flip must fail in ONE place —
# a stale local copy here would silently dot hyperplanes against
# truncated prefixes, degrading ANN bucketing with no error anywhere.
DIM = V.DIM
N_PLANES = 8
_SEED = 20260813


def _hyperplanes(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    rng = random.Random(_SEED)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id of ``vec`` (array<double>) as a long."""
    acc = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        proj = V.dot(vec, F.array(*[F.lit(x) for x in plane]))
        acc = acc + F.when(proj >= 0, F.lit(1 << i).cast("bigint")).otherwise(0)
    return acc


def duck_plane_dot(vec_sql: str, plane: list[float], dim: int = DIM) -> str:
    """DuckDB mirror of ``V.dot(vec, literal plane)`` — same left-fold
    association order as the Spark expression, plane inlined with
    ``repr`` (17 significant digits -> the literal parses back to the
    identical IEEE double on both engines)."""
    lits = "[" + ", ".join(repr(x) for x in plane) + "]"
    return (
        f"list_reduce(list_transform(generate_series(1,{dim}), "
        f"i -> CAST({vec_sql}[i] AS DOUBLE)*CAST(({lits})[i] AS DOUBLE)), "
        f"(x,y) -> x+y)"
    )


def duck_bucket(vec_sql: str, planes: list[list[float]]) -> str:
    """DuckDB mirror of ``bucket_expr`` (sign bits of the projections).
    Projections are bit-exact (duck_plane_dot), so the buckets match."""
    terms = [
        f"(CASE WHEN {duck_plane_dot(vec_sql, p)} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"


def ann_candidates(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    multi_probe: bool = True,
) -> DataFrame:
    """(probe_id, vec_id, _v1, _v2): the DISTINCT bucket-collision
    pairs the LSH search exact-scores — ``ann_topk`` is score + top-k
    over exactly this relation, and the cost audit
    (q_vec_ann_cost) counts it, so the two cannot drift. The pair set
    IS the method's read cost: everything outside it is never
    touched."""
    planes = _hyperplanes(n_planes, DIM)
    c = corpus.select(
        F.col(id_col).alias("vec_id"), V.as_double(vec_col).alias("_v2")
    ).withColumn("_bkt", bucket_expr(F.col("_v2"), planes))

    p = probes.select(
        F.col(id_col).alias("probe_id"), V.as_double(vec_col).alias("_v1")
    ).withColumn("_bkt0", bucket_expr(F.col("_v1"), planes))
    if multi_probe:
        flips = F.array(
            F.col("_bkt0"),
            *[
                F.col("_bkt0").bitwiseXOR(F.lit(1 << i).cast("bigint"))
                for i in range(n_planes)
            ],
        )
        p = p.withColumn("_bkt", F.explode(flips))
    else:
        p = p.withColumn("_bkt", F.col("_bkt0"))

    n_part = parallelism(corpus)
    return (
        F.broadcast(p.drop("_bkt0"))
        .join(c.repartition(n_part, "_bkt"), "_bkt")
        .filter(F.col("probe_id") != F.col("vec_id"))
        .select("probe_id", "vec_id", "_v1", "_v2")
        .dropDuplicates(["probe_id", "vec_id"])  # multi-probe overlap
    )


def ann_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = N_PLANES,
    multi_probe: bool = True,
) -> DataFrame:
    """(probe_id, vec_id, sim, rank): approximate cosine top-k.

    Deterministic: fixed hyperplanes, exact re-scoring, (sim desc, id)
    tie-break. Recall is governed by n_planes and multi_probe.
    """
    cand = ann_candidates(corpus, probes, id_col, vec_col, n_planes, multi_probe)
    scored = cand.select(
        "probe_id", "vec_id",
        V.cosine(F.col("_v1"), F.col("_v2")).alias("sim"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("bigint")).filter(
        F.col("rank") <= k
    )
