"""Count-Min-Sketch core (Cormode & Muthukrishnan, J.Algorithms 2005)
— shared by the batch audit key (queries/dedup_q.q_agg_cms_topk) and
the streaming maintainer (streaming/incremental_cms.py).

Engine-portable determinism: bucket(r, tok) = md5_prefix60('r:'+tok)
mod W — identical integer arithmetic in Spark and DuckDB, so the batch
key is hash-checked. Counters are exact integer sums, which is also
what makes the sketch MERGEABLE: counters(A ∪ B) = counters(A) +
counters(B) cell-wise — the property the streaming maintainer and any
map-side partial aggregation rely on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hive_similarity_join_spark.functions import text as TX

CMS_D = 4    # hash rows
CMS_W = 64   # buckets per row: sized so collisions (and the overcount audit) are non-vacuous on the closed test vocabulary


def bucket(r_col: Column, tok_col: Column) -> Column:
    """md5-derived bucket id for hash row ``r`` and token ``tok``."""
    seed = F.concat(r_col.cast("string"), F.lit(":"), tok_col)
    return TX.md5_prefix60(seed) % CMS_W


def _rows() -> Column:
    return F.explode(F.array(*[F.lit(r) for r in range(CMS_D)])).alias("r")


def counters_from_token_counts(tc: DataFrame) -> DataFrame:
    """(r, b, cnt) counter cells from a (tok, n) token-count relation.
    Builds from the vocab-sized aggregate, not the occurrence stream —
    same totals, one partial-aggregated shuffle into CMS_D x CMS_W
    cells."""
    cells = tc.select("tok", "n", _rows()).select(
        "r", bucket(F.col("r"), F.col("tok")).alias("b"), "n"
    )
    return cells.groupBy("r", "b").agg(
        F.sum("n").cast("bigint").alias("cnt")
    )


def estimate(counters: DataFrame, probes: DataFrame) -> DataFrame:
    """(tok, n_cms): point estimates for the tokens in ``probes``
    (a (tok,) relation) — min over rows of the hashed-bucket counter.
    The probe side is small by construction (heavy-hitter candidates);
    it broadcasts against the <= D*W-cell counter table.

    Cells absent from ``counters`` count as ZERO (left join +
    coalesce): a probe token never folded into the sketch — an
    external watchlist entry, say — correctly estimates 0 (or the
    smallest mass among its buckets), instead of being dropped or
    min'd over only its non-empty cells, which would overestimate."""
    pb = probes.select("tok", _rows()).select(
        "tok", "r", bucket(F.col("r"), F.col("tok")).alias("b")
    )
    return (
        F.broadcast(pb)
        .join(counters, ["r", "b"], "left")
        .groupBy("tok")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("n_cms")
        )
    )


def merge_counters(*parts: DataFrame) -> DataFrame:
    """Cell-wise sum of counter relations — CMS mergeability."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("r", "b").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
