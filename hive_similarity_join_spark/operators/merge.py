"""MERGE INTO (upsert) semantics — the Hive-ACID / Delta / Iceberg
warehouse primitive, expressed as one relational plan.

``MERGE INTO target USING source ON key
    WHEN MATCHED AND <delete_cond> THEN DELETE
    WHEN MATCHED THEN UPDATE SET ...
    WHEN NOT MATCHED THEN INSERT ...``

maps to a single FULL OUTER equi join on the merge key followed by a
row-wise CASE:

  - key in both, delete condition holds  -> row dropped
  - key in both                          -> source values win (update)
  - key only in source                   -> source row (insert)
  - key only in target                   -> target row (carry)

No shuffle beyond the one key-partitioned join — at 100 TB both sides
bucket by the merge key and even that exchange drops out, which is how
transactional table formats run their merges (the format adds commit
machinery; the DATA movement is exactly this plan). Deterministic:
the result is a pure function of the two relations — no ordering, no
ambiguity (one source row per key is the caller's contract, as in
SQL MERGE, where multiple matches raise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key: str,
    value_cols: list[str],
    delete_cond: Column | None = None,
    action_col: str | None = None,
) -> DataFrame:
    """Post-merge relation: ``key`` + ``value_cols`` (+ optionally an
    ``action_col`` tagging each surviving row keep/update/insert —
    handy for audits; deletes leave no row to tag).

    ``delete_cond`` is evaluated on the SOURCE columns of matched rows
    (reference them via the ``src`` prefix applied here: source value
    columns arrive aliased ``_src_<col>``)."""
    # explicit presence markers on each side — null VALUE columns are
    # legal data, so presence must not be inferred from them
    t2 = target.select(key, *value_cols).withColumn("_tgt_present", F.lit(1))
    s = source.select(
        F.col(key),
        *[F.col(c).alias(f"_src_{c}") for c in value_cols],
    ).withColumn("_src_present", F.lit(1))
    j = t2.join(s, key, "full_outer")
    tgt_here = F.col("_tgt_present").isNotNull()
    src_here = F.col("_src_present").isNotNull()

    if delete_cond is not None:
        # SQL MERGE: a NULL WHEN-MATCHED-AND condition is NOT satisfied
        # — the row falls through to UPDATE. Without the coalesce,
        # filter(~(... & NULL)) yields NULL and silently DELETES it.
        j = j.filter(
            ~(tgt_here & src_here & F.coalesce(delete_cond, F.lit(False)))
        )
    action = (
        F.when(tgt_here & src_here, F.lit("update"))
        .when(src_here, F.lit("insert"))
        .otherwise(F.lit("keep"))
    )
    out_vals = [
        F.when(src_here, F.col(f"_src_{c}")).otherwise(F.col(c)).alias(c)
        for c in value_cols
    ]
    cols = [F.col(key), *out_vals]
    if action_col:
        cols.append(action.alias(action_col))
    return j.select(*cols)
