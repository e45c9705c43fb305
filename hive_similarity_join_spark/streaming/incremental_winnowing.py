"""Incremental winnowing dedup — the streaming mirror of
``q_dedup_winnowing`` (queries/dedup_q.py), NINETEENTH
continuous-aggregate mirror.

The batch key winnows each document into a 40-bit fingerprint sketch
(MOSS window-min over word-trigram hashes), caps hot fingerprints at
doc-frequency {CAP}, and self-joins the capped set into candidate
pairs. The incremental split is clean because the two halves differ in
what they read:

- **Fingerprints are DOC-LOCAL**: md5 gram hashes + a per-document
  window-min — no corpus statistics anywhere (contrast MinHash-LSH's
  corpus-global token ranking). The (doc_id, h) relation over a
  growing corpus is therefore keyed idempotent rows: carry it, merge
  per epoch with a set-union dropDuplicates.
- **The df cap and the pair join are corpus-GLOBAL and non-monotone**:
  a fingerprint below the cap can cross it when later docs arrive,
  REMOVING every pair it generated (the cap is what keeps boilerplate
  from emitting C(n,2) pairs). Emission therefore recomputes cap +
  self-join from the carried fingerprint set — via the batch key's
  own winnow_pairs_from, VERBATIM, so the mirror cannot drift.

Unlike the ensemble/savings mirrors (whose emissions re-derive pair
graphs from carried TEXT), the carry here is the compact sketch —
~2/(W+1) of the gram stream — and emission never touches text again:
the cheapest emit of the dedup-mirror family. pytest pins bit-equality
against the batch key for any-order epoch chains, a replayed epoch
through the RAW merge, and a real availableNow stream.

State layout: ``{state_dir}/fp/carry_v{N}`` (versioned-carry contract,
streaming/state.py) plus per-epoch summary snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from hive_similarity_join_spark.streaming.state import (
    prune_carries,
    read_latest_carry,
)

WINNOW_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("h", T.LongType()),
    ]
)


def winnow_fp_partials(batch: DataFrame) -> DataFrame:
    """One documents slice -> its uncapped winnowed fingerprints,
    through the batch key's own doc-local half."""
    from hive_similarity_join_spark.queries.dedup_q import (
        winnow_fingerprints,
    )

    return winnow_fingerprints(batch)


def merge_winnow(carry: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Set-union merge on the (doc_id, h) key: fingerprints are
    doc-local, so a replayed doc re-derives identical rows and
    dropDuplicates makes the merge associative + commutative +
    idempotent — any epoch order and any replay land the same carry."""
    if carry is None:
        return delta.dropDuplicates(["doc_id", "h"])
    return carry.unionByName(delta).dropDuplicates(["doc_id", "h"])


def emit_winnow_pairs(carry: DataFrame) -> DataFrame:
    """The batch key's output from the carry: df cap + fingerprint
    self-join via winnow_pairs_from, verbatim."""
    from hive_similarity_join_spark.queries.dedup_q import (
        winnow_pairs_from,
    )

    return winnow_pairs_from(carry)


def incremental_winnowing(
    stream: DataFrame, state_dir: str, checkpoint_dir: str | None = None
):
    """Continuous winnowing-sketch maintenance over a documents stream
    (NINETEENTH mirror). One versioned fingerprint carry; read the
    latest summary snapshot and call emit_winnow_pairs for the
    candidate pair list."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        carry = read_latest_carry(
            spark, f"{state_dir}/fp", WINNOW_FP_SCHEMA,
            below_epoch=epoch_id,
        )
        merged = merge_winnow(carry, winnow_fp_partials(batch))
        merged.write.mode("overwrite").parquet(
            f"{state_dir}/fp/carry_v{epoch_id}"
        )
        spark.read.schema(WINNOW_FP_SCHEMA).parquet(
            f"{state_dir}/fp/carry_v{epoch_id}"
        ).write.mode("overwrite").parquet(
            f"{state_dir}/summary/fp/epoch_{epoch_id:06d}"
        )
        prune_carries(f"{state_dir}/fp")

    writer = stream.writeStream.foreachBatch(process).trigger(
        availableNow=True
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
