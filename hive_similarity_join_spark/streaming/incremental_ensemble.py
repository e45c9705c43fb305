"""Incremental ensemble dedup — the streaming mirror of
``q_dedup_ensemble_representatives`` (queries/dedup_q.py), FIFTEENTH
continuous-aggregate mirror.

The batch key unions three blocking families' verified pair graphs
(MinHash-LSH t=0.8, SimHash Hamming<=8, sorted-neighborhood w=125
jac>=0.8), runs min-label connected components, and picks the
best-quality survivor per cluster. Mirroring it incrementally forces
an honest split, because the three generators differ in WHAT their
pair membership depends on:

- **SimHash-wide is purely PAIRWISE**: fingerprints are doc-local
  (md5 token hashes, no corpus statistics) and the blocking is
  lossless at the radius, so pair(a,b) holds iff
  bit_count(fp_a XOR fp_b) <= 8 — a predicate on the two docs alone.
  The pair set over a growing corpus is MONOTONE: carry it, and per
  epoch add only new-vs-all deltas
  (operators/dedup.py simhash_wide_delta_pairs).
- **MinHash-LSH candidacy is NOT monotone**: band signatures hash the
  corpus-GLOBAL rarest-first token ranking (_ranked_tokens), so a new
  doc shifts token frequencies, re-ranks the dictionary, and can
  create or DESTROY band collisions between two OLD docs. A carried
  LSH pair set could therefore contain pairs the final batch graph
  lacks — bit-equality demands recomputing this leg from the full
  document carry at emission.
- **SNM is NOT monotone either**: neighborhoods are windows over the
  GLOBAL sorted rank, and inserting docs between two old neighbors
  pushes them apart — an old pair inside w=125 before an epoch can be
  outside it after (the reverse of monotone growth). Recompute at
  emission, via the batch key's own generator body
  (queries/dedup_q.py snm_scored_pairs_from).

So the carry is two relations: the DOCUMENT state (doc_id, bag,
fingerprint — keyed idempotent rows, the same carry algebra as the
gopher/dedup mirrors) and the monotone SimHash-wide PAIR set (set
union, idempotent). Emission recomputes the two ranking-dependent
legs from the document carry, unions the carried pair leg, and runs
the batch key's own CC + survivor tail verbatim — so the mirror
cannot drift from what it mirrors, and pytest asserts BIT-equality
against ``q_dedup_ensemble_representatives`` for any-order epoch
chains, a replayed epoch through the RAW merge, and a real
availableNow stream.

The trade, stated plainly: per-epoch work is cheap (doc-local
fingerprints + the |new| x 45-key band probe), but emission is
O(corpus) on the LSH/SNM legs — inherent, because their pair
membership READS corpus-global state. At 100 TB this mirror's shape
is "ingest continuously, emit on a cadence" (daily reps refresh);
a deployment that needs cheap continuous emission should drop the
ranking-dependent generators and pay the recall delta the blocking
ensemble audit prices (q_dedup_blocking_ensemble: LSH leg 0.790 of
the union's 0.944 at sf0.01).

State layout: ``{state_dir}/docs/carry_v{N}`` and
``{state_dir}/pairs/carry_v{N}`` (versioned-carry contract,
streaming/state.py) plus per-epoch summary snapshots of both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_similarity_join_spark.streaming.state import (
    prune_carries,
    read_latest_carry,
)

ENSEMBLE_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("bag", T.ArrayType(T.StringType())),
        T.StructField("fp", T.LongType()),
    ]
)

ENSEMBLE_PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("id1", T.LongType()),
        T.StructField("id2", T.LongType()),
        T.StructField("hamming", T.LongType()),
    ]
)


def ensemble_doc_partials(batch: DataFrame) -> DataFrame:
    """(doc_id, bag, fp) for one documents slice: the bag-token array
    (everything both ranking-dependent generators and the quality
    score derive from) plus the doc-local 60-bit SimHash fingerprint
    (null for empty-token docs — they pair with nothing and the
    survivor tail excludes them, exactly as in the batch key)."""
    from hive_similarity_join_spark.functions import text as TX
    from hive_similarity_join_spark.operators.dedup import (
        simhash_fingerprints,
    )

    fps = simhash_fingerprints(batch, "doc_id", "text").select(
        F.col("_id").alias("doc_id"), F.col("_fp").alias("fp")
    )
    return (
        batch.select("doc_id", TX.bag_tokens("text").alias("bag"))
        .join(fps, "doc_id", "left")
    )


def merge_ensemble(
    docs_carry: DataFrame | None,
    pairs_carry: DataFrame | None,
    delta: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Merge one epoch's document partials into both carries.

    Docs: keyed idempotent rows (dropDuplicates on doc_id — a replayed
    doc re-derives the identical row). Pairs: the monotone SimHash
    delta — every wide-radius pair with >=1 side in the epoch's docs,
    probed against the accumulated fingerprint set — unioned as a set
    (idempotent; a replay regenerates pairs already present). Both
    merges are associative + commutative + idempotent, so any epoch
    order and any replay land the same carries bit-exactly."""
    from hive_similarity_join_spark.operators.dedup import (
        simhash_wide_delta_pairs,
    )

    docs_new = (
        delta
        if docs_carry is None
        else docs_carry.unionByName(delta).dropDuplicates(["doc_id"])
    )
    new_fps = delta.filter(F.col("fp").isNotNull()).select(
        F.col("doc_id").alias("_id"), F.col("fp").alias("_fp")
    )
    all_fps = docs_new.filter(F.col("fp").isNotNull()).select(
        F.col("doc_id").alias("_id"), F.col("fp").alias("_fp")
    )
    pd = simhash_wide_delta_pairs(all_fps, new_fps)
    pairs_new = (
        pd
        if pairs_carry is None
        else pairs_carry.unionByName(pd).dropDuplicates(["id1", "id2"])
    )
    return docs_new, pairs_new


def emit_ensemble_reps(
    docs_carry: DataFrame, pairs_carry: DataFrame
) -> DataFrame:
    """The batch key's output from the carries: recompute the two
    ranking-dependent legs (LSH from the carried bags through the
    SAME minhash_lsh_pairs body, via its tokens_col seam — identical
    distinct (doc, token) pairs, hence identical global ranking,
    signatures and verified pairs; SNM through the batch generator's
    own snm_scored_pairs_from), union the carried monotone SimHash
    pair set, then the batch key's CC + survivor tail VERBATIM."""
    from hive_similarity_join_spark.operators.cache import pin
    from hive_similarity_join_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from hive_similarity_join_spark.queries.dedup_q import (
        _ENS_W,
        _SNM_T,
        MINHASH_T,
        _representatives_tail,
        snm_scored_pairs_from,
    )

    base = docs_carry.select("doc_id", F.col("bag").alias("_bag"))
    g_lsh = minhash_lsh_pairs(
        docs_carry, "doc_id", "bag", threshold=MINHASH_T, tokens_col="bag"
    ).select("id1", "id2")
    arrs = docs_carry.select(
        "doc_id", F.array_sort(F.array_distinct("bag")).alias("toks")
    )
    g_snm = (
        snm_scored_pairs_from(arrs, _ENS_W)
        .filter(F.col("jac") >= _SNM_T)
        .select("id1", "id2")
    )
    g_shw = pairs_carry.select("id1", "id2")
    pairs = pin(g_lsh.unionByName(g_shw).unionByName(g_snm).distinct())
    return _representatives_tail(base, connected_components(pairs))


def incremental_ensemble(
    stream: DataFrame, state_dir: str, checkpoint_dir: str | None = None
):
    """Continuous ensemble-dedup state maintenance over a documents
    stream (FIFTEENTH mirror). Two versioned carries (docs + monotone
    SimHash pairs); read the latest summary snapshots and call
    emit_ensemble_reps for the representatives artifact."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        docs_c = read_latest_carry(
            spark, f"{state_dir}/docs", ENSEMBLE_DOCS_SCHEMA,
            below_epoch=epoch_id,
        )
        pairs_c = read_latest_carry(
            spark, f"{state_dir}/pairs", ENSEMBLE_PAIRS_SCHEMA,
            below_epoch=epoch_id,
        )
        docs_new, pairs_new = merge_ensemble(
            docs_c, pairs_c, ensemble_doc_partials(batch)
        )
        docs_new.write.mode("overwrite").parquet(
            f"{state_dir}/docs/carry_v{epoch_id}"
        )
        pairs_new.write.mode("overwrite").parquet(
            f"{state_dir}/pairs/carry_v{epoch_id}"
        )
        for leg, schema in (
            ("docs", ENSEMBLE_DOCS_SCHEMA),
            ("pairs", ENSEMBLE_PAIRS_SCHEMA),
        ):
            spark.read.schema(schema).parquet(
                f"{state_dir}/{leg}/carry_v{epoch_id}"
            ).write.mode("overwrite").parquet(
                f"{state_dir}/summary/{leg}/epoch_{epoch_id:06d}"
            )
            prune_carries(f"{state_dir}/{leg}")

    writer = stream.writeStream.foreachBatch(process).trigger(
        availableNow=True
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
