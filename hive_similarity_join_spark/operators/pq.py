"""Product quantization ANN (Jégou, Douze & Schmid, TPAMI 2011) — the
third ANN scale path next to hyperplane LSH (operators/knn.py) and
IVF (operators/ivf.py), with the SQ8 two-stage re-rank as the
pattern's fourth member.

PQ splits each vector into M subvectors and quantizes every subspace
against its own K-entry codebook, storing M small codes per vector
(here 8 codes x 16 entries = 4 bytes/vector vs 256 for the raw
floats). Search is ADC (asymmetric distance computation): the query
stays un-quantized; per subspace a K-entry table of squared L2
distances query-subvector -> codebook entries is computed ONCE, and
each corpus vector's approximate distance is the sum of M table
LOOKUPS — no per-pair float multiply at all. Candidates are then
exact-reranked.

SQL-mirrorable determinism (the q_vec_knn_ivf recipe): codebooks are
hash-sampled data subvectors — for subspace m, the K corpus rows with
the smallest (md5('m:'+id), id) — k-means' init without Lloyd, so
encode, tables, and ADC are all reproducible verbatim in DuckDB and
the key is hash-checked. Argmin/rank tie-breaks are (distance, code)
and (approx, vec_id). The ADC sum folds the M lookups in subspace
order (left fold on BOTH engines) — never a groupBy float sum, whose
association is nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hive_similarity_join_spark.functions import vectors as V

PQ_M = 8        # subspaces
PQ_K = 16       # codebook entries per subspace
PQ_SUB = V.DIM // PQ_M  # dims per subspace


def sample_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """codebooks[m][c] = the c-th sampled subvector for subspace m.
    One bounded collect of PQ_M * PQ_K subvectors (distributed
    TakeOrderedAndProject per subspace, same legitimacy note as
    operators/ivf.hash_sampled_centroids)."""
    books = []
    v = V.as_double(vec_col)
    for m in range(PQ_M):
        rows = (
            corpus.select(
                F.col(id_col).alias("_id"),
                F.slice(v, m * PQ_SUB + 1, PQ_SUB).alias("_sv"),
            )
            .withColumn(
                "_h", F.md5(F.concat(F.lit(f"{m}:"), F.col("_id").cast("string")))
            )
            .orderBy("_h", "_id")
            .limit(PQ_K)
            .collect()
        )
        books.append([[float(x) for x in r._sv] for r in rows])
    return books


def _sub(v: Column, m: int) -> Column:
    return F.slice(v, m * PQ_SUB + 1, PQ_SUB)


def _d2(a: Column, lit_vec: list[float]) -> Column:
    """Squared L2 between a subvector column and a literal codebook
    entry — zip_with + left-fold, the engine-portable association."""
    b = F.array(*[F.lit(x) for x in lit_vec])
    diff2 = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x)


def encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, _v, cd): each vector's M codes (argmin d2 per subspace,
    tie-break code asc) as an array — one narrow projection, the index
    build touches each row once."""
    v = V.as_double(vec_col)
    codes = []
    for m in range(PQ_M):
        sv = _sub(v, m)
        dists = F.array(
            *[
                F.struct(_d2(sv, codebooks[m][c]).alias("d"), F.lit(c).alias("c"))
                for c in range(len(codebooks[m]))
            ]
        )
        codes.append(F.element_at(F.array_sort(dists), 1)["c"])
    return corpus.select(
        F.col(id_col).alias("vec_id"), v.alias("_v"), F.array(*codes).alias("cd")
    )


def ivfadc_topk(
    corpus: DataFrame,
    probes: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 3,
    n_candidates: int = 20,
) -> DataFrame:
    """IVF + ADC composed (the FAISS IVFADC index): probes route to
    their nprobe nearest IVF cells, ADC scores ONLY those cells' PQ
    codes, exact cosine reranks the top candidates. The 100 TB reading:
    the scan touches nprobe/n_cells of the data (IVF's pruning) AND
    reads 4-byte codes instead of raw floats (PQ's compression) —
    multiplicative savings, which is why this composition is the
    default large-scale ANN deployment."""
    from hive_similarity_join_spark.operators.ivf import _cell_dists, assign_cells

    cells = assign_cells(corpus, centroids, id_col, vec_col).select(
        "vec_id", "cell"
    )
    indexed = encode(corpus, codebooks, id_col, vec_col).join(cells, "vec_id")

    pv = V.as_double(vec_col)
    tables = F.array(
        *[
            F.array(
                *[_d2(_sub(pv, m), codebooks[m][c]) for c in range(len(codebooks[m]))]
            )
            for m in range(PQ_M)
        ]
    )
    top_cells = F.slice(
        F.array_sort(_cell_dists(F.col("_p"), centroids)), 1, nprobe
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"), pv.alias("_p"), tables.alias("_dt")
    )
    routed = p.select(
        "probe_id", "_p", "_dt", F.explode(top_cells).alias("_tc")
    ).select("probe_id", "_p", "_dt", F.col("_tc.cell").alias("cell"))

    approx = F.aggregate(
        F.sequence(F.lit(1), F.lit(PQ_M)),
        F.lit(0.0),
        lambda acc, m: acc
        + F.element_at(
            F.element_at(F.col("_dt"), m), F.element_at(F.col("cd"), m) + 1
        ),
    )
    scored = (
        F.broadcast(routed)
        .join(indexed, "cell")
        .filter(F.col("probe_id") != F.col("vec_id"))
        .select("probe_id", "vec_id", "_p", "_v", approx.alias("adist"))
    )
    wc = Window.partitionBy("probe_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    cand = scored.withColumn("_cr", F.row_number().over(wc)).filter(
        F.col("_cr") <= n_candidates
    )
    sim = V.cosine(F.col("_p"), F.col("_v"))
    wk = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        cand.select("probe_id", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(wk).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def adc_topk(
    corpus: DataFrame,
    probes: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_candidates: int = 20,
) -> DataFrame:
    """(probe_id, vec_id, sim, rank): ADC candidate generation + exact
    cosine re-rank. The probe side carries its M x K distance tables
    as a computed array column and BROADCASTS; the corpus streams —
    the per-pair cost is M integer lookups + an M-term ordered fold."""
    indexed = encode(corpus, codebooks, id_col, vec_col)
    pv = V.as_double(vec_col)
    tables = F.array(
        *[
            F.array(
                *[_d2(_sub(pv, m), codebooks[m][c]) for c in range(len(codebooks[m]))]
            )
            for m in range(PQ_M)
        ]
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"), pv.alias("_p"), tables.alias("_dt")
    )
    # approx = left fold over subspaces of table[m][code[m]] — ordered,
    # association-identical on both engines
    approx = F.aggregate(
        F.sequence(F.lit(1), F.lit(PQ_M)),
        F.lit(0.0),
        lambda acc, m: acc
        + F.element_at(
            F.element_at(F.col("_dt"), m), F.element_at(F.col("cd"), m) + 1
        ),
    )
    scored = (
        F.broadcast(p)
        .join(indexed, F.col("probe_id") != F.col("vec_id"))
        .select("probe_id", "vec_id", "_p", "_v", approx.alias("adist"))
    )
    wc = Window.partitionBy("probe_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    cand = scored.withColumn("_cr", F.row_number().over(wc)).filter(
        F.col("_cr") <= n_candidates
    )
    sim = V.cosine(F.col("_p"), F.col("_v"))
    wk = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        cand.select("probe_id", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(wk).cast("bigint"))
        .filter(F.col("rank") <= k)
    )
