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

Plan shape: fully RELATIONAL, zero driver collects — the codebook is a
PQ_M x PQ_K relation built in one distributed pass (per-subspace
windowed top-K over the hash order) and BROADCAST everywhere it is
used; cell assignment and probe tables are joins against it with ONE
shared d2 expression. (A first cut inlined the codebooks as literal
arrays, IVF-centroid style: 128 nested fold lambdas made every run
recompile ~4s of codegen and ship MB-sized task binaries. The
relational form compiles one lambda and ships none.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hive_similarity_join_spark.functions import vectors as V

PQ_M = 8        # subspaces
PQ_K = 16       # codebook entries per subspace
PQ_SUB = V.DIM // PQ_M  # dims per subspace


def _subspaces(v: Column) -> Column:
    """array of (m, sv) structs: the vector split into PQ_M subvectors."""
    return F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice(v, m * PQ_SUB + 1, PQ_SUB).alias("sv"),
            )
            for m in range(PQ_M)
        ]
    )


def _d2(a: Column, b: Column) -> Column:
    """Squared L2 between two subvector columns — zip_with + left-fold,
    the engine-portable association (shared by encode and tables)."""
    diff2 = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x)


def codebook_relation(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(m, c, sv): for each subspace m, the PQ_K corpus subvectors with
    the smallest (md5('m:'+id), id) — one distributed pass for ALL
    subspaces; c is the position in that order. PQ_M x PQ_K rows
    total: broadcast-sized by construction.

    Two-phase top-K (top-K of per-task top-Ks equals the global
    top-K): a per-(m, task) window prunes to K rows first, so the
    per-m global window only ever sorts n_tasks x K rows — a single
    window partitioned by m alone would funnel the whole corpus
    through PQ_M tasks at 100 TB."""
    v = V.as_double(vec_col)
    ex = corpus.select(
        F.col(id_col).alias("_id"), F.explode(_subspaces(v)).alias("_s")
    ).select("_id", F.col("_s.m").alias("m"), F.col("_s.sv").alias("sv"))
    h = F.md5(
        F.concat(F.col("m").cast("string"), F.lit(":"), F.col("_id").cast("string"))
    )
    w1 = Window.partitionBy("m", "_pid").orderBy(h.asc(), F.col("_id").asc())
    local = (
        ex.withColumn("_pid", F.spark_partition_id())
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= PQ_K)
    )
    w2 = Window.partitionBy("m").orderBy(h.asc(), F.col("_id").asc())
    return (
        local.withColumn("c", F.row_number().over(w2) - 1)
        .filter(F.col("c") < PQ_K)
        .select("m", "c", "sv")
    )


def encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, _v, cd): each vector's M codes (argmin d2 per subspace,
    tie-break code asc) as an m-ordered array — subspace explode joined
    against the broadcast codebook relation, windowed argmin,
    reassembled with sort_array(collect_list) so the order is pinned."""
    v = V.as_double(vec_col)
    ex = corpus.select(
        F.col(id_col).alias("vec_id"), F.explode(_subspaces(v)).alias("_s")
    ).select("vec_id", F.col("_s.m").alias("m"), F.col("_s.sv").alias("pv"))
    scored = ex.join(F.broadcast(codebooks), "m").select(
        "vec_id", "m", "c", _d2(F.col("pv"), F.col("sv")).alias("d2")
    )
    w = Window.partitionBy("vec_id", "m").orderBy(F.asc("d2"), F.asc("c"))
    best = scored.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    cd = best.groupBy("vec_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("m", "c"))), lambda s: s["c"]
        ).alias("cd")
    )
    return corpus.select(F.col(id_col).alias("vec_id"), v.alias("_v")).join(
        cd, "vec_id"
    )


def probe_tables(
    probes: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(probe_id, _p, _dt): each probe's M x K distance tables as a
    nested array (ordered by m then c via sort_array reassembly) —
    computed ONCE per probe, broadcast into the scan."""
    v = V.as_double(vec_col)
    ex = probes.select(
        F.col(id_col).alias("probe_id"), F.explode(_subspaces(v)).alias("_s")
    ).select("probe_id", F.col("_s.m").alias("m"), F.col("_s.sv").alias("pv"))
    cell = ex.join(F.broadcast(codebooks), "m").select(
        "probe_id", "m", "c", _d2(F.col("pv"), F.col("sv")).alias("d2")
    )
    rows = cell.groupBy("probe_id", "m").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("c", "d2"))), lambda s: s["d2"]
        ).alias("dl")
    )
    dt = rows.groupBy("probe_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("m", "dl"))), lambda s: s["dl"]
        ).alias("_dt")
    )
    return probes.select(F.col(id_col).alias("probe_id"), v.alias("_p")).join(
        dt, "probe_id"
    )


def _adc_fold() -> Column:
    """Approximate distance: left fold over subspaces of
    _dt[m][cd[m]+1] — ordered, association-identical on both engines
    (never a groupBy float sum)."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(PQ_M)),
        F.lit(0.0),
        lambda acc, m: acc
        + F.element_at(
            F.element_at(F.col("_dt"), m), F.element_at(F.col("cd"), m) + 1
        ),
    )


def _rerank(cand: DataFrame, k: int) -> DataFrame:
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
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_candidates: int = 20,
) -> DataFrame:
    """(probe_id, vec_id, sim, rank): ADC candidate generation + exact
    cosine re-rank. The probe side carries its M x K distance tables
    and BROADCASTS; the corpus streams — the per-pair cost is M
    integer lookups + an M-term ordered fold."""
    cb = codebook_relation(corpus, id_col, vec_col)
    indexed = encode(corpus, cb, id_col, vec_col)
    p = probe_tables(probes, cb, id_col, vec_col)
    scored = (
        F.broadcast(p)
        .join(indexed, F.col("probe_id") != F.col("vec_id"))
        .select("probe_id", "vec_id", "_p", "_v", _adc_fold().alias("adist"))
    )
    wc = Window.partitionBy("probe_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    cand = scored.withColumn("_cr", F.row_number().over(wc)).filter(
        F.col("_cr") <= n_candidates
    )
    return _rerank(cand, k)


def _centroid_table(centroids: list[list[float]]) -> Column:
    """The IVF centroid list as ONE literal nested-array column
    (cells x dim doubles, a few KB of plan — the same inlining budget
    as ivf._cell_dists), indexable by ``element_at(.., cell + 1)``."""
    return F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )


def ivfadc_residual_topk(
    corpus: DataFrame,
    probes: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 3,
    n_candidates: int = 20,
) -> DataFrame:
    """IVFADC with RESIDUAL encoding — the production FAISS IVFADC
    (Jégou et al., TPAMI 2011 §IV.B): PQ quantizes ``x − c_cell(x)``
    instead of ``x``. Residuals concentrate near the origin (the
    coarse quantizer has removed the between-cell variance), so the
    same 4-byte code budget spends its resolution on the
    within-cell detail that actually ranks neighbors — the accuracy
    ``ivfadc_topk``'s raw-vector leg leaves on the table WHEN the
    data has cluster structure (r12 VERDICT gap #5; q_vec_ann_recall
    / q_vec_ann_cost carry both legs so the gain is measured, not
    asserted — and on the isotropic synthetic embeddings it measures
    ~zero, as theory predicts: the gain is the between-cell variance
    removed, see the key docstring in queries/dedup_q.py).

    Determinism (the pq.py contract verbatim): residual = one IEEE
    subtraction per element against the SAME literal centroid values
    both engines route with; codebooks are the hash-sampled rows'
    RESIDUAL subvectors (same (md5('m:'+id), id) sample order as the
    raw leg — the order is id-hash-only, so the two legs index
    identical rows); distance tables are per (probe, cell) — the query
    residual differs per probed cell, ADC's one structural change —
    and the ADC fold, tie-breaks and exact-cosine rerank are shared
    with the raw leg.

    Scale shape: identical to ``ivfadc_topk`` — scan nprobe/n_cells of
    the corpus, read 4-byte codes, rerank top candidates against raw
    vectors — plus an nprobe-x-wider (still M x K-row) table build per
    probe and one centroid lookup per scanned code. The residual
    relation is a projection fused into the encode scan, never
    materialized corpus-wide."""
    from hive_similarity_join_spark.operators.ivf import (
        _cell_dists,
        assign_cells,
    )

    ct = _centroid_table(centroids)
    v = V.as_double(vec_col)

    cells = assign_cells(corpus, centroids, id_col, vec_col).select(
        "vec_id", "cell"
    )
    raw = corpus.select(F.col(id_col).alias("vec_id"), v.alias("_v"))
    resid = raw.join(cells, "vec_id").select(
        "vec_id",
        "cell",
        F.zip_with(
            F.col("_v"),
            F.element_at(ct, F.col("cell") + 1),
            lambda x, y: x - y,
        ).alias("rv"),
    )
    cb = codebook_relation(resid, "vec_id", "rv")
    indexed = encode(resid, cb, "vec_id", "rv").select("vec_id", "cd").join(
        cells, "vec_id"
    )

    p_raw = probes.select(F.col(id_col).alias("probe_id"), v.alias("_p"))
    top_cells = F.slice(
        F.array_sort(_cell_dists(F.col("_p"), centroids)), 1, nprobe
    )
    prout = (
        p_raw.select("probe_id", "_p", F.explode(top_cells).alias("_tc"))
        .select("probe_id", "_p", F.col("_tc.cell").alias("cell"))
        .select(
            "probe_id",
            "cell",
            "_p",
            F.zip_with(
                F.col("_p"),
                F.element_at(ct, F.col("cell") + 1),
                lambda x, y: x - y,
            ).alias("pr"),
        )
    )
    ex = prout.select(
        "probe_id", "cell", F.explode(_subspaces(F.col("pr"))).alias("_s")
    ).select(
        "probe_id", "cell", F.col("_s.m").alias("m"), F.col("_s.sv").alias("pv")
    )
    celltab = ex.join(F.broadcast(cb), "m").select(
        "probe_id", "cell", "m", "c", _d2(F.col("pv"), F.col("sv")).alias("d2")
    )
    rows = celltab.groupBy("probe_id", "cell", "m").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("c", "d2"))), lambda s: s["d2"]
        ).alias("dl")
    )
    dt = rows.groupBy("probe_id", "cell").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("m", "dl"))), lambda s: s["dl"]
        ).alias("_dt")
    )
    ptab = prout.select("probe_id", "cell", "_p").join(
        dt, ["probe_id", "cell"]
    )

    scored = (
        F.broadcast(ptab)
        .join(indexed, "cell")
        .filter(F.col("probe_id") != F.col("vec_id"))
        .select("probe_id", "vec_id", "_p", _adc_fold().alias("adist"))
    )
    wc = Window.partitionBy("probe_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    cand = scored.withColumn("_cr", F.row_number().over(wc)).filter(
        F.col("_cr") <= n_candidates
    )
    return _rerank(cand.join(raw, "vec_id"), k)


def ivfadc_topk(
    corpus: DataFrame,
    probes: DataFrame,
    centroids: list[list[float]],
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

    cb = codebook_relation(corpus, id_col, vec_col)
    cells = assign_cells(corpus, centroids, id_col, vec_col).select(
        "vec_id", "cell"
    )
    indexed = encode(corpus, cb, id_col, vec_col).join(cells, "vec_id")

    p = probe_tables(probes, cb, id_col, vec_col)
    top_cells = F.slice(
        F.array_sort(_cell_dists(F.col("_p"), centroids)), 1, nprobe
    )
    routed = p.select(
        "probe_id", "_p", "_dt", F.explode(top_cells).alias("_tc")
    ).select("probe_id", "_p", "_dt", F.col("_tc.cell").alias("cell"))

    scored = (
        F.broadcast(routed)
        .join(indexed, "cell")
        .filter(F.col("probe_id") != F.col("vec_id"))
        .select("probe_id", "vec_id", "_p", "_v", _adc_fold().alias("adist"))
    )
    wc = Window.partitionBy("probe_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    cand = scored.withColumn("_cr", F.row_number().over(wc)).filter(
        F.col("_cr") <= n_candidates
    )
    return _rerank(cand, k)
