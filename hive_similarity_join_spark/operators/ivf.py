"""IVF (inverted-file) approximate nearest neighbor — the second scale
path for vector similarity next to the random-hyperplane LSH in
``operators/knn.py``.

Classic IVF-Flat (the public FAISS/Lucene design, expressed as
DataFrame ops): a coarse k-means quantizer partitions the corpus into
``n_cells`` inverted lists; a probe searches only the ``nprobe``
nearest cells' lists and exact-rescans those candidates.

Spark mapping:
- train: MLlib ``KMeans`` (seeded, few iterations) over the (sampled)
  corpus — the ONLY MLlib touchpoint, at the documented VectorUDT
  boundary; everything after converts back to plain array<double>.
- index: one narrow ``transform`` assigns each corpus row its cell id;
  persisting/bucketing the corpus BY cell id makes the per-cell scan a
  partition-pruned read at 100 TB (a probe touches nprobe/n_cells of
  the data).
- search: centroids are k x dim — tiny — so probe->cell routing is a
  broadcast join + window top-nprobe; candidates = probes equi-joined
  to the corpus on cell id; exact cosine re-scores; window top-k.

Recall/cost dial: (n_cells, nprobe). nprobe = n_cells degenerates to
exact brute force; the property test pins recall@k against the exact
twin (q_vec_knn) at small scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hive_similarity_join_spark.functions import vectors as V

_SEED = 20260813


def train_cells(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    max_iter: int = 5,
) -> list[list[float]]:
    """Coarse quantizer centroids (n_cells x dim), deterministic seed."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(array_to_vector(V.as_double(vec_col)).alias("features"))
    model = KMeans(k=n_cells, seed=_SEED, maxIter=max_iter).fit(feats)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def _centroids_df(spark, centroids: list[list[float]]) -> DataFrame:
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cell int, centroid array<double>"
    )


def assign_cells(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, _v, cell): each row keyed to its nearest centroid by L2.

    Pure DataFrame route (broadcast centroids + window argmin) rather
    than model.transform — keeps the index build re-runnable from the
    stored centroid table without shipping a fitted model object.
    """
    spark = corpus.sparkSession
    cents = _centroids_df(spark, centroids)
    scored = (
        corpus.select(F.col(id_col).alias("vec_id"), V.as_double(vec_col).alias("_v"))
        .join(F.broadcast(cents))
        .select(
            "vec_id", "_v", "cell", V.l2(F.col("_v"), F.col("centroid")).alias("_d")
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("_d"), F.asc("cell"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "_v", "cell")
    )


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """(probe_id, vec_id, sim, rank): approximate cosine top-k.

    ``centroids`` accepts a pre-trained quantizer (the steady-state
    shape: train once, search many); None trains on the corpus inline.
    """
    spark = corpus.sparkSession
    if centroids is None:
        centroids = train_cells(corpus, vec_col, n_cells)
    cents = _centroids_df(spark, centroids)

    indexed = assign_cells(corpus, centroids, id_col, vec_col)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # co-locate the inverted lists (at 100 TB: write bucketed by cell)
    indexed = indexed.repartition(min(n_part, len(centroids)), "cell")

    p = probes.select(F.col(id_col).alias("probe_id"), V.as_double(vec_col).alias("_p"))
    routed = (
        p.join(F.broadcast(cents))
        .select(
            "probe_id", "_p", "cell", V.l2(F.col("_p"), F.col("centroid")).alias("_d")
        )
    )
    w_route = Window.partitionBy("probe_id").orderBy(F.asc("_d"), F.asc("cell"))
    routed = (
        routed.withColumn("_rn", F.row_number().over(w_route))
        .filter(F.col("_rn") <= nprobe)
        .select("probe_id", "_p", "cell")
    )

    sim = V.cosine(F.col("_p"), F.col("_v"))
    scored = (
        F.broadcast(routed)
        .join(indexed, "cell")
        .filter(F.col("probe_id") != F.col("vec_id"))
        .select("probe_id", "vec_id", sim.alias("sim"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("bigint")).filter(
        F.col("rank") <= k
    )
