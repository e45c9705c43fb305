"""Search / corpus-hygiene query keys (EXT: LLM-pipeline breadth).

Operators a training-data platform runs beside dedup: decontamination
(eval-set n-gram overlap), ranked retrieval (BM25-style scoring),
inverted-index construction, RAG-style chunking, and per-source corpus
profiling. All UDF-free Column expressions; every key carries a
bit-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hive_similarity_join_spark.functions import text as TX
from hive_similarity_join_spark.registry import query
from hive_similarity_join_spark.sources.loader import load_table

# Decontamination: the "benchmark" is the deterministic doc_id % 53 == 0
# slice of the corpus (a stand-in for an eval set supplied as its own
# table in production); overlap unit is the word 4-gram — production
# checks use ~8-13-gram shingles, but this corpus's docs are short and
# its vocab closed, so 4 keeps the flagged set non-trivial (18 docs at
# sf0.01) without flagging everything.
_DECON_MOD = 53
_DECON_N = 4

# DuckDB 4-gram list over `bag` (same construction as _NGRAM_TOKS for
# trigrams in text_q.py): starts i = 1 .. len-3, inclusive-indexed.
_DECON_GRAMS = (
    "list_transform(range(1, len(bag) - 2), i -> "
    "bag[i] || ' ' || bag[i+1] || ' ' || bag[i+2] || ' ' || bag[i+3])"
)


@query(
    "q_decontaminate",
    oracle=f"""
WITH bags AS (
  SELECT doc_id, {TX.duck_bag()} AS bag FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, t.g
  FROM bags, unnest({_DECON_GRAMS}) AS t(g)
  WHERE len(bag) >= {_DECON_N}
),
ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % {_DECON_MOD} = 0)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shared_ngrams
FROM sh s JOIN ev USING (g)
WHERE s.doc_id % {_DECON_MOD} <> 0
GROUP BY s.doc_id
""",
)
def q_decontaminate(spark, sf_dir):
    """Eval-set decontamination: flag training documents sharing any
    word 4-gram with the benchmark slice, with the count of distinct
    shared shingles — the n-gram-overlap contamination check LLM data
    pipelines run before training (e.g. GPT-3 App. C / PaLM-style
    8-13-gram checks, shrunk to 4 for this corpus's short doc lengths
    and closed vocabulary).

    Scale shape: the EVAL side is tiny relative to the corpus (here the
    1/53 slice; in production the benchmark table), so its distinct
    shingle set BROADCASTS and the corpus side never shuffles shingle
    strings — one map-side hash join, then a doc-id-keyed count. At
    100 TB, hash the shingles (xxhash64) to shrink the broadcast; kept
    as strings here for oracle parity."""
    d = load_table(spark, sf_dir, "documents")
    grams = F.array_distinct(TX.word_ngrams(TX.bag_tokens("text"), _DECON_N))
    sh = d.select("doc_id", F.explode(grams).alias("g"))
    ev = (
        sh.filter(F.col("doc_id") % _DECON_MOD == 0)
        .select("g")
        .distinct()
    )
    return (
        sh.filter(F.col("doc_id") % _DECON_MOD != 0)
        .join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_ngrams"))
    )


# BM25-style ranked retrieval. The idf is the RATIONAL Robertson form
# (N - df + 0.5) / (df + 0.5) WITHOUT the log: ln() is transcendental
# and libm implementations differ in the last ulp across engines, while
# +,*,/ on doubles are IEEE-exact — so the rational form keeps the key
# bit-exact AND the ranking identical (log is monotone). k1/b are the
# standard 1.2 / 0.75.
_BM25_TERMS = ("join", "stream", "customer")
_BM25_K1 = "1.2"
_BM25_B = "0.75"
_BM25_TOPK = 20


def _bm25_oracle() -> str:
    per_term = []
    for i, t in enumerate(_BM25_TERMS, start=1):
        per_term.append(
            f"len(list_filter(bag, x -> x = '{t}')) AS tf{i}"
        )
    tf_cols = ",\n         ".join(per_term)
    score_terms = " + ".join(
        f"""((CAST(s.n - d.df{i} AS DOUBLE) + 0.5) / (CAST(d.df{i} AS DOUBLE) + 0.5))
        * ((CAST(b.tf{i} AS DOUBLE) * ({_BM25_K1} + 1.0)) /
           (CAST(b.tf{i} AS DOUBLE) + {_BM25_K1} *
            (1.0 - {_BM25_B} + {_BM25_B} * (CAST(b.dl AS DOUBLE) / s.avgdl))))"""
        for i in range(1, len(_BM25_TERMS) + 1)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(1, len(_BM25_TERMS) + 1)
    )
    return f"""
WITH b AS (
  SELECT doc_id, len(bag) AS dl,
         {tf_cols}
  FROM (SELECT doc_id, {TX.duck_bag()} AS bag FROM documents)
  WHERE len(bag) > 0
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM b
),
d AS (SELECT {df_cols} FROM b),
scored AS (
  SELECT b.doc_id,
         {score_terms} AS score
  FROM b, s, d
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, score,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
             AS rank
  FROM scored
) WHERE rank <= {_BM25_TOPK}
"""


@query("q_search_bm25", oracle=_bm25_oracle())
def q_search_bm25(spark, sf_dir):
    """BM25-style ranked retrieval for a fixed query over the corpus:
    per-document term frequencies, corpus df/avgdl statistics, the
    rational (log-free, identically-ranked, bit-exact) Robertson idf,
    and the top-20 (score DESC, doc_id) results.

    Scale shape: tf columns are per-row array expressions (no explode,
    no shuffle); the corpus statistics reduce to ONE tiny row that
    broadcasts back onto the scored relation; the global top-k plans as
    TakeOrderedAndProject (per-partition heaps + single merge), and the
    rank window runs over the already-limited k rows, never the corpus."""
    d = load_table(spark, sf_dir, "documents")
    bag = TX.bag_tokens("text")

    def _eq(term):
        # NOT `lambda x, t=term`: PySpark reads a 2-arg lambda as the
        # (element, index) form and would bind `t` to the array index.
        return lambda x: x == F.lit(term)

    b = d.select(
        "doc_id",
        F.size(bag).alias("dl"),
        *[
            F.size(F.filter(bag, _eq(t))).alias(f"tf{i}")
            for i, t in enumerate(_BM25_TERMS, start=1)
        ],
    ).filter(F.col("dl") > 0)
    stats = b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"df{i}")
            for i in range(1, len(_BM25_TERMS) + 1)
        ],
    )
    k1 = float(_BM25_K1)
    bb = float(_BM25_B)
    scored = b.join(F.broadcast(stats))
    score = None
    for i in range(1, len(_BM25_TERMS) + 1):
        idf = ((F.col("n") - F.col(f"df{i}")).cast("double") + F.lit(0.5)) / (
            F.col(f"df{i}").cast("double") + F.lit(0.5)
        )
        tf = F.col(f"tf{i}").cast("double")
        part = idf * (
            (tf * F.lit(k1 + 1.0))
            / (
                tf
                + F.lit(k1)
                * (
                    F.lit(1.0 - bb)
                    + F.lit(bb) * (F.col("dl").cast("double") / F.col("avgdl"))
                )
            )
        )
        score = part if score is None else score + part
    top = (
        scored.select("doc_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_BM25_TOPK)
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


@query(
    "q_text_inverted_index",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, t.tok
  FROM (SELECT doc_id, {TX.duck_bag()} AS bag FROM documents),
       unnest(bag) AS t(tok)
)
SELECT tok,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS total_tf,
       array_to_string(list_slice(list_sort(list(DISTINCT doc_id)), 1, 5), ',')
           AS sample_postings
FROM tok
GROUP BY tok
""",
)
def q_text_inverted_index(spark, sf_dir):
    """Inverted-index construction: per-token document frequency, total
    term frequency, and a deterministic posting-list sample (the 5
    smallest doc ids, comma-joined — sorted so collect_set's arbitrary
    order never reaches the output).

    Scale shape: one explode + one token-keyed aggregate with map-side
    partials; postings stay bounded (top-5 sample) so no token's full
    posting list ever materializes on one node — at 100 TB the full
    postings would go straight to a token-bucketed parquet sink
    instead (sources/sinks.py)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(TX.bag_tokens("text")).alias("tok"))
    return tok.groupBy("tok").agg(
        F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("total_tf"),
        F.concat_ws(
            ",", F.slice(F.array_sort(F.collect_set("doc_id")), 1, 5)
        ).alias("sample_postings"),
    )


# RAG-style chunking: fixed token window with overlap. 32/8 fits this
# corpus's short docs; production values (512/64) are the same plan.
_CHUNK_SIZE = 32
_CHUNK_STRIDE = _CHUNK_SIZE - 8


@query(
    "q_docs_to_chunks",
    oracle=f"""
WITH bags AS (
  SELECT doc_id, {TX.duck_bag()} AS bag FROM documents
),
starts AS (
  SELECT doc_id, bag, t.s
  FROM bags, unnest(generate_series(0, len(bag) - 1, {_CHUNK_STRIDE})) AS t(s)
  WHERE len(bag) > 0
)
SELECT doc_id,
       CAST(s // {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(len(list_slice(bag, s + 1, s + {_CHUNK_SIZE})) AS BIGINT)
           AS n_tokens,
       array_to_string(list_slice(bag, s + 1, s + {_CHUNK_SIZE}), ' ')
           AS chunk_text
FROM starts
""",
)
def q_docs_to_chunks(spark, sf_dir):
    """Document chunking for RAG / context-window packing: split each
    document's token stream into fixed-size windows with overlap
    (size 32, stride 24 here; the plan is identical at 512/64). Emits
    (doc_id, chunk_id, n_tokens, chunk_text); the trailing chunk keeps
    whatever remains. Differs from q_pack_sequences (which concatenates
    ACROSS documents): chunking preserves document boundaries, the
    retrieval-indexing shape.

    Scale shape: pure map-side — tokenize, sequence+explode the start
    offsets, slice per chunk; no shuffle anywhere, parallelism is the
    scan's. The generator runs inside whole-stage codegen."""
    d = load_table(spark, sf_dir, "documents")
    bag = TX.bag_tokens("text")
    t = d.select("doc_id", bag.alias("bag")).filter(F.size("bag") > 0)
    starts = F.sequence(
        F.lit(0), F.size("bag") - 1, F.lit(_CHUNK_STRIDE)
    )
    chunk = F.slice(F.col("bag"), F.col("s") + 1, _CHUNK_SIZE)
    return (
        t.select("doc_id", "bag", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            (F.col("s") / _CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
            F.size(chunk).cast("bigint").alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


@query(
    "q_corpus_profile",
    oracle=f"""
WITH bags AS (
  SELECT doc_id, source, {TX.duck_bag()} AS bag
  FROM documents
),
scored AS (
  SELECT doc_id, source, len(bag) AS n_tokens, bag,
         CAST(round(({TX.duck_quality("bag")})
          * 1000000) AS BIGINT) AS q_e6
  FROM bags WHERE len(bag) > 0
),
tok AS (
  SELECT source, t.tok, count(*) AS tf
  FROM scored, unnest(bag) AS t(tok)
  GROUP BY 1, 2
),
toptok AS (
  SELECT source, tok AS top_token FROM (
    SELECT source, tok,
           row_number() OVER (PARTITION BY source
                              ORDER BY tf DESC, tok) AS rn
    FROM tok
  ) WHERE rn = 1
)
SELECT s.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(floor(CAST(sum(s.q_e6) AS DOUBLE) / count(*)) AS BIGINT)
           AS avg_quality_e6,
       median(s.n_tokens) AS median_tokens,
       any_value(t.top_token) AS top_token
FROM scored s JOIN toptok t USING (source)
GROUP BY s.source
""",
)
def q_corpus_profile(spark, sf_dir):
    """Per-source corpus profile — the domain report a mixture-weighting
    step consumes: document count, mean quality (micro-units: each
    double score rounds to an int BEFORE summing, so the mean is exact
    integer arithmetic on both engines — summing raw doubles would be
    association-order-dependent), median token count (integral; the
    even-count midpoint stays representable), and the deterministic
    top token (tf DESC, token ASC tie-break).

    Scale shape: one explode + (source, token)-keyed count with map-side
    partials, a source-partitioned top-1 window over the (tiny)
    aggregated relation, and a doc-sized profile aggregate — no
    all-pairs anything; every shuffle key is bounded by vocab x sources
    or by sources."""
    from hive_similarity_join_spark.functions.text import quality_score

    d = load_table(spark, sf_dir, "documents")
    bag = TX.bag_tokens("text")
    scored = d.select(
        "doc_id",
        "source",
        bag.alias("bag"),
        F.size(bag).alias("n_tokens"),
        F.round(quality_score("text") * 1_000_000, 0).cast("bigint").alias("q_e6"),
    ).filter(F.col("n_tokens") > 0)
    tok = (
        scored.select("source", F.explode("bag").alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("tf"), F.asc("tok"))
    toptok = (
        tok.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("tok").alias("top_token"))
    )
    prof = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        # floor, not a bare bigint cast: Spark truncates double->long
        # while DuckDB rounds; floor of the identical IEEE quotient is
        # engine-portable.
        F.floor(F.sum("q_e6").cast("double") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("avg_quality_e6"),
        F.median("n_tokens").alias("median_tokens"),
    )
    return prof.join(F.broadcast(toptok), "source").select(
        "source", "n_docs", "avg_quality_e6", "median_tokens", "top_token"
    )


# --------------------------------------------- hybrid retrieval (RRF)

_RRF_K = 60  # the standard reciprocal-rank-fusion damping constant


def _hybrid_rrf_oracle() -> str:
    from hive_similarity_join_spark.queries import vectors_q  # noqa: F401
    from hive_similarity_join_spark.registry import ORACLES

    return f"""
WITH sparse AS ({ORACLES["q_search_bm25"]}),
dense AS (
  SELECT vec_id AS doc_id, rank
  FROM ({ORACLES["q_vec_knn"]}) WHERE probe_id = 0
),
fused AS (
  SELECT coalesce(s.doc_id, d.doc_id) AS doc_id,
         s.rank AS sparse_rank, d.rank AS dense_rank,
         coalesce(1.0 / CAST(s.rank + {_RRF_K} AS DOUBLE), 0.0)
           + coalesce(1.0 / CAST(d.rank + {_RRF_K} AS DOUBLE), 0.0)
           AS rrf_score
  FROM sparse s FULL JOIN dense d ON d.doc_id = s.doc_id
)
SELECT doc_id, sparse_rank, dense_rank, rrf_score,
       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id)
            AS BIGINT) AS fused_rank
FROM fused
"""


@query("q_search_hybrid_rrf", oracle=_hybrid_rrf_oracle())
def q_search_hybrid_rrf(spark, sf_dir):
    """HYBRID RETRIEVAL by reciprocal-rank fusion (Cormack, Clarke &
    Buettcher, SIGIR 2009): the lexical leg (q_search_bm25's top-20
    for its fixed query) and the dense leg (q_vec_knn's exact cosine
    top-k for probe 0 — vec_id aligns with doc_id in this corpus)
    fused by RRF with the standard k={K}: score = sum over legs of
    1/(k + rank), a missing leg contributing 0. RRF is THE fusion a
    retrieval pipeline reaches for first because it needs no score
    calibration — only ranks — which is also what makes it bit-exact
    here: each contribution is one double division by an integer, the
    two-term sum has a fixed association order, and the fused ranking
    tie-breaks on doc_id. Emits (doc_id, sparse_rank, dense_rank,
    rrf_score, fused_rank) over the union of the two retrieved sets.

    Composition discipline: both legs ARE the already-hash-verified
    keys (builders as DataFrames, oracles as CTEs) — the fusion adds
    one full outer join on <= 25 rows and a bounded rank window.
    Scale: each leg's cost is its own key's (TakeOrderedAndProject
    top-k); fusion is constant-size."""
    from hive_similarity_join_spark.queries.vectors_q import q_vec_knn

    sparse = q_search_bm25(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("sparse_rank")
    )
    dense = (
        q_vec_knn(spark, sf_dir)
        .filter(F.col("probe_id") == 0)
        .select(F.col("vec_id").alias("doc_id"), F.col("rank").alias("dense_rank"))
    )
    leg = lambda c: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.col(c) + F.lit(_RRF_K)).cast("double"), F.lit(0.0)
    )
    fused = (
        sparse.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            "sparse_rank",
            "dense_rank",
            (leg("sparse_rank") + leg("dense_rank")).alias("rrf_score"),
        )
    )
    w = Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return fused.withColumn(
        "fused_rank", F.row_number().over(w).cast("bigint")
    )
