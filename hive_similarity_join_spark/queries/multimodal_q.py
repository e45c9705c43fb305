"""Multimodal query keys: binary payload handling with a SQL oracle for
the byte-level parts; decode/features are Pandas-UDF plumbing checked
rows-only (DuckDB can't run pandas UDFs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_similarity_join_spark.operators.multimodal import (
    byte_histogram_features,
    decode_media,
    frame_sample,
    resize_media,
    synthesize_media,
)
from hive_similarity_join_spark.registry import query
from hive_similarity_join_spark.sources.loader import load_table


@query(
    "q_multimodal_bytes",
    oracle="""
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(octet_length(encode(regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g'))) AS BIGINT) AS n_bytes,
       md5(regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g')) AS payload_hash
FROM documents
""",
)
def q_multimodal_bytes(spark, sf_dir):
    """Binary-column fundamentals: payload byte length + content hash
    (dedup key for media). Bytes are utf-8 text here (no real media in
    the testdata), but the operators are payload-agnostic."""
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("payload_hash"),
    )


@query(
    "q_multimodal_decode",
    oracle="""
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(octet_length(encode(regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g'))) % 640 + 1 AS INTEGER) AS width,
       CAST(octet_length(encode(regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g'))) % 480 + 1 AS INTEGER) AS height,
       CAST(octet_length(encode(regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g'))) AS BIGINT) AS n_bytes
FROM documents
""",
)
def q_multimodal_decode(spark, sf_dir):
    """Decode plumbing (mapInPandas, Arrow-batched). The fake decode's
    dimension arithmetic is a pure function of payload length, so the
    DuckDB oracle mirrors it exactly — the Python batch path itself is
    what the Spark side exercises."""
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return decode_media(media, fake=True)


@query(
    "q_multimodal_features",
    oracle="""
WITH b AS (
  SELECT doc_id, ascii(substr(regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g'), CAST(t.i AS INTEGER), 1)) // 16 AS bin
  FROM documents, unnest(range(1, length(regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g')) + 1)) AS t(i)
),
c AS (SELECT doc_id, bin, count(*) AS c FROM b GROUP BY 1, 2)
SELECT d.doc_id AS media_id,
       CAST(16 AS INTEGER) AS dim,
       string_agg(CAST(coalesce(c.c, 0) AS VARCHAR), ',' ORDER BY gs.b)
           AS hist_counts
FROM documents d
CROSS JOIN unnest(range(0, 16)) AS gs(b)
LEFT JOIN c ON c.doc_id = d.doc_id AND c.bin = gs.b
GROUP BY d.doc_id
""",
)
def q_multimodal_features(spark, sf_dir):
    """Byte-histogram features (Arrow-batched pandas_udf). The key
    emits the UN-normalized counts serialized to a string: integer
    counts are exact on both engines (float32-normalized features
    would double-round at the DuckDB mirror), and the serialization
    sidesteps array-typed cells in the driver's canonicalizer. The
    documents corpus is pure ASCII, so DuckDB's char positions equal
    byte positions and bin = ascii // 16 mirrors np.histogram's
    uniform [0,256) edges."""
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    feats = byte_histogram_features(media, normalized=False)
    return feats.select(
        "media_id",
        F.size("features").alias("dim"),
        F.concat_ws(
            ",", F.transform("features", lambda x: x.cast("int").cast("string"))
        ).alias("hist_counts"),
    )


@query(
    "q_multimodal_frames",
    oracle="""
SELECT doc_id AS media_id,
       CAST(t.o AS BIGINT) AS frame_offset
FROM documents, unnest(range(0, octet_length(encode(regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g'))), 64)) AS t(o)
WHERE doc_id % 3 = 2 AND octet_length(encode(regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g'))) > 0
""",
)
def q_multimodal_frames(spark, sf_dir):
    """Frame sampling over video payloads: one row per byte-stride
    'frame'; the expansion is a native sequence+explode (no Python),
    so it IS oracle-checkable unlike the pandas-UDF plumbing."""
    media = synthesize_media(load_table(spark, sf_dir, "documents")).filter(
        F.octet_length("payload") > 0
    )
    return frame_sample(media, every_n_bytes=64).select(
        "media_id", F.col("frame_offset").cast("bigint").alias("frame_offset")
    )


@query(
    "q_multimodal_resize",
    oracle="""
WITH s AS (
  SELECT doc_id, regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g') AS text, length(regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g')) AS n FROM documents WHERE length(regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g')) > 0
),
px AS (
  SELECT doc_id,
         string_agg(substr(text, CAST((t.i * n) // 1024 AS INTEGER) + 1, 1),
                    '' ORDER BY t.i) AS resampled
  FROM s, unnest(range(0, 1024)) AS t(i)
  GROUP BY doc_id
)
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(32 AS INTEGER) AS target_w,
       CAST(32 AS INTEGER) AS target_h,
       CAST(1024 AS BIGINT) AS n_bytes,
       md5(resampled) AS payload_hash
FROM px
""",
)
def q_multimodal_resize(spark, sf_dir):
    """Resize plumbing (mapInPandas byte-stride resample to 32x32).
    The key emits an md5 digest of the resampled payload so the
    deterministic byte output is hash-checked end to end: the DuckDB
    oracle rebuilds the same stride — index (i * n) // 1024, i in
    [0, 1024) — from the ASCII text (char positions == byte positions)
    and hashes it. Binary cells never reach the driver's canonicalizer."""
    media = synthesize_media(load_table(spark, sf_dir, "documents")).filter(
        F.octet_length("payload") > 0
    )
    return resize_media(media, target_w=32, target_h=32).select(
        "media_id",
        "kind",
        "target_w",
        "target_h",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("payload_hash"),
    )


@query(
    "q_multimodal_dedup",
    oracle="""
WITH m AS (
  SELECT doc_id, regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g') AS p
  FROM documents
)
SELECT md5(p) AS payload_hash,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(min(octet_length(encode(p))) AS BIGINT) AS n_bytes,
       CAST(CASE WHEN count(*) > 1 THEN 1 ELSE 0 END AS BIGINT) AS is_dup
FROM m GROUP BY p
""",
)
def q_multimodal_dedup(spark, sf_dir):
    """Exact dedup over BINARY payloads — the first gate of any media
    pipeline (byte-identical images/audio recur constantly in web
    crawls): group by content hash, keep the smallest id as the
    canonical copy, report group size and bytes. The same
    hash-groupBy shape as q_dedup_exact, applied to the binary column
    family; at 100 TB the md5 streams with the scan and the shuffle
    carries (hash, id, length) — never payload bytes.

    Payloads are the deterministic synthesize_media bytes (real media
    is environment-blocked, documented in operators/multimodal.py);
    the operator is payload-agnostic."""
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return (
        media.select(
            "media_id",
            F.md5("payload").alias("payload_hash"),
            F.octet_length("payload").cast("bigint").alias("_len"),
        )
        .groupBy("payload_hash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.min("media_id").cast("bigint").alias("keep_id"),
            F.min("_len").alias("n_bytes"),
        )
        .select(
            "payload_hash",
            "n_copies",
            "keep_id",
            "n_bytes",
            F.when(F.col("n_copies") > 1, 1)
            .otherwise(0)
            .cast("bigint")
            .alias("is_dup"),
        )
    )


# ---------------- perceptual-hash near-duplicate pairs (banded)

_PHASH_SQL = """
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         CAST(sum(CASE WHEN s_blk * n > tot * c_blk
                       THEN (CAST(1 AS BIGINT) << blk) ELSE 0 END)
              AS BIGINT) AS phash
  FROM (
    SELECT doc_id, blk, n, tot,
           CAST(sum(v) AS BIGINT) AS s_blk,
           CAST(count(*) AS BIGINT) AS c_blk
    FROM (
      SELECT doc_id,
             (CAST(t.i AS BIGINT) - 1) * 16 // length(s) AS blk,
             CAST(length(s) AS BIGINT) AS n,
             CAST(ascii(substr(s, CAST(t.i AS INTEGER), 1)) AS BIGINT) AS v,
             SUM(CAST(ascii(substr(s, CAST(t.i AS INTEGER), 1)) AS BIGINT))
               OVER (PARTITION BY doc_id) AS tot
      FROM (SELECT doc_id,
                   regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g') AS s
            FROM documents) d,
           unnest(range(1, length(s) + 1)) AS t(i)
      WHERE length(s) > 0
    )
    GROUP BY doc_id, blk, n, tot
  )
  GROUP BY doc_id
"""


@query(
    "q_multimodal_phash",
    oracle=f"""
WITH v AS ({_PHASH_SQL}),
b AS (SELECT media_id, kind, phash,
             phash % 256 AS b0, phash // 256 AS b1 FROM v)
SELECT DISTINCT a.media_id AS id1, c.media_id AS id2, a.kind,
       CAST(bit_count(xor(a.phash, c.phash)) AS BIGINT) AS hamming
FROM b a JOIN b c
  ON a.kind = c.kind AND a.media_id < c.media_id
 AND (a.b0 = c.b0 OR a.b1 = c.b1)
WHERE bit_count(xor(a.phash, c.phash)) <= 2
""",
)
def q_multimodal_phash(spark, sf_dir):
    """Perceptual-hash near-duplicate pairs over media payloads — the
    multimodal twin of q_text_simhash: a 16-bit block-mean hash per
    payload (Arrow-batched mapInPandas, operators/multimodal.py
    phash_media), then Hamming-distance <= 2 pairs within a kind via
    band blocking (two 8-bit bands; candidates only form inside a
    shared band — the simhash/LSH device, so the join is bucketed,
    never all-pairs). Approximate by blocking (a pair whose two
    differing bits split across both bands is missed — deterministic,
    and the oracle replays the identical blocking, so the key stays
    hash-checked); hamming <= 1 pairs are guaranteed caught.

    The hash itself is exact integer arithmetic on payload bytes
    (block mean vs global mean as a cross-product compare), so the
    Python batch path and the DuckDB character-position replay agree
    bit-for-bit. On a real deployment the same hash runs on decoded
    luma planes where HAVE_CODECS gates; payload bytes ARE the
    deterministic stand-in this environment supports.

    Scale shape: payloads never shuffle — the hash leaves mapInPandas
    as (id, kind, 16-bit int); the pair graph shuffles 24-byte rows
    on (kind, band); the hash relation is pinned once and reused by
    both band joins (tracked-pin contract)."""
    from hive_similarity_join_spark.operators.cache import pin
    from hive_similarity_join_spark.operators.multimodal import phash_media

    media = synthesize_media(load_table(spark, sf_dir, "documents")).filter(
        F.octet_length("payload") > 0
    )
    v = pin(
        phash_media(media).select(
            "media_id",
            "kind",
            "phash",
            (F.col("phash") % 256).alias("b0"),
            F.expr("phash div 256").alias("b1"),
        )
    )
    a = v.select(
        F.col("media_id").alias("id1"),
        "kind",
        F.col("phash").alias("h1"),
        F.col("b0").alias("a0"),
        F.col("b1").alias("a1"),
    )
    c = v.select(
        F.col("media_id").alias("id2"),
        "kind",
        F.col("phash").alias("h2"),
        F.col("b0").alias("c0"),
        F.col("b1").alias("c1"),
    )
    ham = F.expr("CAST(bit_count(h1 ^ h2) AS BIGINT)")
    pairs = None
    for lft, rgt in (("a0", "c0"), ("a1", "c1")):
        p = (
            a.alias("x")
            .join(
                c.alias("y"),
                (F.col("x.kind") == F.col("y.kind"))
                & (F.col(f"x.{lft}") == F.col(f"y.{rgt}"))
                & (F.col("id1") < F.col("id2")),
            )
            .select(
                "id1",
                "id2",
                F.col("x.kind").alias("kind"),
                ham.alias("hamming"),
            )
            .filter(F.col("hamming") <= 2)
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


def _phash_recall_oracle() -> str:
    from hive_similarity_join_spark.registry import ORACLES

    return f"""
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         md5(regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g')) AS h
  FROM documents
  WHERE octet_length(
            encode(regexp_replace(text, '[^\\x00-\\x7F]', '?', 'g'))) > 0
),
exact AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2
  FROM m a JOIN m b
    ON a.h = b.h AND a.kind = b.kind AND a.doc_id < b.doc_id
),
ph AS (SELECT id1, id2 FROM ({ORACLES["q_multimodal_phash"]})),
ne AS (SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs FROM exact),
np AS (SELECT CAST(count(*) AS BIGINT) AS n_phash_pairs FROM ph),
hits AS (
  SELECT CAST(count(*) AS BIGINT) AS n_hits
  FROM ph p JOIN exact e ON e.id1 = p.id1 AND e.id2 = p.id2
)
SELECT ne.n_exact_pairs, np.n_phash_pairs, h.n_hits,
       CASE WHEN ne.n_exact_pairs = 0 THEN NULL
            ELSE CAST(h.n_hits AS DOUBLE)
                 / CAST(ne.n_exact_pairs AS DOUBLE) END AS recall_exact,
       CASE WHEN np.n_phash_pairs = 0 THEN NULL
            ELSE CAST(np.n_phash_pairs - h.n_hits AS DOUBLE)
                 / CAST(np.n_phash_pairs AS DOUBLE) END AS near_only_frac
FROM ne, np, hits h
"""


@query("q_multimodal_phash_recall", oracle=_phash_recall_oracle())
def q_multimodal_phash_recall(spark, sf_dir):
    """The pHash family's quality row (completes the one-audit-per-
    approximate-family discipline: MinHash -> lsh_recall, SimHash ->
    simhash_recall, embedding-LSH -> threshold_curve, pHash -> this):
    every byte-identical payload pair must surface as a pHash pair —
    identical bytes hash identically, Hamming 0 shares every band, so
    recall_exact is 1.0 BY CONSTRUCTION and this key AUDITS the
    invariant instead of asserting it (a broken band expression or a
    lost pin shows up here as recall < 1, not as a silent miss;
    NULL when the corpus slice carries no byte-identical pair — the
    synthetic sf0.01 slice has none, sf0.1 does).
    near_only_frac reports the share of pHash pairs beyond exact
    duplicates — the near-duplicate surplus the perceptual hash
    exists to find.

    Both generators are composed verbatim from verified keys: pairs
    from q_multimodal_phash's builder, exact-duplicate pairs from the
    same synthesize_media payload hashes q_multimodal_dedup groups on
    (within kind, matching the pair key's blocking). Scale shape: the
    exact side shuffles (hash, kind, id) only — never payload bytes —
    and the audit joins two id-pair relations."""
    media = synthesize_media(load_table(spark, sf_dir, "documents")).filter(
        F.octet_length("payload") > 0
    )
    m = media.select(
        "media_id", "kind", F.md5("payload").alias("h")
    )
    a = m.select(F.col("media_id").alias("id1"), "kind", "h")
    b = m.select(
        F.col("media_id").alias("id2"),
        F.col("kind").alias("kind2"),
        F.col("h").alias("h2"),
    )
    exact = a.join(
        b,
        (F.col("h") == F.col("h2"))
        & (F.col("kind") == F.col("kind2"))
        & (F.col("id1") < F.col("id2")),
    ).select("id1", "id2")
    ph = q_multimodal_phash(spark, sf_dir).select("id1", "id2")
    ne = exact.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact_pairs"))
    np_ = ph.agg(F.count(F.lit(1)).cast("bigint").alias("n_phash_pairs"))
    hits = ph.join(exact, ["id1", "id2"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits")
    )
    return (
        ne.crossJoin(np_)
        .crossJoin(hits)
        .select(
            "n_exact_pairs",
            "n_phash_pairs",
            "n_hits",
            F.when(
                F.col("n_exact_pairs") == 0, F.lit(None).cast("double")
            ).otherwise(
                F.col("n_hits").cast("double")
                / F.col("n_exact_pairs").cast("double")
            ).alias("recall_exact"),
            F.when(
                F.col("n_phash_pairs") == 0, F.lit(None).cast("double")
            ).otherwise(
                (F.col("n_phash_pairs") - F.col("n_hits")).cast("double")
                / F.col("n_phash_pairs").cast("double")
            ).alias("near_only_frac"),
        )
    )
