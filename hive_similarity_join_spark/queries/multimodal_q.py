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
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_hash
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


@query("q_multimodal_decode")  # mapInPandas -> rows-only check
def q_multimodal_decode(spark, sf_dir):
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return decode_media(media, fake=True)


@query("q_multimodal_features")  # pandas_udf -> rows-only check
def q_multimodal_features(spark, sf_dir):
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return byte_histogram_features(media).select(
        "media_id", F.size("features").alias("dim"), "features"
    )


@query(
    "q_multimodal_frames",
    oracle="""
SELECT doc_id AS media_id,
       CAST(t.o AS BIGINT) AS frame_offset
FROM documents, unnest(range(0, octet_length(encode(text)), 64)) AS t(o)
WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0
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


@query("q_multimodal_resize")  # mapInPandas -> rows-only check
def q_multimodal_resize(spark, sf_dir):
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return resize_media(media, target_w=32, target_h=32).select(
        "media_id",
        "kind",
        "target_w",
        "target_h",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
    )
