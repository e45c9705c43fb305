"""Multimodal query keys: binary payload handling with a SQL oracle for
the byte-level parts; decode/features are Pandas-UDF plumbing checked
rows-only (DuckDB can't run pandas UDFs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_similarity_join_spark.operators.multimodal import (
    byte_histogram_features,
    decode_media,
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
