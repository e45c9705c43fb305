"""Multimodal plumbing tests: schema shape, deterministic fake decode,
real byte features, frame sampling, and the NotImplementedError gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_similarity_join_spark.operators.multimodal import (
    byte_histogram_features,
    decode_media,
    frame_sample,
    synthesize_media,
)
from hive_similarity_join_spark.sources.loader import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(load_table(spark, SF_SMOKE, "documents"))


def test_media_schema(media):
    d = dict(media.dtypes)
    assert d["payload"] == "binary"
    assert d["meta"].startswith("struct<source:string,declared_len:bigint")


def test_fake_decode_deterministic(media):
    a = decode_media(media, fake=True).orderBy("media_id").limit(5).collect()
    b = decode_media(media, fake=True).orderBy("media_id").limit(5).collect()
    assert a == b
    assert all(r.n_bytes > 0 and 1 <= r.width <= 640 for r in a)


def test_real_decode_gated(media, spark):
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        decode_media(media, fake=False).count()


def test_byte_features_are_distributions(media):
    rows = byte_histogram_features(media).limit(10).collect()
    for r in rows:
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-3


def test_frame_sample_counts(media):
    got = frame_sample(media, every_n_bytes=64)
    joined = (
        got.groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("frames"))
        .join(media.select("media_id", F.octet_length("payload").alias("nb")), "media_id")
    )
    for r in joined.collect():
        assert r.frames == (max(r.nb - 1, 0) // 64) + 1


def test_resize_payload_lengths_and_determinism(media):
    from hive_similarity_join_spark.operators.multimodal import resize_media

    a = resize_media(media, target_w=8, target_h=4).orderBy("media_id").limit(10).collect()
    b = resize_media(media, target_w=8, target_h=4).orderBy("media_id").limit(10).collect()
    assert a == b
    for r in a:
        assert r.target_w == 8 and r.target_h == 4
        assert len(r.payload) == 8 * 4  # resampled to exactly w*h bytes


def test_non_ascii_text_stays_oracle_exact(spark, tmp_path):
    """The multimodal oracles index the payload by CHARACTER position in
    DuckDB, which is only byte-exact because synthesize_media projects
    text to pure ASCII ('?' per non-ASCII codepoint) and every oracle
    mirrors the projection. Feed a corpus with multi-byte codepoints
    through all five keys against their real oracles to pin that."""
    import duckdb
    import pandas as pd

    from hive_similarity_join_spark.registry import ORACLES, QUERIES, load_registry
    from tools.selfcheck import compare

    load_registry()
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "text": [
                "plain ascii text",
                "héllo wörld",          # 2-byte codepoints
                "✓ checkmark — dash",    # 3-byte codepoints
                "emoji \U0001f600 4-byte",         # 4-byte codepoint
                "mixed ß中文 tail",
                "",
            ],
            "lang": ["en"] * 6,
            "source": ["t"] * 6,
            "n_chars": [16, 11, 22, 14, 16, 0],
        }
    )
    sf_dir = str(tmp_path)
    docs.to_parquet(tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    keys = [
        "q_multimodal_bytes",
        "q_multimodal_decode",
        "q_multimodal_features",
        "q_multimodal_frames",
        "q_multimodal_resize",
    ]
    for key in keys:
        sdf = QUERIES[key](spark, sf_dir).toPandas()
        ddf = con.execute(ORACLES[key]).fetchdf()
        assert not compare(sdf, ddf), f"{key} diverged on non-ASCII corpus"
