"""Multimodal (image/audio/video) column plumbing (EXT).

Media are opaque ``binary`` payload columns + typed metadata structs;
per-item compute runs as Arrow-batched ``mapInPandas`` / ``pandas_udf``
(the sanctioned Python escape hatch — whole batches cross the JVM/Python
boundary once, never row-at-a-time).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
``decode`` is STUBBED behind ``HAVE_CODECS``: with codecs absent it
raises ``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic fake decode (dimensions derived from payload bytes) so the
Spark-side plumbing — schema, batch shapes, partitioning, UDF
signatures — is fully real and testable. Byte-level operators
(histogram features, chunking) do real work on real bytes.

Scale notes: payloads never pass through a shuffle in these operators —
all are map-side (mapInPandas / project); join metadata first, fetch
payload columns late (Parquet column pruning keeps un-projected binary
out of I/O entirely). Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — size it so
(records x payload) fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HAVE_CODECS = False  # real image/audio decoding unavailable in this env

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("declared_len", T.LongType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Build a media table from documents (demo source): payload =
    utf-8 bytes of text, kind cycles by doc_id, metadata typed.

    Text is projected to pure ASCII first (non-ASCII codepoints -> '?',
    one per codepoint, mirrored in every multimodal oracle): byte-level
    oracles index the payload by CHARACTER position in DuckDB, which is
    only byte-exact when char position == byte position. The projection
    is the identity on ASCII corpora and keeps the keys deterministic if
    a regenerated corpus ever carries non-ASCII text."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.regexp_replace("text", r"[^\x00-\x7F]", "?"), "UTF-8").alias(
            "payload"
        ),
        F.struct(
            F.col("source").alias("source"),
            F.col("n_chars").alias("declared_len"),
        ).alias("meta"),
    )


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode payloads to (width, height, n_bytes) via mapInPandas.

    With real codecs absent, ``fake=True`` derives deterministic fake
    dimensions from payload length (the plumbing under test); otherwise
    raises NotImplementedError exactly where a codec call would go.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake and not HAVE_CODECS:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; not in this env"
                )
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n % 480 + 1).astype("int32"),
                    "n_bytes": n.astype("int64"),
                }
            )

    return media.mapInPandas(batches, DECODED_SCHEMA)


BYTE_FEATURES_DIM = 16


def byte_histogram_features(media: DataFrame, normalized: bool = True) -> DataFrame:
    """Real byte-level feature extraction: 16-bin byte histogram as
    array<float> (the shape an embedding model would produce), via an
    Arrow-batched scalar pandas_udf. ``normalized=False`` returns raw
    integer bin counts (exact — the oracle-checkable form; bin =
    byte // 16, matching np.histogram's uniform [0,256) edges)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.FloatType()))
    def hist(payload: pd.Series) -> pd.Series:
        def one(b: bytes):
            arr = np.frombuffer(b, dtype=np.uint8)
            if arr.size == 0:
                return np.zeros(BYTE_FEATURES_DIM, dtype=np.float32)
            h, _ = np.histogram(arr, bins=BYTE_FEATURES_DIM, range=(0, 256))
            if not normalized:
                return h.astype(np.float32)
            return (h / arr.size).astype(np.float32)

        return payload.map(one)

    return media.withColumn("features", hist(F.col("payload")))


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("target_w", T.IntegerType()),
        T.StructField("target_h", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_media(media: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Resize plumbing via mapInPandas: with codecs absent the 'resample'
    is a deterministic byte-stride subsample to target_w*target_h bytes
    (REAL byte work with the exact batch shape a PIL/ffmpeg resize would
    have; the codec call slots into the marked line)."""
    import numpy as np

    n_out = target_w * target_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def one(b: bytes) -> bytes:
                if not HAVE_CODECS:
                    # <- real decode+resample goes here when codecs exist
                    arr = np.frombuffer(b, dtype=np.uint8)
                    if arr.size == 0:
                        return bytes(n_out)
                    idx = (np.arange(n_out) * arr.size) // n_out
                    return arr[idx].tobytes()
                raise NotImplementedError

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "target_w": target_w,
                    "target_h": target_h,
                    "payload": pdf["payload"].map(one),
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame sampling plumbing: for video payloads, emit one row per
    sampled 'frame' (byte offset stride stands in for time stride).
    Native explode of a computed offsets array — no Python needed for
    the expansion itself."""
    offsets = F.sequence(
        F.lit(0), F.greatest(F.octet_length("payload") - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(offsets).alias("frame_offset"))
    )


PHASH_BLOCKS = 16


def phash_media(media: DataFrame) -> DataFrame:
    """Block-mean perceptual hash per payload (Arrow-batched
    mapInPandas): byte position p joins block ``p * 16 // n``, bit k
    is set iff block k's byte mean exceeds the payload's global mean —
    compared as the exact integer cross-product ``sum_k * n > total *
    len_k``, so the hash is deterministic and engine-portable (the
    DuckDB oracle replays the identical arithmetic over character
    positions of the ASCII-projected text). On real images this is
    the classic aHash/pHash family (block means of pixel luma); here
    it runs on the raw payload bytes, which is exactly what it would
    do after a real decode-to-luma step slots in where HAVE_CODECS
    gates."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("phash", T.LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = []
            for payload in pdf["payload"]:
                b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n = len(b)
                h = 0
                if n:
                    tot = int(b.sum())
                    blk = np.arange(n, dtype=np.int64) * PHASH_BLOCKS // n
                    # int64 accumulation (ADVICE r10): bincount(weights=)
                    # sums in float64, whose 2^53 mantissa would silently
                    # break the exact-integer cross-product compare on
                    # multi-PB payloads; np.add.at on an int64 buffer is
                    # exact for any payload that fits in memory.
                    sums = np.zeros(PHASH_BLOCKS, dtype=np.int64)
                    np.add.at(sums, blk, b)
                    lens = np.bincount(blk, minlength=PHASH_BLOCKS)
                    for k in range(PHASH_BLOCKS):
                        if lens[k] and int(sums[k]) * n > tot * int(lens[k]):
                            h |= 1 << k
                hashes.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return media.mapInPandas(batches, out_schema)
