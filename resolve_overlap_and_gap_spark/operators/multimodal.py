"""Multimodal columns: image/audio/video payloads as opaque binary columns
with typed metadata (training-data pipeline addition).

The Spark-side plumbing — schema, Arrow batch shape, mapInPandas iterator
contract, partition sizing — is real and tested; the actual codec calls are
STUBBED behind `_decode_image_stub` (image/audio libs are not in this
container): the stub parses our deterministic fake header instead of
invoking a codec, and raises NotImplementedError for real formats, exactly
where a PIL/ffmpeg call would slot in.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# deterministic fake format: b'FAKEIMG!' + u32 width + u32 height + u8 chan
_MAGIC = b"FAKEIMG!"
_HDR_FMT = "<8sIIB"
_HDR_SIZE = struct.calcsize(_HDR_FMT)

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta_w", T.IntegerType()),
    T.StructField("meta_h", T.IntegerType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("mean_byte", T.DoubleType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def synthesize_media(spark: SparkSession, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table (payload = fake header + seeded bytes),
    generated JVM-side except the payload bytes (Arrow-batched)."""
    base = spark.range(0, n, 1, partitions).select(
        F.col("id").alias("media_id"),
        F.lit("image").alias("kind"),
        (F.pmod(F.col("id") * 37, F.lit(64)) + 16).cast("int").alias("meta_w"),
        (F.pmod(F.col("id") * 53, F.lit(64)) + 16).cast("int").alias("meta_h"),
    )

    @F.pandas_udf(T.BinaryType())
    def payload(mid: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
        out = []
        for m, ww, hh in zip(mid, w, h):
            hdr = struct.pack(_HDR_FMT, _MAGIC, int(ww), int(hh), 3)
            rng = np.random.default_rng(int(m))
            out.append(hdr + rng.integers(0, 256, int(ww) * int(hh) * 3, dtype=np.uint8).tobytes())
        return pd.Series(out)

    return base.withColumn("payload", payload("media_id", "meta_w", "meta_h"))


def _decode_image_stub(buf: bytes) -> np.ndarray:
    """Decode stub: real formats (PNG/JPEG/...) would call the codec here."""
    if buf[:8] != _MAGIC:
        raise NotImplementedError(
            "real image codecs unavailable in this container; plug PIL/cv2 here"
        )
    _, w, h, c = struct.unpack_from(_HDR_FMT, buf, 0)
    arr = np.frombuffer(buf, dtype=np.uint8, offset=_HDR_SIZE, count=w * h * c)
    return arr.reshape(h, w, c)


def extract_features(media: DataFrame, grid: int = 4) -> DataFrame:
    """Decode + pooled-feature extraction over mapInPandas: iterator of Arrow
    batches in, iterator out — the scale-path shape (no per-row Python at
    the Spark level; numpy vectorization inside the batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                img = _decode_image_stub(bytes(buf))
                h, w, c = img.shape
                # grid-pooled mean feature (the resize/pool stand-in)
                ys = np.linspace(0, h, grid + 1).astype(int)
                xs = np.linspace(0, w, grid + 1).astype(int)
                feat = np.array([
                    img[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
                    for i in range(grid) for j in range(grid)
                ], dtype=np.float32) / 255.0
                rows.append((int(mid), w, h, c, float(img.mean()), feat.tolist()))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "channels",
                               "mean_byte", "feature"],
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: here each media row
    'samples' its rows of pixels as frames (stand-in for ffmpeg seek);
    demonstrates the explode-to-frames partition shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                img = _decode_image_stub(bytes(buf))
                for fi in range(0, img.shape[0], every):
                    rows.append((int(mid), fi, float(img[fi].mean())))
            yield pd.DataFrame(rows, columns=["media_id", "frame", "mean_byte"])

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ])
    return media.mapInPandas(run, schema)
