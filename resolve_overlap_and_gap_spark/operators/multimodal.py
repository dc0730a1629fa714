"""Multimodal columns: image/audio/video payloads as opaque binary columns
with typed metadata (training-data pipeline addition).

The Spark-side plumbing — schema, Arrow batch shape, mapInPandas iterator
contract, partition sizing — is real and tested.  PNG (the most common
crawl image format) decodes for REAL via a stdlib-only decoder below
(zlib inflate + scanline unfiltering incl. Paeth; 8-bit gray/GA/RGB/RGBA,
non-interlaced) — no PIL/cv2 needed.  JPEG/video and exotic PNG variants
(16-bit, palette, interlaced) still raise NotImplementedError at the
`_decode_image` boundary, exactly where a PIL/ffmpeg call would slot in;
the deterministic FAKEIMG format remains for plumbing tests.
"""

from __future__ import annotations

import struct
import zlib
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

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}   # color type -> samples/pixel
_PNG_COLOR = {1: 0, 2: 4, 3: 2, 4: 6}      # channels -> color type


def _filter_row(row: np.ndarray, prev: np.ndarray, ft: int, c: int) -> np.ndarray:
    """Forward scanline filter (PNG spec §6) for the encoder: row/prev are
    uint8 (stride,); returns the filtered uint8 row."""
    r = row.astype(np.int32)
    up = prev.astype(np.int32)
    left = np.zeros_like(r)
    left[c:] = r[:-c]
    ul = np.zeros_like(r)
    ul[c:] = up[:-c]
    if ft == 0:
        return row
    if ft == 1:
        return ((r - left) & 0xFF).astype(np.uint8)
    if ft == 2:
        return ((r - up) & 0xFF).astype(np.uint8)
    if ft == 3:
        return ((r - ((left + up) >> 1)) & 0xFF).astype(np.uint8)
    pa = np.abs(up - ul)
    pb = np.abs(left - ul)
    pc = np.abs(left + up - 2 * ul)
    pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
    return ((r - pred) & 0xFF).astype(np.uint8)


def encode_png(img: np.ndarray, row_filters: int | str = 0) -> bytes:
    """Minimal PNG writer (8-bit, single IDAT): enough to synthesize real
    crawl-like payloads in tests and fixtures without an imaging library.

    row_filters: a fixed filter type 0-4 for every row, or 'cycle' — row y
    uses filter y % 5, so one image exercises every unfilter path (real
    crawl PNGs are mostly Paeth/adaptive-filtered; fixtures must pay the
    same decode cost the wild pays)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = _PNG_COLOR[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    stride = w * c
    flat = img.reshape(h, stride)
    prev = np.zeros(stride, np.uint8)
    parts = []
    for y in range(h):
        ft = (y % 5) if row_filters == "cycle" else int(row_filters)
        parts.append(bytes([ft]) + _filter_row(flat[y], prev, ft, c).tobytes())
        prev = flat[y]
    raw = b"".join(parts)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def _decode_png(buf: bytes) -> np.ndarray:
    """Stdlib PNG decoder: IHDR/IDAT walk, zlib inflate, inverse scanline
    filters 0-4 (None/Sub/Up/Average/Paeth, PNG spec §6).  Supports 8-bit
    gray / gray+alpha / RGB / RGBA, non-interlaced; everything else raises
    NotImplementedError (the documented codec boundary)."""
    if buf[:8] != PNG_SIG:
        raise ValueError("not a PNG stream")
    pos, idat = 8, []
    w = h = depth = color = interlace = None
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # length + tag + data + crc
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    c = _PNG_CHANNELS.get(color)
    if w is None or depth != 8 or c is None or interlace != 0:
        raise NotImplementedError(
            f"PNG variant unsupported by the stdlib decoder "
            f"(depth={depth}, color={color}, interlace={interlace})")
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    fts = arr[:, 0].astype(np.int64)
    if fts.max(initial=0) > 4:
        raise NotImplementedError(f"PNG filter type {int(fts.max())}")
    data = arr[:, 1:]
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    y = 0
    while y < h:
        ft = int(fts[y])
        if ft >= 3:
            # Average/Paeth depend on the decoded LEFT neighbor — a naive
            # unfilter is a per-byte Python loop (the scale-killer flagged
            # in round 3).  Both filters share the dependency stencil
            # (r,p-1),(r-1,p),(r-1,p-1), so a maximal run of 3/4-filtered
            # rows decodes as an ANTIDIAGONAL WAVEFRONT: R+W-1 numpy steps
            # for an R x W block instead of R*W*c Python iterations.
            y2 = y + 1
            while y2 < h and fts[y2] >= 3:
                y2 += 1
            block = _unfilter_wavefront(
                data[y:y2].astype(np.int32), fts[y:y2], prev, c)
            out[y:y2] = block
            prev = block[-1].astype(np.int32)
            y = y2
            continue
        row = data[y].astype(np.int32)
        if ft == 1:      # Sub: prefix sum per channel lane (mod-256 is
            # associative, so one cumsum then mask is exact; int64 to
            # avoid overflow on very wide rows)
            row = np.cumsum(row.reshape(w, c), axis=0,
                            dtype=np.int64).reshape(stride) & 0xFF
        elif ft == 2:    # Up
            row = (row + prev) & 0xFF
        out[y] = row
        prev = out[y].astype(np.int32)
        y += 1
    return out.reshape(h, w, c)


def _unfilter_wavefront(block: np.ndarray, fts: np.ndarray,
                        prev: np.ndarray, c: int) -> np.ndarray:
    """Inverse Average(3)/Paeth(4) filters for a run of consecutive rows,
    vectorized over antidiagonals: cell (row r, pixel p) depends only on
    cells with smaller r+p, so each diagonal decodes in one numpy step
    (every channel lane is an independent recurrence).  block: (R, stride)
    int32 filtered bytes; fts: (R,) per-row filter ids; prev: (stride,)
    decoded predecessor row (zeros at image top)."""
    R, stride = block.shape
    W = stride // c
    b3 = block.reshape(R, W, c)
    # padded decode buffer: row 0 = the predecessor row, col 0 = zeros
    # (PNG treats bytes left of the row start as 0)
    out = np.zeros((R + 1, W + 1, c), np.int32)
    out[0, 1:] = prev.reshape(W, c)
    is_avg = (fts == 3)
    for d in range(R + W - 1):
        r0 = max(0, d - W + 1)
        rs = np.arange(r0, min(R - 1, d) + 1)
        ps = d - rs
        a = out[rs + 1, ps]    # decoded left
        b = out[rs, ps + 1]    # decoded up
        cc = out[rs, ps]       # decoded upper-left
        pa = np.abs(b - cc)
        pb = np.abs(a - cc)
        pc = np.abs(a + b - 2 * cc)
        paeth = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, cc))
        pred = np.where(is_avg[rs][:, None], (a + b) >> 1, paeth)
        out[rs + 1, ps + 1] = (b3[rs, ps] + pred) & 0xFF
    return out[1:, 1:].reshape(R, stride).astype(np.uint8)

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


def synthesize_media(spark: SparkSession, n: int, partitions: int = 8,
                     fmt: str = "mixed", content: str = "noise") -> DataFrame:
    """Deterministic media table with seeded pixels, generated JVM-side
    except the payload bytes (Arrow-batched).  fmt: 'fake' (raw header +
    bytes), 'png' (real PNG streams through encode_png), or 'mixed'
    (odd media_ids PNG, even fake — the default, so every pipeline over
    this table exercises the real decoder and the plumbing format).

    content: 'noise' (seeded RNG pixels) or 'gradient' — pixel value
    x + y + (media_id % 96), identical channels; never wraps mod 256 at
    the 16-80 px sizes, so the decoded image MEAN has the closed form
    (w-1)/2 + (h-1)/2 + media_id % 96 and the whole encode -> decode ->
    feature pipeline becomes SQL-oracle-comparable (multimodal_invariants)
    while still exercising non-trivial Sub/Up/Average/Paeth filters."""
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
            ww, hh = int(ww), int(hh)
            if content == "gradient":
                g = (np.arange(hh, dtype=np.int32)[:, None]
                     + np.arange(ww, dtype=np.int32)[None, :]
                     + int(m) % 96).astype(np.uint8)
                px = np.repeat(g[:, :, None], 3, axis=2)
            else:
                rng = np.random.default_rng(int(m))
                px = rng.integers(0, 256, (hh, ww, 3), dtype=np.uint8)
            if fmt == "png" or (fmt == "mixed" and int(m) % 2 == 1):
                # per-IMAGE filter 0-4 (media_id % 5): the corpus exercises
                # every unfilter path incl. Average/Paeth, matching real
                # crawl PNGs (photographic content is typically one filter
                # for the whole image — the wavefront's long-run case)
                out.append(encode_png(px, row_filters=int(m) % 5))
            else:
                hdr = struct.pack(_HDR_FMT, _MAGIC, ww, hh, 3)
                out.append(hdr + px.tobytes())
        return pd.Series(out)

    return base.withColumn("payload", payload("media_id", "meta_w", "meta_h"))


def _decode_image(buf: bytes) -> np.ndarray:
    """Format sniff + decode: real PNG via the stdlib decoder, FAKEIMG via
    the header parse; JPEG/video/etc. raise at this boundary (plug
    PIL/ffmpeg here when the environment has them)."""
    if buf[:8] == PNG_SIG:
        return _decode_png(buf)
    if buf[:8] == _MAGIC:
        _, w, h, c = struct.unpack_from(_HDR_FMT, buf, 0)
        arr = np.frombuffer(buf, dtype=np.uint8, offset=_HDR_SIZE, count=w * h * c)
        return arr.reshape(h, w, c)
    raise NotImplementedError(
        "unsupported media format (JPEG/video need PIL/ffmpeg; plug them here)"
    )




def extract_features(media: DataFrame, grid: int = 4) -> DataFrame:
    """Decode + pooled-feature extraction over mapInPandas: iterator of Arrow
    batches in, iterator out — the scale-path shape (no per-row Python at
    the Spark level; numpy vectorization inside the batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                img = _decode_image(bytes(buf))
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
                img = _decode_image(bytes(buf))
                for fi in range(0, img.shape[0], every):
                    rows.append((int(mid), fi, float(img[fi].mean())))
            yield pd.DataFrame(rows, columns=["media_id", "frame", "mean_byte"])

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ])
    return media.mapInPandas(run, schema)
