"""Baseline JFIF/JPEG codec (stdlib + numpy — no PIL/libjpeg).

Real crawl media is mostly JPEG; round 3 left it behind a
NotImplementedError.  This module implements the baseline sequential-DCT
process from the public JPEG standard (ITU-T T.81): 8x8 orthonormal DCT,
Annex K quantization + Huffman tables (quality-scaled with the familiar
5000/Q | 200-2Q rule), canonical Huffman coding with byte stuffing,
4:4:4 / 4:2:2 / 4:2:0 chroma sampling (box-mean downsample on encode,
replication upsample on decode) and restart intervals (DRI + RSTn).

Scale shape — two entropy-decode paths:

* scalar: a 16-bit-peek LUT walk (a few int ops per symbol — the same
  structure every native decoder has), used for streams that decode as a
  single sequential chain (no/few restart markers).
* vectorized: restart segments are independent decode chains with known
  byte-aligned starts, so ALL segments — across every image of an Arrow
  batch at once (`decode_jpeg_batch`) — advance one symbol per numpy
  step as parallel cursors: one windowed-bits gather, one stacked-LUT
  gather, vectorized sign-extension and scatter into a single flat
  coefficient buffer.  Per-symbol Python disappears; the step count is
  the symbol count of the BUSIEST segment, not the sum.

Everything per-BLOCK was already vectorized: forward/inverse DCT are two
einsum contractions over the (n_blocks, 8, 8) stack, quantization and the
YCbCr<->RGB transforms are whole-array numpy.  Inside extract_features
this runs per Arrow batch under mapInPandas, so executors decode many
images per Python round-trip and the batch decoder sees thousands of
cursors even when individual images are small.

Progressive JPEG (SOF2, T.81 Annex G) is supported on both sides: the
encoder emits a libjpeg-style scan script (Al=1 DC scan, split-band
Al-shifted AC first scans, then DC/AC refinement scans to Al=0) and the
decoder assembles any conforming scan sequence — DC/AC first and
refinement scans, EOB-run skips (EOBn), per-scan restart intervals, and
between-scan DHT/DRI redefinition.  All scans present means successive
approximation is lossless: progressive and baseline encodings of the
same image decode bit-identically.  The multi-scan decode is inherently
sequential per image (symbols depend on coefficient state from earlier
scans), so it runs on the scalar LUT reader; the vectorized cursor
fleet covers the baseline streams in a batch.

Boundary: 12-bit precision, arithmetic coding, hierarchical (SOF5-7,
13-15), lossless (SOF3/11) and 16-bit quant tables raise
NotImplementedError — parse-level rejection, not silent corruption.
The encoder emits none of those.
"""

from __future__ import annotations

import re
import struct
from functools import lru_cache

import numpy as np

# ---------------------------------------------------------------- tables
# Annex K.1 / K.2 quantization tables (luminance / chrominance)
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# zigzag scan: position k in the scan -> row-major index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.3 Huffman tables: (counts per code length 1..16, symbol list)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROM = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8-point DCT-II matrix
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(1.0 / 8.0) if _u == 0 else np.sqrt(2.0 / 8.0)
    _C[_u] = _a * np.cos((2 * np.arange(8) + 1) * _u * np.pi / 16.0)

# luma (h, v) sampling factors per mode; chroma is always (1, 1)
_SAMPLING = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _canonical_codes(counts, symbols):
    """Canonical Huffman assignment (T.81 C.2): -> {symbol: (code, len)}."""
    out, code = {}, 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_tables(counts, symbols):
    """Flat 16-bit-peek LUT for the scalar decoder (the classic fast path
    built from T.81 F.16's canonical ordering): entry[peek16] =
    (len << 8) | sym for every 16-bit window whose prefix is the code;
    0 = invalid prefix.  Cached on the table bytes: real encoders (ours
    included) reuse the Annex K tables, so a decode fleet builds each
    64 K-entry list once per process, not per image."""
    return _decode_tables_cached(bytes(counts), bytes(symbols))


@lru_cache(maxsize=64)
def _decode_tables_cached(counts: bytes, symbols: bytes):
    return _decode_tables_np(counts, symbols).tolist()


@lru_cache(maxsize=64)
def _decode_tables_np(counts: bytes, symbols: bytes) -> np.ndarray:
    """numpy int32 variant of the 16-bit-peek LUT (the vectorized decoder
    gathers from stacked copies of these)."""
    lut = np.zeros(1 << 16, np.int32)
    code, k = 0, 0
    for ln in range(1, 17):
        span = 1 << (16 - ln)
        for _ in range(counts[ln - 1]):
            base = code << (16 - ln)
            lut[base:base + span] = (ln << 8) | symbols[k]
            code += 1
            k += 1
        code <<= 1
    return lut


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)   # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # pad with 1s per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(h, w) -> (n_blocks, 8, 8) in raster order; h, w multiples of 8."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _seg(marker: int, body: bytes) -> bytes:
    """One marker segment: marker, 2-byte length (incl. itself), body —
    shared by the baseline and progressive emitters."""
    return struct.pack(">HH", marker, len(body) + 2) + body


# ---------------------------------------------------------------- encoder

def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsampling: str = "444",
                restart_interval: "int | str | None" = None,
                progressive: bool = False,
                eob_runs: bool = False) -> bytes:
    """JFIF encoder: 8-bit gray (h,w)/(h,w,1) or RGB (h,w,3),
    Annex K tables scaled by `quality`.

    subsampling: '444' (one block per component per MCU — the historical
    default, byte-identical to round-4 output), '422' or '420' (luma
    sampling factors 2x1 / 2x2, chroma box-mean-downsampled — the
    dominant wild-crawl layout).  Ignored for grayscale input.

    restart_interval: None (no DRI/RSTn — single entropy chain), an int
    (MCUs per restart interval), or 'row' (one interval per MCU row —
    the common libjpeg error-resilience setting).  Restart markers make
    segments independently decodable, which is what the vectorized batch
    decoder parallelizes over.

    progressive=True emits the progressive-DCT process (SOF2, T.81
    Annex G) with the standard libjpeg-style scan script: an Al=1 DC
    scan, split-band Al-shifted AC first scans per component, then one
    DC and per-component AC refinement scans down to Al=0.  All scans
    are present, so the transmitted quantized coefficients are IDENTICAL
    to the baseline encoding of the same image — decode(progressive) is
    bit-exact with decode(baseline) at the same quality/subsampling.
    restart_interval applies per scan (DC scans count MCUs,
    non-interleaved AC scans count that component's blocks, per T.81).

    eob_runs=True additionally codes end-of-band RUNS (EOBn symbols,
    G.1.2.2) instead of one EOB per block; the Annex K AC tables carry
    no EOBn symbols, so this mode emits flat custom Huffman tables —
    it exists to exercise the wild-stream decoder paths (EOBn skips,
    buffered correction bits, non-standard DHT)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    gray = img.ndim == 2
    h, w = img.shape[:2]
    hs, vs = (1, 1) if gray else _SAMPLING[subsampling]
    mw, mh = 8 * hs, 8 * vs             # MCU size in luma pixels
    ph, pw = -(-h // mh) * mh, -(-w // mw) * mw
    if gray:
        planes = [np.pad(img.astype(np.float64),
                         ((0, ph - h), (0, pw - w)), mode="edge")]
        samp = [(1, 1)]
    else:
        x = img.astype(np.float64)
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        pads = ((0, ph - h), (0, pw - w))
        y = np.pad(y, pads, mode="edge")
        cb = np.pad(cb, pads, mode="edge")
        cr = np.pad(cr, pads, mode="edge")
        if (hs, vs) != (1, 1):
            # box-mean chroma downsample on the padded plane (dims are
            # multiples of 8*hs x 8*vs, so the result is block-aligned)
            cb = cb.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))
            cr = cr.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))
        planes = [y, cb, cr]
        samp = [(hs, vs), (1, 1), (1, 1)]
    qts = [_scaled_qt(QT_LUM, quality), _scaled_qt(QT_CHROM, quality)]
    qt_of = [0] if gray else [0, 1, 1]
    mcux, mcuy = pw // mw, ph // mh
    nmcu = mcux * mcuy
    # per-component quantized zigzag coefficients, vectorized per block,
    # in component-raster block order; bw_i columns of blocks
    coefs, bws = [], []
    for ci, plane in enumerate(planes):
        blocks = _blocks_of(plane) - 128.0
        # batched BLAS matmul: C @ block @ C.T per block (measured ~17x
        # faster than the equivalent einsum contraction on 4k blocks)
        dct = (_C[None] @ blocks) @ _C.T
        q = qts[qt_of[ci]].reshape(8, 8).astype(np.float64)
        qz = np.round(dct / q).astype(np.int32).reshape(-1, 64)[:, ZIGZAG]
        coefs.append(qz)
        bws.append(plane.shape[1] // 8)

    dc_tbl = [_canonical_codes(*DC_LUM), _canonical_codes(*DC_CHROM)]
    ac_tbl = [_canonical_codes(*AC_LUM), _canonical_codes(*AC_CHROM)]
    t_of = [0] if gray else [0, 1, 1]
    ri = mcux if restart_interval == "row" else (restart_interval or 0)
    ri = int(ri)
    if progressive:
        return _emit_progressive(h, w, gray, samp, qt_of, t_of, qts,
                                 coefs, bws, mcux, mcuy, ri, eob_runs)

    scan = bytearray()
    bw_ = _BitWriter()
    prev_dc = [0] * len(planes)
    rst = 0

    def emit_block(block, dct_, act_, prev):
        diff = int(block[0]) - prev
        s, bits = _magnitude(diff)
        code, ln = dct_[s]
        bw_.write(code, ln)
        if s:
            bw_.write(bits, s)
        run = 0
        nz = np.nonzero(block[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(block[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = act_[0xF0]
                bw_.write(code, ln)
                run -= 16
            s, bits = _magnitude(v)
            code, ln = act_[(run << 4) | s]
            bw_.write(code, ln)
            bw_.write(bits, s)
            run = 0
        if last < 63:
            code, ln = act_[0x00]   # EOB
            bw_.write(code, ln)
        return int(block[0])

    for m in range(nmcu):
        if ri and m and m % ri == 0:
            bw_.flush()
            scan += bw_.buf
            scan += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            bw_ = _BitWriter()
            prev_dc = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci, (hi, vi) in enumerate(samp):
            for by in range(vi):
                for bx in range(hi):
                    idx = (my * vi + by) * bws[ci] + mx * hi + bx
                    prev_dc[ci] = emit_block(
                        coefs[ci][idx], dc_tbl[t_of[ci]], ac_tbl[t_of[ci]],
                        prev_dc[ci])
    bw_.flush()
    scan += bw_.buf

    ncomp = len(planes)
    out = [b"\xff\xd8"]
    out.append(_seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    dqt = b"\x00" + bytes(int(v) for v in qts[0][ZIGZAG])
    if not gray:
        dqt += b"\x01" + bytes(int(v) for v in qts[1][ZIGZAG])
    out.append(_seg(0xFFDB, dqt))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, qt_of[ci]])
    out.append(_seg(0xFFC0, sof))
    dht = b""
    for tc, th, (counts, syms) in (
        [(0, 0, DC_LUM), (1, 0, AC_LUM)] if gray
        else [(0, 0, DC_LUM), (1, 0, AC_LUM), (0, 1, DC_CHROM), (1, 1, AC_CHROM)]
    ):
        dht += bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms)
    out.append(_seg(0xFFC4, dht))
    if ri:
        out.append(_seg(0xFFDD, struct.pack(">H", ri)))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = t_of[ci]
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out.append(_seg(0xFFDA, sos))
    out.append(bytes(scan))
    out.append(b"\xff\xd9")
    return b"".join(out)


# ------------------------------------------------- progressive encoder

# AC symbol set for eob_runs mode: every run/size (s 1..10), EOBn for
# r <= 14 (G.1.2.2 — 0x00 is EOB1), and ZRL, all at one 8-bit code
# length (176 symbols < 255, so the all-ones code stays reserved)
_AC_FLAT = ([0] * 7 + [176] + [0] * 8,
            sorted([(r << 4) | s for r in range(16) for s in range(1, 11)]
                   + [r << 4 for r in range(15)] + [0xF0]))


def _emit_progressive(h, w, gray, samp, qt_of, t_of, qts, coefs, bws,
                      mcux, mcuy, ri, eob_runs):
    """Assemble a progressive (SOF2, T.81 Annex G) stream from the SAME
    quantized zigzag coefficients the baseline writer consumes.  With
    every refinement scan present, successive approximation is lossless:
    the decoder reconstructs identical coefficients, so progressive and
    baseline encodings of one image decode bit-exactly equal."""
    ncomp = len(samp)
    hmax = max(s_[0] for s_ in samp)
    vmax = max(s_[1] for s_ in samp)
    ac_raw = [_AC_FLAT, _AC_FLAT] if eob_runs else [AC_LUM, AC_CHROM]
    dc_tbl = [_canonical_codes(*DC_LUM), _canonical_codes(*DC_CHROM)]
    ac_tbl = [_canonical_codes(*t) for t in ac_raw]
    # true (unpadded) block grid per component (T.81 A.1.1 dims) — AC
    # scans are non-interleaved and never code the MCU padding blocks
    tbw = [-(- -(-w * hi // hmax) // 8) for hi, _vi in samp]
    tbh = [-(- -(-h * vi // vmax) // 8) for _hi, vi in samp]

    # libjpeg-style default scan script: Al=1 DC, split-band AC first
    # scans, then refinements down to Al=0
    if gray:
        script = [
            ("dc0", None, 0, 0, 0, 1),
            ("ac0", 0, 1, 5, 0, 2),
            ("ac0", 0, 6, 63, 0, 2),
            ("acr", 0, 1, 63, 2, 1),
            ("dcr", None, 0, 0, 1, 0),
            ("acr", 0, 1, 63, 1, 0),
        ]
    else:
        script = [
            ("dc0", None, 0, 0, 0, 1),
            ("ac0", 0, 1, 5, 0, 2),
            ("ac0", 1, 1, 63, 0, 1),
            ("ac0", 2, 1, 63, 0, 1),
            ("ac0", 0, 6, 63, 0, 2),
            ("acr", 0, 1, 63, 2, 1),
            ("dcr", None, 0, 0, 1, 0),
            ("acr", 1, 1, 63, 1, 0),
            ("acr", 2, 1, 63, 1, 0),
            ("acr", 0, 1, 63, 1, 0),
        ]

    def scan_dc(al, refine):
        bw_ = _BitWriter()
        out = bytearray()
        prev = [0] * ncomp
        rst = 0
        for m in range(mcux * mcuy):
            if ri and m and m % ri == 0:
                bw_.flush()
                out += bw_.buf
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw_ = _BitWriter()
                prev = [0] * ncomp
            my, mx = divmod(m, mcux)
            for ci in range(ncomp):
                hi, vi = samp[ci]
                for by in range(vi):
                    for bx in range(hi):
                        idx = (my * vi + by) * bws[ci] + mx * hi + bx
                        dc = int(coefs[ci][idx][0]) >> al
                        if refine:
                            bw_.write(dc & 1, 1)
                            continue
                        diff = dc - prev[ci]
                        prev[ci] = dc
                        s, bits = _magnitude(diff)
                        code, ln = dc_tbl[t_of[ci]][s]
                        bw_.write(code, ln)
                        if s:
                            bw_.write(bits, s)
        bw_.flush()
        out += bw_.buf
        return bytes(out)

    def scan_ac_first(ci, ss, se, al):
        act = ac_tbl[t_of[ci]]
        bw_ = _BitWriter()
        out = bytearray()
        rst = 0
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                code, ln = act[r << 4]
                bw_.write(code, ln)
                if r:
                    bw_.write(eobrun - (1 << r), r)
                eobrun = 0

        nb = 0
        for r0 in range(tbh[ci]):
            for c0 in range(tbw[ci]):
                if ri and nb and nb % ri == 0:
                    flush_eob()
                    bw_.flush()
                    out += bw_.buf
                    out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) % 8
                    bw_ = _BitWriter()
                nb += 1
                blk = coefs[ci][r0 * bws[ci] + c0]
                run = 0
                for k in range(ss, se + 1):
                    v = int(blk[k])
                    # AC point transform truncates toward zero (G.1.2.1)
                    v = (abs(v) >> al) * (1 if v >= 0 else -1)
                    if v == 0:
                        run += 1
                        continue
                    flush_eob()
                    while run >= 16:
                        code, ln = act[0xF0]
                        bw_.write(code, ln)
                        run -= 16
                    s, bits = _magnitude(v)
                    code, ln = act[(run << 4) | s]
                    bw_.write(code, ln)
                    bw_.write(bits, s)
                    run = 0
                if run:                    # band ended in zeros
                    if eob_runs:
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            flush_eob()
                    else:
                        code, ln = act[0x00]
                        bw_.write(code, ln)
        flush_eob()
        bw_.flush()
        out += bw_.buf
        return bytes(out)

    def scan_ac_refine(ci, ss, se, al):
        act = ac_tbl[t_of[ci]]
        bw_ = _BitWriter()
        out = bytearray()
        rst = 0
        eobrun = 0
        be = []            # correction bits buffered behind an EOB run

        def flush_eob():
            nonlocal eobrun, be
            if eobrun:
                r = eobrun.bit_length() - 1
                code, ln = act[r << 4]
                bw_.write(code, ln)
                if r:
                    bw_.write(eobrun - (1 << r), r)
                eobrun = 0
            for b in be:
                bw_.write(b, 1)
            be = []

        nb = 0
        for r0 in range(tbh[ci]):
            for c0 in range(tbw[ci]):
                if ri and nb and nb % ri == 0:
                    flush_eob()
                    bw_.flush()
                    out += bw_.buf
                    out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) % 8
                    bw_ = _BitWriter()
                nb += 1
                blk = coefs[ci][r0 * bws[ci] + c0]
                band = [int(blk[k]) for k in range(ss, se + 1)]
                absv = [abs(v) >> al for v in band]
                # index (in band) of the last NEWLY-significant coef:
                # zero-history runs after it fold into the EOB instead
                # of ZRLs (T.81 G.1.2.3 / libjpeg jcphuff)
                last_new = -1
                for i, t in enumerate(absv):
                    if t == 1:
                        last_new = i
                run = 0        # run of zero-HISTORY coefficients
                br = []        # correction bits pending the next symbol
                for i, (v, t) in enumerate(zip(band, absv)):
                    if t == 0:
                        run += 1
                        continue
                    # nonzero: emit pending ZRLs NOW (before deciding the
                    # kind) so the buffered correction bits stay with the
                    # 16-zero span the decoder reads them in
                    while run > 15 and i <= last_new:
                        flush_eob()
                        code, ln = act[0xF0]
                        bw_.write(code, ln)
                        run -= 16
                        for b in br:
                            bw_.write(b, 1)
                        br = []
                    if t > 1:  # already significant: correction bit
                        br.append(t & 1)
                        continue
                    # t == 1: newly significant this scan
                    flush_eob()
                    code, ln = act[(run << 4) | 1]
                    bw_.write(code, ln)
                    bw_.write(1 if v > 0 else 0, 1)
                    for b in br:
                        bw_.write(b, 1)
                    br = []
                    run = 0
                if run or br:              # end-of-band for this block
                    if eob_runs:
                        eobrun += 1
                        be += br
                        if eobrun == 0x7FFF or len(be) > 900:
                            flush_eob()
                    else:
                        code, ln = act[0x00]
                        bw_.write(code, ln)
                        for b in br:
                            bw_.write(b, 1)
        flush_eob()
        bw_.flush()
        out += bw_.buf
        return bytes(out)

    out = [b"\xff\xd8"]
    out.append(_seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    dqt = b"\x00" + bytes(int(v) for v in qts[0][ZIGZAG])
    if not gray:
        dqt += b"\x01" + bytes(int(v) for v in qts[1][ZIGZAG])
    out.append(_seg(0xFFDB, dqt))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, qt_of[ci]])
    out.append(_seg(0xFFC2, sof))
    dht = b""
    tables = ([(0, 0, DC_LUM), (1, 0, ac_raw[0])] if gray else
              [(0, 0, DC_LUM), (1, 0, ac_raw[0]),
               (0, 1, DC_CHROM), (1, 1, ac_raw[1])])
    for tc, th, (counts, syms) in tables:
        dht += bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms)
    out.append(_seg(0xFFC4, dht))
    if ri:
        out.append(_seg(0xFFDD, struct.pack(">H", ri)))
    for kind, ci, ss, se, ah, al in script:
        if kind in ("dc0", "dcr"):
            sos = bytes([ncomp])
            for c2 in range(ncomp):
                t = t_of[c2]
                sos += bytes([c2 + 1, (t << 4) | t])
            data = scan_dc(al, kind == "dcr")
        else:
            t = t_of[ci]
            sos = bytes([1, ci + 1, (t << 4) | t])
            data = (scan_ac_first if kind == "ac0"
                    else scan_ac_refine)(ci, ss, se, al)
        sos += bytes([ss, se, (ah << 4) | al])
        out.append(_seg(0xFFDA, sos))
        out.append(data)
    out.append(b"\xff\xd9")
    return b"".join(out)


# ---------------------------------------------------------------- parser

_RST_SPLIT = re.compile(b"\xff[\xd0-\xd7]")
# first 0xFF that starts a real marker (not stuffing, not a restart):
# the end of one progressive scan's entropy data
_SCAN_END = re.compile(b"\xff(?![\x00\xd0-\xd7])")


class _Parsed:
    """Header-parsed baseline JPEG, ready for entropy decode."""

    __slots__ = ("h", "w", "comps", "qts", "huff_raw", "tsel", "ri",
                 "segments", "seg_mcus", "hmax", "vmax", "mcux", "mcuy",
                 "layout", "nblk", "bws", "bhs", "progressive", "scans")


def _parse_jpeg(buf: bytes) -> _Parsed:
    """Marker walk + scan split.  Raises NotImplementedError at the
    documented codec boundaries (progressive, 12-bit, 16-bit quant)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    p = _Parsed()
    p.qts = {}
    p.huff_raw = {}
    p.ri = 0
    p.progressive = False
    p.scans = []
    sof = None
    scan_raw = None
    comps_sos = None
    while pos + 2 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        # T.81 B.1.1.2: any marker may be preceded by fill bytes (0xFF).
        while pos + 2 <= len(buf) and buf[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(buf):
            break
        marker = (buf[pos] << 8) | buf[pos + 1]
        if marker == 0xFFD9:
            break
        if 0xFFD0 <= marker <= 0xFFD7 or marker == 0xFF01:
            # standalone markers (RSTn/TEM) carry no length segment
            pos += 2
            continue
        if pos + 4 > len(buf):
            raise ValueError("truncated JPEG marker segment")
        (ln,) = struct.unpack_from(">H", buf, pos + 2)
        body = buf[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xFFDB:
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                z = np.frombuffer(body[o + 1:o + 65], np.uint8).astype(np.int32)
                p.qts[tq] = z[UNZIGZAG]
                o += 65
        elif marker in (0xFFC0, 0xFFC2):
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                hi, vi = hv >> 4, hv & 0xF
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factors {hi}x{vi} (supported: 1-2)")
                comps.append((cid, hi, vi, tq))
            sof = (h, w, comps)
            p.progressive = marker == 0xFFC2
        elif marker in (0xFFC1, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise NotImplementedError(
                f"non-baseline JPEG process (marker {marker:#x})")
        elif marker == 0xFFC4:
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                counts = bytes(body[o + 1:o + 17])
                n = sum(counts)
                syms = bytes(body[o + 17:o + 17 + n])
                p.huff_raw[(tc, th)] = (counts, syms)
                o += 17 + n
        elif marker == 0xFFDD:
            (p.ri,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xFFDA:
            nc = body[0]
            comps_sos = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                          body[2 + 2 * i] & 0xF) for i in range(nc)]
            if not p.progressive:
                # baseline: one scan, entropy data runs to EOI
                raw = buf[pos:]
                end = raw.find(b"\xff\xd9")
                if end < 0:
                    end = len(raw)
                scan_raw = raw[:end]
                break
            # progressive: collect this scan (band + approximation +
            # snapshots of the tables/DRI in force) and keep walking —
            # DHT/DRI may be redefined between scans
            ss, se2 = body[1 + 2 * nc], body[2 + 2 * nc]
            ahal = body[3 + 2 * nc]
            raw = buf[pos:]
            m = _SCAN_END.search(raw)
            end = m.start() if m else len(raw)
            p.scans.append({"comps": comps_sos, "ss": ss, "se": se2,
                            "ah": ahal >> 4, "al": ahal & 0xF,
                            "ri": p.ri, "data": raw[:end],
                            "huff": dict(p.huff_raw)})
            pos += end
    if sof is None or (scan_raw is None and not p.scans):
        raise ValueError("JPEG missing SOF/SOS")
    p.h, p.w, p.comps = sof
    p.tsel = {cid: (td, ta) for cid, td, ta in (comps_sos or [])}
    p.hmax = max(c[1] for c in p.comps)
    p.vmax = max(c[2] for c in p.comps)
    p.mcux = -(-p.w // (8 * p.hmax))
    p.mcuy = -(-p.h // (8 * p.vmax))
    nmcu = p.mcux * p.mcuy
    # MCU block layout: (ci, within-MCU offset) per block, T.81 A.2.3 order
    p.layout = []
    p.nblk = []
    p.bws = []
    p.bhs = []
    for ci, (_cid, hi, vi, _tq) in enumerate(p.comps):
        for by in range(vi):
            for bx in range(hi):
                p.layout.append((ci, by * hi + bx))
        p.nblk.append(hi * vi)
        p.bws.append(p.mcux * hi)
        p.bhs.append(p.mcuy * vi)
    if p.progressive:
        # multi-scan entropy data lives in p.scans; the baseline
        # segment machinery stays empty
        p.segments = []
        p.seg_mcus = []
        return p
    # split scan on restart markers (stuffed data never contains FFD0-D7),
    # then unstuff each segment independently
    segs = (_RST_SPLIT.split(scan_raw) if p.ri else [scan_raw])
    p.segments = [s.replace(b"\xff\x00", b"\xff") for s in segs]
    if p.ri:
        want = -(-nmcu // p.ri)
        if len(p.segments) != want:
            raise ValueError(
                f"restart segment count {len(p.segments)} != expected {want}")
        p.seg_mcus = [p.ri] * (want - 1) + [nmcu - p.ri * (want - 1)]
    else:
        p.seg_mcus = [nmcu]
    return p


# ------------------------------------------------------- scalar entropy

def _entropy_scalar(p: _Parsed) -> list:
    """Sequential LUT-walk entropy decode -> per-component (n_blocks, 64)
    int32 coefficient arrays in MCU-major block order."""
    tabs = []
    for cid, _hi, _vi, _tq in p.comps:
        td, ta = p.tsel[cid]
        tabs.append((_decode_tables(*p.huff_raw[(0, td)]),
                     _decode_tables(*p.huff_raw[(1, ta)])))
    ncomp = len(p.comps)
    blocks: list[list[list[int]]] = [[] for _ in range(ncomp)]
    for seg_i, data in enumerate(p.segments):
        prev_dc = [0] * ncomp
        pos = 0
        acc = 0
        nbits = 0
        for _m in range(p.seg_mcus[seg_i]):
            for ci, _ofs in p.layout:
                dc_lut, ac_lut = tabs[ci]
                block = [0] * 64
                blocks[ci].append(block)
                if nbits < 16:
                    acc = (acc << 32) | int.from_bytes(
                        data[pos:pos + 4].ljust(4, b"\x00"), "big")
                    pos += 4
                    nbits += 32
                    acc &= (1 << nbits) - 1
                e = dc_lut[(acc >> (nbits - 16)) & 0xFFFF]
                if e == 0:
                    raise ValueError("corrupt JPEG: Huffman code overflow")
                nbits -= e >> 8
                s = e & 0xFF
                if s:
                    if nbits < s:
                        acc = (acc << 32) | int.from_bytes(
                            data[pos:pos + 4].ljust(4, b"\x00"), "big")
                        pos += 4
                        nbits += 32
                        acc &= (1 << nbits) - 1
                    v = (acc >> (nbits - s)) & ((1 << s) - 1)
                    nbits -= s
                    if v < (1 << (s - 1)):
                        v += 1 - (1 << s)
                    prev_dc[ci] += v
                block[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    if nbits < 16:
                        acc = (acc << 32) | int.from_bytes(
                            data[pos:pos + 4].ljust(4, b"\x00"), "big")
                        pos += 4
                        nbits += 32
                        acc &= (1 << nbits) - 1
                    e = ac_lut[(acc >> (nbits - 16)) & 0xFFFF]
                    if e == 0:
                        raise ValueError("corrupt JPEG: Huffman code overflow")
                    nbits -= e >> 8
                    rs = e & 0xFF
                    if rs == 0x00:
                        break
                    if rs == 0xF0:
                        k += 16
                        continue
                    k += rs >> 4
                    s = rs & 0xF
                    if k > 63:
                        raise ValueError("corrupt JPEG: AC index overflow")
                    if nbits < s:
                        acc = (acc << 32) | int.from_bytes(
                            data[pos:pos + 4].ljust(4, b"\x00"), "big")
                        pos += 4
                        nbits += 32
                        acc &= (1 << nbits) - 1
                    v = (acc >> (nbits - s)) & ((1 << s) - 1)
                    nbits -= s
                    if v < (1 << (s - 1)):
                        v += 1 - (1 << s)
                    block[k] = v
                    k += 1
    return [np.array(b, np.int32) if b else np.zeros((0, 64), np.int32)
            for b in blocks]


# ----------------------------------------------- progressive decoding

class _BitReader:
    """Scalar MSB-first bit reader over unstuffed entropy data.  Reads
    past the end see zero bits (the final byte is 1-padded by encoders;
    zero-fill makes a truncated stream fail on the LUT miss rather than
    loop)."""

    __slots__ = ("d", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            b = self.d[self.pos] if self.pos < len(self.d) else 0
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def bit(self) -> int:
        return self.bits(1)

    def huff(self, lut) -> int:
        self._fill(16)
        e = lut[(self.acc >> (self.nbits - 16)) & 0xFFFF]
        if e == 0:
            raise ValueError("corrupt JPEG: Huffman code overflow")
        self.nbits -= e >> 8
        self.acc &= (1 << self.nbits) - 1
        return e & 0xFF


def _recv_extend(rd: _BitReader, s: int) -> int:
    v = rd.bits(s)
    if s and v < (1 << (s - 1)):
        v += 1 - (1 << s)
    return v


def _ac_first_block(row, rd, lut, ss, se, al, eobrun):
    """First AC scan for one block's band (T.81 G.2.2 decode): RS
    symbols with EOBn run skips and ZRL, values scaled up by 2^Al."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rd.huff(lut)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:          # ZRL: 16 zero coefficients
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += rd.bits(r)
            break
        k += r
        if k > se:
            raise ValueError("corrupt JPEG: AC band overflow")
        row[k] = _recv_extend(rd, s) << al
        k += 1
    return eobrun


def _ac_refine_block(row, rd, lut, ss, se, al, eobrun):
    """AC successive-approximation refinement for one block (the
    correction-bit walk of G.2.2 / libjpeg decode_mcu_AC_refine):
    run/1 symbols place newly-significant +-2^Al values after skipping
    `r` zero-HISTORY positions; every nonzero-history coefficient
    passed on the way (and, for EOB runs, through the end of the band)
    consumes one correction bit."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rd.huff(lut)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    eobrun = 1 << r     # includes the current block
                    if r:
                        eobrun += rd.bits(r)
                    break
                val = 0                  # ZRL: skip 16 zero-history
            else:
                # refinement magnitudes are always 1 (G.1.2.3)
                val = p1 if rd.bit() else -p1
            while k <= se:
                c = int(row[k])
                if c:
                    if rd.bit() and (c & p1) == 0:
                        row[k] = c + (p1 if c >= 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                row[k] = val
            k += 1
    if eobrun:
        while k <= se:
            c = int(row[k])
            if c and rd.bit() and (c & p1) == 0:
                row[k] = c + (p1 if c >= 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(p: _Parsed, scan: dict, grids, cid2ci, tb) -> None:
    ss, se = scan["ss"], scan["se"]
    ah, al = scan["ah"], scan["al"]
    ri = scan["ri"]
    comps = scan["comps"]
    huff = scan["huff"]
    interleaved = len(comps) > 1
    if ss > 0 and interleaved:
        raise ValueError("progressive AC scan with >1 component")
    if interleaved:
        walk = []
        for cid, _td, _ta in comps:
            ci = cid2ci[cid]
            _c, hi, vi, _q = p.comps[ci]
            for by in range(vi):
                for bx in range(hi):
                    walk.append((ci, by, bx))
        nunits = p.mcux * p.mcuy
        ci0 = None
    else:
        walk = None
        ci0 = cid2ci[comps[0][0]]
        nunits = tb[ci0][0] * tb[ci0][1]
    dc_lut = {}
    ac_lut = None
    for cid, td, ta in comps:
        ci = cid2ci[cid]
        if ss == 0 and ah == 0:
            if (0, td) not in huff:
                raise ValueError(
                    "corrupt JPEG: scan references undefined Huffman table")
            dc_lut[ci] = _decode_tables(*huff[(0, td)])
        if ss > 0:
            if (1, ta) not in huff:
                raise ValueError(
                    "corrupt JPEG: scan references undefined Huffman table")
            ac_lut = _decode_tables(*huff[(1, ta)])
    segs = (_RST_SPLIT.split(scan["data"]) if ri else [scan["data"]])
    segs = [s.replace(b"\xff\x00", b"\xff") for s in segs]
    want = -(-nunits // ri) if ri else 1
    if len(segs) != want:
        raise ValueError(
            f"restart segment count {len(segs)} != expected {want}")
    seg_units = ([ri] * (want - 1) + [nunits - ri * (want - 1)]
                 if ri else [nunits])
    unit0 = 0
    for sdata, su in zip(segs, seg_units):
        rd = _BitReader(sdata)
        if ss == 0:
            pred = {}
            for m in range(unit0, unit0 + su):
                if interleaved:
                    my, mx = divmod(m, p.mcux)
                    blocks = [((my * vi + by) * p.bws[ci] + mx * hi + bx, ci)
                              for ci, by, bx in walk
                              for _c, hi, vi, _q in (p.comps[ci],)]
                else:
                    r0, c0 = divmod(m, tb[ci0][1])
                    blocks = [(r0 * p.bws[ci0] + c0, ci0)]
                for idx, ci in blocks:
                    if ah == 0:
                        s = rd.huff(dc_lut[ci])
                        pred[ci] = pred.get(ci, 0) + _recv_extend(rd, s)
                        grids[ci][idx, 0] = pred[ci] << al
                    elif rd.bit():
                        grids[ci][idx, 0] = int(grids[ci][idx, 0]) | (1 << al)
        else:
            g = grids[ci0]
            eobrun = 0
            fn = _ac_first_block if ah == 0 else _ac_refine_block
            for m in range(unit0, unit0 + su):
                r0, c0 = divmod(m, tb[ci0][1])
                row = g[r0 * p.bws[ci0] + c0]
                eobrun = fn(row, rd, ac_lut, ss, se, al, eobrun)
        unit0 += su


def _entropy_progressive(p: _Parsed) -> list:
    """Multi-scan progressive entropy decode (T.81 Annex G): DC first /
    refinement and AC first / refinement scans with EOB-run skipping and
    per-scan restart intervals, assembled by successive approximation
    into full-precision coefficients.  Output: per-component
    (n_blocks, 64) int32 arrays in MCU-major order — the same contract
    as _entropy_scalar, so _reconstruct is shared.  Later symbols depend
    on coefficient state left by earlier scans, so this path is
    inherently sequential per image (the vectorized cursor fleet covers
    baseline streams)."""
    grids = [np.zeros((p.bhs[ci] * p.bws[ci], 64), np.int64)
             for ci in range(len(p.comps))]
    cid2ci = {c[0]: i for i, c in enumerate(p.comps)}
    # true (unpadded) per-component block dims (T.81 A.1.1):
    # non-interleaved scans never code the MCU padding blocks
    tb = []
    for _cid, hi, vi, _tq in p.comps:
        cw = -(-p.w * hi // p.hmax)
        ch = -(-p.h * vi // p.vmax)
        tb.append((-(-ch // 8), -(-cw // 8)))
    for scan in p.scans:
        _decode_scan(p, scan, grids, cid2ci, tb)
    out = []
    for ci, (_cid, hi, vi, _tq) in enumerate(p.comps):
        g = grids[ci].reshape(p.mcuy, vi, p.mcux, hi, 64)
        out.append(g.transpose(0, 2, 1, 3, 4).reshape(-1, 64)
                   .astype(np.int32))
    return out


# --------------------------------------------------- vectorized entropy

_M27 = np.uint64((1 << 27) - 1)


def _entropy_batch(plist: list) -> list:
    """Multi-cursor vectorized entropy decode: every restart segment of
    every image is an independent decode chain with a byte-aligned start,
    so all of them advance ONE symbol per numpy step — a windowed-bits
    gather from a shared 40-bit-per-byte view, one stacked-LUT gather,
    vectorized magnitude sign-extension, and a scatter into one flat
    coefficient buffer per image.  The Python step loop runs
    max-symbols-per-segment times, independent of how many cursors ride
    it; per-symbol Python cost goes to ~zero as cursor count grows
    (restart-marked images and/or whole Arrow batches).

    Input: list of _Parsed.  Output: per image, per component,
    (n_blocks, 64) int32 coefficient arrays in MCU-major order —
    bit-identical to _entropy_scalar."""
    # --- unique LUT stack
    lut_ids: dict[tuple, int] = {}
    lut_list: list[np.ndarray] = []

    def lid_of(raw):
        key = raw
        i = lut_ids.get(key)
        if i is None:
            i = len(lut_list)
            lut_ids[key] = i
            lut_list.append(_decode_tables_np(*raw))
        return i

    nimg = len(plist)
    maxc = max(len(p.comps) for p in plist)
    dsel = np.zeros((nimg, maxc), np.int32)
    asel = np.zeros((nimg, maxc), np.int32)
    maxl = max(len(p.layout) for p in plist)
    layci = np.zeros((nimg, maxl), np.int32)
    layofs = np.zeros((nimg, maxl), np.int32)
    laynb = np.zeros((nimg, maxl), np.int64)     # nblk of that entry's comp
    laylen = np.zeros(nimg, np.int64)
    cbase = np.zeros((nimg, maxc), np.int64)     # flat coef offsets
    total_coef = 0
    for ii, p in enumerate(plist):
        for ci, (cid, _hi, _vi, _tq) in enumerate(p.comps):
            td, ta = p.tsel[cid]
            dsel[ii, ci] = lid_of(p.huff_raw[(0, td)])
            asel[ii, ci] = lid_of(p.huff_raw[(1, ta)])
            cbase[ii, ci] = total_coef
            total_coef += p.mcux * p.mcuy * p.nblk[ci] * 64
        laylen[ii] = len(p.layout)
        for li, (ci, ofs) in enumerate(p.layout):
            layci[ii, li] = ci
            layofs[ii, li] = ofs
            laynb[ii, li] = p.nblk[ci]
    luts = np.stack(lut_list)                    # (n_luts, 65536)
    coef = np.zeros(total_coef, np.int32)

    # --- concatenated segment buffer + 40-bit windows per byte
    parts = []
    cursors = []        # (img, start_bit, mcu0, mcu_count)
    off = 0
    for ii, p in enumerate(plist):
        mcu0 = 0
        for s, data in enumerate(p.segments):
            cursors.append((ii, off * 8, mcu0, p.seg_mcus[s]))
            mcu0 += p.seg_mcus[s]
            parts.append(data)
            off += len(data)
    parts.append(b"\x00" * 8)
    concat = b"".join(parts)
    b = np.frombuffer(concat, np.uint8).astype(np.uint64)
    v40 = ((b[:-4] << np.uint64(32)) | (b[1:-3] << np.uint64(24))
           | (b[2:-2] << np.uint64(16)) | (b[3:-1] << np.uint64(8)) | b[4:])
    maxbit = np.int64((len(concat) - 8) * 8)

    S = len(cursors)
    img = np.array([c[0] for c in cursors], np.int64)
    pos = np.array([c[1] for c in cursors], np.int64)
    mcuno = np.array([c[2] for c in cursors], np.int64)
    mleft = np.array([c[3] for c in cursors], np.int64)
    li = np.zeros(S, np.int64)
    k = np.zeros(S, np.int64)                     # 0 = DC next, 1..63 AC
    prevdc = np.zeros((S, maxc), np.int64)
    ci = layci[img, 0].astype(np.int64)
    bbase = (cbase[img, ci]
             + (mcuno * laynb[img, 0] + layofs[img, 0]) * 64)
    active = mleft > 0
    err = np.zeros(S, bool)
    ar = np.arange(S)
    # each step consumes >= 1 bit per active cursor, plus block bookkeeping
    max_steps = int(8 * max(len(p2) for p2 in
                            [s2 for p3 in plist for s2 in p3.segments] or [b""])
                    ) + 64 * 8 + 64
    steps = 0
    while active.any():
        steps += 1
        if steps > max_steps:
            err |= active
            break
        ia = np.nonzero(active)[0]
        pp = pos[ia]
        # runaway guard only: window reads may legally overlap the final
        # pad bytes (v40 is padded), so flag only positions past the data
        bad = pp > maxbit
        if bad.any():
            err[ia[bad]] = True
            active[ia[bad]] = False
            ia = ia[~bad]
            if not len(ia):
                continue
            pp = pos[ia]
        w27 = ((v40[pp >> 3] >> (np.uint64(13) - (pp & 7).astype(np.uint64)))
               & _M27).astype(np.int64)
        isdc = k[ia] == 0
        tsel_ = np.where(isdc, dsel[img[ia], ci[ia]], asel[img[ia], ci[ia]])
        e = luts[tsel_, w27 >> 11]
        inv = e == 0
        if inv.any():
            err[ia[inv]] = True
            active[ia[inv]] = False
            ia = ia[~inv]
            if not len(ia):
                continue
            w27, isdc, tsel_, e = w27[~inv], isdc[~inv], tsel_[~inv], e[~inv]
        codelen = (e >> 8).astype(np.int64)
        sym = (e & 0xFF).astype(np.int64)
        s = np.where(isdc, sym, sym & 0xF)
        vbits = (w27 >> (27 - codelen - s)) & ((np.int64(1) << s) - 1)
        half = (np.int64(1) << s) >> 1
        v = np.where(s > 0,
                     np.where(vbits < half,
                              vbits + 1 - (np.int64(1) << s), vbits),
                     0)
        pos[ia] += codelen + s
        done_blk = np.zeros(len(ia), bool)
        # DC symbols
        if isdc.any():
            di = ia[isdc]
            prevdc[di, ci[di]] += v[isdc]
            coef[bbase[di]] = prevdc[di, ci[di]]
            k[di] = 1
        # AC symbols
        isac = ~isdc
        if isac.any():
            aidx = ia[isac]
            rs = sym[isac]
            eob = rs == 0
            zrl = rs == 0xF0
            norm = ~eob & ~zrl
            if zrl.any():
                k[aidx[zrl]] += 16
                over = k[aidx] > 63
                over &= zrl
                if over.any():
                    err[aidx[over]] = True
                    active[aidx[over]] = False
            if norm.any():
                ni = aidx[norm]
                k2 = k[ni] + (rs[norm] >> 4)
                bad2 = k2 > 63
                if bad2.any():
                    err[ni[bad2]] = True
                    active[ni[bad2]] = False
                    ok = ~bad2
                    ni, k2 = ni[ok], k2[ok]
                    vn = v[isac][norm][ok]
                else:
                    vn = v[isac][norm]
                coef[bbase[ni] + k2] = vn
                k[ni] = k2 + 1
            db = eob | (k[aidx] >= 64)
            done_blk[isac] = db & active[aidx]
        # block transitions
        if done_blk.any():
            ti = ia[done_blk]
            li[ti] += 1
            wrap = li[ti] >= laylen[img[ti]]
            wi = ti[wrap]
            if len(wi):
                li[wi] = 0
                mcuno[wi] += 1
                mleft[wi] -= 1
                fin = mleft[wi] == 0
                active[wi[fin]] = False
            live = ti[active[ti]]
            if len(live):
                ci[live] = layci[img[live], li[live]]
                bbase[live] = (cbase[img[live], ci[live]]
                               + (mcuno[live] * laynb[img[live], li[live]]
                                  + layofs[img[live], li[live]]) * 64)
                k[live] = 0
    if err.any():
        bad_imgs = sorted(set(img[err].tolist()))
        raise ValueError(f"corrupt JPEG in batch decode (images {bad_imgs})")
    # --- slice per image/comp
    out = []
    for ii, p in enumerate(plist):
        comps = []
        for ci2 in range(len(p.comps)):
            n = p.mcux * p.mcuy * p.nblk[ci2]
            a = coef[cbase[ii, ci2]:cbase[ii, ci2] + n * 64]
            comps.append(a.reshape(n, 64))
        out.append(comps)
    return out


# ------------------------------------------------------- reconstruction

def _reconstruct(p: _Parsed, comps_coef: list) -> np.ndarray:
    """Dequantize + IDCT + MCU-major -> raster reorder + chroma upsample
    + color transform -> uint8 (h, w, c)."""
    planes = []
    for ci, (_cid, hi, vi, tq) in enumerate(p.comps):
        z = comps_coef[ci][:, UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        z *= p.qts[tq].reshape(8, 8)
        # batched BLAS matmul: C.T @ coef @ C per block (~17x vs einsum)
        sp = (_C.T[None] @ z) @ _C
        # MCU-major (mcuy, mcux, vi, hi, 8, 8) -> plane raster
        plane = (sp.reshape(p.mcuy, p.mcux, vi, hi, 8, 8)
                 .transpose(0, 2, 4, 1, 3, 5)
                 .reshape(p.mcuy * vi * 8, p.mcux * hi * 8)) + 128.0
        ch = -(-p.h * vi // p.vmax)
        cw = -(-p.w * hi // p.hmax)
        plane = plane[:ch, :cw]
        ry, rx = p.vmax // vi, p.hmax // hi
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:p.h, :p.w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


_VEC_MIN_CURSORS = 200
_VEC_MIN_GAIN = 24


def _use_vectorized(plist: list) -> bool:
    """The vectorized path costs a fixed ~100us of numpy dispatch per STEP
    (one symbol across every cursor), and runs max-symbols-per-segment
    steps; the scalar walk costs ~0.5us per symbol TOTAL.  So vectorize
    only when there are enough cursors to amortize the step cost AND the
    busiest segment is a small share of the total work (measured 512x512:
    4096 cursors -> 6x faster, 64 cursors -> 3x slower)."""
    segs = [len(s) for p in plist for s in p.segments]
    if len(segs) < _VEC_MIN_CURSORS:
        return False
    return sum(segs) >= _VEC_MIN_GAIN * max(segs)


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Decoder -> uint8 (h, w, c) with c in {1, 3}.  Baseline streams
    with many restart segments take the vectorized multi-cursor path;
    short or single-chain streams take the scalar LUT walk (lower
    constant); progressive (SOF2) streams take the multi-scan
    successive-approximation decoder."""
    p = _parse_jpeg(buf)
    if p.progressive:
        return _reconstruct(p, _entropy_progressive(p))
    if _use_vectorized([p]):
        coefs = _entropy_batch([p])[0]
    else:
        coefs = _entropy_scalar(p)
    return _reconstruct(p, coefs)


def decode_jpeg_batch(bufs: list) -> list:
    """Decode many JPEGs at once: headers parse per image (cheap Python),
    then ALL baseline entropy segments across the batch decode as one
    vectorized cursor fleet — the per-Arrow-batch shape extract_features
    feeds; progressive images decode via the multi-scan path.
    Returns a list of uint8 (h, w, c) arrays, index-aligned with `bufs`.
    Raises (ValueError/NotImplementedError) on the first unparseable or
    corrupt stream, matching per-image decode_jpeg semantics."""
    plist = [_parse_jpeg(bytes(b)) for b in bufs]
    if not plist:
        return []
    base = [p for p in plist if not p.progressive]
    coefmap: dict[int, list] = {}
    if base and _use_vectorized(base):
        for p, c in zip(base, _entropy_batch(base)):
            coefmap[id(p)] = c
    out = []
    for p in plist:
        if p.progressive:
            coefs = _entropy_progressive(p)
        elif id(p) in coefmap:
            coefs = coefmap[id(p)]
        else:
            coefs = _entropy_scalar(p)
        out.append(_reconstruct(p, coefs))
    return out
