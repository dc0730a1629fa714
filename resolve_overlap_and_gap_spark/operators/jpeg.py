"""Baseline JFIF/JPEG codec (stdlib + numpy — no PIL/libjpeg).

Real crawl media is mostly JPEG; round 3 left it behind a
NotImplementedError.  This module implements the baseline sequential-DCT
process from the public JPEG standard (ITU-T T.81): 8x8 orthonormal DCT,
Annex K quantization + Huffman tables (quality-scaled with the familiar
5000/Q | 200-2Q rule), 4:4:4 sampling (no chroma subsampling), canonical
Huffman coding with byte stuffing.

Scale shape: the per-symbol Huffman walk is an irreducible sequential
loop (a few int ops per symbol — the same structure every native decoder
has), but everything per-BLOCK is vectorized across all blocks of the
image at once: forward/inverse DCT are two einsum contractions over the
(n_blocks, 8, 8) stack, quantization/dequantization and the YCbCr<->RGB
transforms are whole-array numpy.  Inside extract_features this runs per
Arrow batch under mapInPandas, so executors decode many images per
Python round-trip.

Boundary: progressive (SOF2), 12-bit, arithmetic coding, subsampled
chroma and restart intervals raise NotImplementedError — parse-level
rejection, not silent corruption.  The encoder emits none of those.
"""

from __future__ import annotations

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
    """Flat 16-bit-peek LUT for the decoder (the classic fast path built
    from T.81 F.16's canonical ordering): entry[peek16] = (len << 8) | sym
    for every 16-bit window whose prefix is the code; 0 = invalid prefix.
    One list lookup replaces the per-bit tree walk — the per-symbol cost
    that dominated the baseline scan decode.  Cached on the table bytes:
    real encoders (ours included) reuse the Annex K tables, so a decode
    fleet builds each 64 K-entry list once per process, not per image."""
    return _decode_tables_cached(bytes(counts), bytes(symbols))


@lru_cache(maxsize=64)
def _decode_tables_cached(counts: bytes, symbols: bytes):
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
    return lut.tolist()


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
    """(h, w) -> (n_blocks, 8, 8) in raster MCU order; h, w multiples of 8."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """Baseline JFIF encoder: 8-bit gray (h,w)/(h,w,1) or RGB (h,w,3),
    4:4:4, Annex K tables scaled by `quality`."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if gray:
        comps = [img.astype(np.float64)]
    else:
        x = img.astype(np.float64)
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]
    qts = [_scaled_qt(QT_LUM, quality), _scaled_qt(QT_CHROM, quality)]
    qt_of = [0] if gray else [0, 1, 1]
    # per-component quantized zigzag coefficients, vectorized per block
    coefs = []
    for ci, plane in enumerate(comps):
        p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
        blocks = _blocks_of(p) - 128.0
        dct = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
        q = qts[qt_of[ci]].reshape(8, 8).astype(np.float64)
        qz = np.round(dct / q).astype(np.int32).reshape(-1, 64)[:, ZIGZAG]
        coefs.append(qz)

    dc_tbl = [_canonical_codes(*DC_LUM), _canonical_codes(*DC_CHROM)]
    ac_tbl = [_canonical_codes(*AC_LUM), _canonical_codes(*AC_CHROM)]
    t_of = [0] if gray else [0, 1, 1]
    bw = _BitWriter()
    prev_dc = [0] * len(comps)
    for n in range(coefs[0].shape[0]):
        for ci in range(len(comps)):
            block = coefs[ci][n]
            dct_, act_ = dc_tbl[t_of[ci]], ac_tbl[t_of[ci]]
            diff = int(block[0]) - prev_dc[ci]
            prev_dc[ci] = int(block[0])
            s, bits = _magnitude(diff)
            code, ln = dct_[s]
            bw.write(code, ln)
            if s:
                bw.write(bits, s)
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
                    bw.write(code, ln)
                    run -= 16
                s, bits = _magnitude(v)
                code, ln = act_[(run << 4) | s]
                bw.write(code, ln)
                bw.write(bits, s)
                run = 0
            if last < 63:
                code, ln = act_[0x00]   # EOB
                bw.write(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    ncomp = len(comps)
    out = [b"\xff\xd8"]
    out.append(seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    dqt = b"\x00" + bytes(int(v) for v in qts[0][ZIGZAG])
    if not gray:
        dqt += b"\x01" + bytes(int(v) for v in qts[1][ZIGZAG])
    out.append(seg(0xFFDB, dqt))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, qt_of[ci]])
    out.append(seg(0xFFC0, sof))
    dht = b""
    for tc, th, (counts, syms) in (
        [(0, 0, DC_LUM), (1, 0, AC_LUM)] if gray
        else [(0, 0, DC_LUM), (1, 0, AC_LUM), (0, 1, DC_CHROM), (1, 1, AC_CHROM)]
    ):
        dht += bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms)
    out.append(seg(0xFFC4, dht))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = t_of[ci]
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out.append(seg(0xFFDA, sos))
    out.append(bytes(bw.buf))
    out.append(b"\xff\xd9")
    return b"".join(out)


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline decoder -> uint8 (h, w, c) with c in {1, 3}."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}
    sof = None
    scan = None
    comps_sos = None
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = (buf[pos] << 8) | buf[pos + 1]
        if marker == 0xFFD9:
            break
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
                qts[tq] = z[UNZIGZAG]
                o += 65
        elif marker == 0xFFC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled chroma (only 4:4:4 supported)")
                comps.append((cid, tq))
            sof = (h, w, comps)
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise NotImplementedError(
                f"non-baseline JPEG process (marker {marker:#x})")
        elif marker == 0xFFC4:
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                counts = list(body[o + 1:o + 17])
                n = sum(counts)
                syms = list(body[o + 17:o + 17 + n])
                huff[(tc, th)] = _decode_tables(counts, syms)
                o += 17 + n
        elif marker == 0xFFDD:
            raise NotImplementedError("restart intervals")
        elif marker == 0xFFDA:
            nc = body[0]
            comps_sos = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                          body[2 + 2 * i] & 0xF) for i in range(nc)]
            # entropy-coded data runs from here to EOI; unstuff FF00
            raw = buf[pos:]
            end = raw.find(b"\xff\xd9")
            if end < 0:
                end = len(raw)
            scan = raw[:end].replace(b"\xff\x00", b"\xff")
            break
    if sof is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = sof
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    nb = (ph // 8) * (pw // 8)
    ncomp = len(comps)
    tsel = {cid: (td, ta) for cid, td, ta in comps_sos}
    tabs = [(huff[(0, tsel[cid][0])], huff[(1, tsel[cid][1])])
            for cid, _tq in comps]
    # Entropy decode with a 16-bit-peek LUT per symbol and a 48-bit-max
    # int accumulator refilled 32 bits at a time (zero-padded past EOI per
    # T.81 F.2.2.5's 1-bit convention relaxed to 0 — padding is only ever
    # consumed after the last block's EOB).  Blocks buffered as Python
    # lists (scalar list stores beat numpy item writes ~4x); one
    # np.array per component at the end.
    blocks: list[list[list[int]]] = [[] for _ in range(ncomp)]
    prev_dc = [0] * ncomp
    data = scan
    pos = 0
    acc = 0
    nbits = 0
    for _n in range(nb):
        for ci in range(ncomp):
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
    planes = []
    for ci, (_cid, tq) in enumerate(comps):
        z = np.array(blocks[ci], np.int32)[:, UNZIGZAG].reshape(
            -1, 8, 8).astype(np.float64)
        z *= qts[tq].reshape(8, 8)
        sp = np.einsum("xu,nuv,yv->nxy", _C.T, z, _C.T)
        plane = (sp.reshape(ph // 8, pw // 8, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(ph, pw)) + 128.0
        planes.append(plane[:h, :w])
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
