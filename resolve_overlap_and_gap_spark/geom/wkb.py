"""Minimal WKB codec (numpy, little-endian) — geometry columns are
BinaryType WKB throughout the engine (SURVEY.md §1.2).

Supported: Point, LineString, Polygon, MultiPolygon (2D). Shapely is not
available in this environment; this codec plus geom/core.py and
geom/arrangement.py form the engine's from-scratch geometry kernel.

Representations used engine-side:
  point      -> (2,) float64
  linestring -> (n, 2) float64
  polygon    -> list[(n, 2) float64]      (ring 0 = shell, rest = holes)
  multipolygon -> list[polygon]
"""

from __future__ import annotations

import struct

import numpy as np

POINT, LINESTRING, POLYGON, MULTIPOLYGON = 1, 2, 3, 6
_HDR = struct.Struct("<BI")
_U32 = struct.Struct("<I")


def dump_point(xy) -> bytes:
    return _HDR.pack(1, POINT) + struct.pack("<2d", float(xy[0]), float(xy[1]))


def dump_linestring(coords: np.ndarray) -> bytes:
    c = np.ascontiguousarray(coords, dtype="<f8")
    return _HDR.pack(1, LINESTRING) + _U32.pack(len(c)) + c.tobytes()


def dump_polygon(rings: list[np.ndarray]) -> bytes:
    out = [_HDR.pack(1, POLYGON), _U32.pack(len(rings))]
    for r in rings:
        r = np.ascontiguousarray(r, dtype="<f8")
        n = len(r)
        if n == 0:
            out.append(_U32.pack(0))
            continue
        if r[0, 0] == r[-1, 0] and r[0, 1] == r[-1, 1]:  # already closed
            out.append(_U32.pack(n))
            out.append(r.tobytes())
        else:  # close the ring: same bytes as appending the first vertex
            out.append(_U32.pack(n + 1))
            out.append(r.tobytes())
            out.append(r[:1].tobytes())
    return b"".join(out)


def dump_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    out = [_HDR.pack(1, MULTIPOLYGON), _U32.pack(len(polys))]
    for p in polys:
        out.append(dump_polygon(p))
    return b"".join(out)


def _rd_u32(buf: memoryview, off: int) -> tuple[int, int]:
    return _U32.unpack_from(buf, off)[0], off + 4


def _parse(buf: memoryview, off: int):
    byte_order, gtype = _HDR.unpack_from(buf, off)
    off += _HDR.size
    if byte_order != 1:
        raise ValueError("big-endian WKB not supported")
    gtype &= 0xFF  # strip SRID/Z flags if any slipped in
    if gtype == POINT:
        xy = np.frombuffer(buf, dtype="<f8", count=2, offset=off)
        return ("point", xy.copy()), off + 16
    if gtype == LINESTRING:
        n, off = _rd_u32(buf, off)
        c = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
        return ("linestring", c.copy()), off + 16 * n
    if gtype == POLYGON:
        nr, off = _rd_u32(buf, off)
        rings = []
        for _ in range(nr):
            n, off = _rd_u32(buf, off)
            c = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
            rings.append(c.copy())
            off += 16 * n
        return ("polygon", rings), off
    if gtype == MULTIPOLYGON:
        np_, off = _rd_u32(buf, off)
        polys = []
        for _ in range(np_):
            (kind, rings), off = _parse(buf, off)
            assert kind == "polygon"
            polys.append(rings)
        return ("multipolygon", polys), off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def load(b: bytes):
    """-> (kind, payload); kinds: point/linestring/polygon/multipolygon."""
    (kind, payload), _ = _parse(memoryview(b), 0)
    return kind, payload


def load_coords(b: bytes) -> np.ndarray:
    """All coordinates of any supported WKB geometry, stacked (n, 2)."""
    kind, payload = load(b)
    if kind == "point":
        return payload.reshape(1, 2)
    if kind == "linestring":
        return payload
    if kind == "polygon":
        return np.vstack(payload)
    return np.vstack([r for p in payload for r in p])


def load_polygons(b: bytes) -> list[list[np.ndarray]]:
    """Any polygonal WKB -> list of polygons (each list of rings)."""
    kind, payload = load(b)
    if kind == "polygon":
        return [payload]
    if kind == "multipolygon":
        return payload
    raise ValueError(f"expected polygonal WKB, got {kind}")
