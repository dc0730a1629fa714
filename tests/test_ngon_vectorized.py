"""The vectorized ngon WKB kernels must be byte-identical to the r5
per-row implementations (kept inline here as executable references)."""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from resolve_overlap_and_gap_spark.geom import wkb as _wkb
from resolve_overlap_and_gap_spark.sources import pages


def _ngon_footprint_ref(ids, xs, ys, scale=1.0):
    h = (ids * np.int64(2654435761)) & np.int64(0xFFFFFFFF)
    nv = 5 + (h % 4)
    rad = (0.05 + (h % 5000) / 10000.0) * scale
    out = []
    for i in range(len(ids)):
        k = np.arange(nv[i])
        mix = ((ids[i] * np.int64(40503) + k * np.int64(2654435761))
               & np.int64(0xFFFFFFFF)).astype(np.float64) / 4294967296.0
        ang = 2.0 * np.pi * (k + mix * 0.5) / nv[i]
        rr = rad[i] * (0.7 + 0.6 * mix)
        ring = np.stack([xs[i] + rr * np.cos(ang), ys[i] + rr * np.sin(ang)],
                        axis=1)
        out.append(_wkb.dump_polygon([ring]))
    return out


def _h32(i, salt):
    return int(hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:8], 16)


def _regular_ngon_ref(ids, xs, ys, k=8, scale=1.0):
    ang0 = 2.0 * np.pi * np.arange(k) / k
    out = []
    for j in range(len(ids)):
        r = (0.05 + (_h32(ids[j], ":w") % 5000) / 10000.0) * scale
        ph = (_h32(ids[j], ":rot") % 6283) / 1000.0
        a = ph + ang0
        ring = np.stack([xs[j] + r * np.cos(a), ys[j] + r * np.sin(a)], axis=1)
        out.append(_wkb.dump_polygon([ring]))
    return out


def test_ngon_footprint_bytes_identical():
    rng = np.random.default_rng(11)
    ids = rng.integers(1, 10**9, size=500).astype(np.int64)
    xs = rng.uniform(-180, 180, size=500)
    ys = rng.uniform(-85, 85, size=500)
    got = pages._ngon_footprint_kernel(
        pd.Series(ids), pd.Series(xs), pd.Series(ys), 1.0)
    exp = _ngon_footprint_ref(ids, xs, ys)
    assert list(got) == exp


def test_regular_ngon_bytes_identical():
    rng = np.random.default_rng(12)
    ids = rng.integers(1, 10**9, size=300).astype(np.int64)
    xs = rng.uniform(-180, 180, size=300)
    ys = rng.uniform(-85, 85, size=300)
    hw = np.array([_h32(i, ":w") for i in ids], np.int64)
    hr = np.array([_h32(i, ":rot") for i in ids], np.int64)
    got = pages._regular_ngon_kernel(
        pd.Series(xs), pd.Series(ys), pd.Series(hw), pd.Series(hr), 8, 1.0)
    exp = _regular_ngon_ref(ids, xs, ys, k=8)
    assert list(got) == exp
