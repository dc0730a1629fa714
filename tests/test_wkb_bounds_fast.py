"""wkb_bounds' grouped fast path must equal the generic per-row parser on
every supported WKB shape (single-ring polys of many sizes trigger the
vectorized path; multi-ring/multipolygon/linestring/point take the
fallback)."""
from __future__ import annotations

import numpy as np
import pandas as pd

from resolve_overlap_and_gap_spark.geom import wkb
from resolve_overlap_and_gap_spark.operators import overlap_gap as og


def test_wkb_bounds_fast_matches_generic():
    rng = np.random.default_rng(7)
    blobs = []
    for _ in range(200):
        nv = int(rng.integers(3, 12))
        ring = rng.normal(size=(nv, 2)) * 100
        blobs.append(wkb.dump_polygon([np.vstack([ring, ring[:1]])]))
    hole = rng.normal(size=(4, 2))
    blobs.append(wkb.dump_polygon([
        np.vstack([hole * 10, hole[:1] * 10]), np.vstack([hole, hole[:1]])]))
    blobs.append(wkb.dump_multipolygon([
        [np.vstack([hole * 5, hole[:1] * 5])],
        [np.vstack([hole * 2, hole[:1] * 2])]]))
    blobs.append(wkb.dump_linestring(rng.normal(size=(5, 2))))
    blobs.append(wkb.dump_point((1.5, -2.5)))

    got = og.wkb_bounds.func(pd.Series(blobs, dtype=object)).to_numpy()
    exp = np.empty_like(got)
    for i, b in enumerate(blobs):
        c = wkb.load_coords(bytes(b))
        exp[i] = (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())
    assert np.array_equal(got, exp)
