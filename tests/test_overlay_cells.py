"""overlay_cells (batched multi-cell arrangement) must equal per-cell
overlay() exactly: same faces (shells, holes, windings, exact areas), same
adjacency dicts (float-sum equality included), same quarantine sets."""
from __future__ import annotations

import numpy as np
import pytest

from resolve_overlap_and_gap_spark.geom.arrangement import overlay, overlay_cells
from resolve_overlap_and_gap_spark.operators.overlap_gap import UNIVERSE


def _rand_cell_polys(rng, cx0, cy0, size, n_polys):
    """Random snapped polygons inside one cell box, degeneracy-heavy
    (coarse coordinate grid forces touches/collinear overlaps), plus the
    UNIVERSE cell box."""
    polys = []
    for pid in range(n_polys):
        k = int(rng.integers(3, 7))
        cx = rng.integers(cx0 + 2, cx0 + size - 2)
        cy = rng.integers(cy0 + 2, cy0 + size - 2)
        rad = int(rng.integers(1, size // 2))
        ang = np.sort(rng.uniform(0, 2 * np.pi, size=k))
        ring = np.stack([
            np.clip(cx + (rad * np.cos(ang)).astype(np.int64), cx0, cx0 + size),
            np.clip(cy + (rad * np.sin(ang)).astype(np.int64), cy0, cy0 + size),
        ], axis=1).astype(np.int64)
        polys.append((pid, [ring]))
    box = np.array([[cx0, cy0], [cx0 + size, cy0],
                    [cx0 + size, cy0 + size], [cx0, cy0 + size]], np.int64)
    polys.append((UNIVERSE, [box]))
    return polys


def _face_sig(f):
    return (
        f.shell.tolist(),
        sorted(h.tolist() for h in f.holes),
        tuple(sorted(f.winding.items())),
        int(f.area2),
    )


@pytest.mark.parametrize("seed", range(12))
def test_overlay_cells_equals_per_cell(seed):
    rng = np.random.default_rng(seed)
    n_cells = int(rng.integers(2, 7))
    items = []
    for ci in range(n_cells):
        # adjacent cells included: boxes share borders when gx steps by size
        size = 24
        gx = int(rng.integers(0, 3)) * size
        gy = ci * size  # distinct y-band per cell is NOT required; vary x too
        items.append((1000 + ci, _rand_cell_polys(rng, gx, gy, size,
                                                  int(rng.integers(2, 9)))))

    got = overlay_cells(items, with_adjacency=True, noding_max_iter=8)
    for key, polys in items:
        exp_faces, exp_adj = overlay(polys, with_adjacency=True)
        got_faces, got_adj = got[key]
        assert [_face_sig(f) for f in got_faces] == \
            [_face_sig(f) for f in exp_faces], key
        assert got_adj == exp_adj, key


def test_overlay_cells_adjacent_cells_share_borders():
    """Two cells sharing a full border edge (the resolve case: clipped
    pieces meet at the cell line) stay independent in the batch."""
    size = 16
    items = []
    for ci, gx in enumerate((0, size)):  # side-by-side cells
        rng = np.random.default_rng(100 + ci)
        items.append((ci, _rand_cell_polys(rng, gx, 0, size, 5)))
    got = overlay_cells(items, with_adjacency=True)
    for key, polys in items:
        exp_faces, exp_adj = overlay(polys, with_adjacency=True)
        got_faces, got_adj = got[key]
        assert [_face_sig(f) for f in got_faces] == \
            [_face_sig(f) for f in exp_faces]
        assert got_adj == exp_adj


def test_overlay_cells_quarantine_matches():
    """A non-converging cell quarantines the same pids as per-cell overlay,
    and other cells are unaffected."""
    # craft a cell whose noding cannot converge in 0 rounds: any crossing
    # pair with max_iter=0 raises; per-cell overlay quarantines pid>=0
    box = np.array([[0, 0], [40, 0], [40, 40], [0, 40]], np.int64)
    tri1 = np.array([[1, 1], [21, 2], [3, 17]], np.int64)
    tri2 = np.array([[2, 9], [22, 10], [4, 30]], np.int64)
    bad_cell = [(0, [tri1]), (1, [tri2]), (UNIVERSE, [box])]
    ok_cell = [(0, [np.array([[2, 2], [12, 2], [7, 9]], np.int64)]),
               (UNIVERSE, [box])]

    q_ref: list[int] = []
    ref = overlay(bad_cell, with_adjacency=True, noding_max_iter=0,
                  quarantine=q_ref)
    q_got: dict = {}
    got = overlay_cells([("bad", bad_cell), ("ok", ok_cell)],
                        with_adjacency=True, noding_max_iter=0,
                        quarantine_of=q_got)
    assert sorted(q_got.get("bad", [])) == sorted(q_ref)
    assert [_face_sig(f) for f in got["bad"][0]] == \
        [_face_sig(f) for f in ref[0]]
    assert got["bad"][1] == ref[1]
    ok_ref = overlay(ok_cell, with_adjacency=True, noding_max_iter=0)
    assert [_face_sig(f) for f in got["ok"][0]] == \
        [_face_sig(f) for f in ok_ref[0]]
