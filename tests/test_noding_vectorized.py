"""Differential test: vectorized node_segments == the r5 scalar reference.

The reference below is the pre-vectorization implementation (scalar pair
loop + per-segment rebuild), kept verbatim as an executable spec.  Inputs
are randomized integer segment soups dense with degeneracies (shared
endpoints, collinear overlaps, endpoint touches, proper crossings on a
coarse grid so snapping creates new interactions).  The comparison is on
the canonical noded multiset — (segment, pid, wt) rows with canonical
endpoint order, sorted — because the vectorized rebuild emits rows in a
different (semantically irrelevant) order.
"""
from __future__ import annotations

from collections import defaultdict

import numpy as np
import pytest

from resolve_overlap_and_gap_spark.geom.arrangement import (
    Arrangement,
    NodingError,
    label_walks,
    node_segments,
)


def _cross(ox, oy, ax, ay, bx, by):
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def _on_segment(px, py, x1, y1, x2, y2):
    if _cross(x1, y1, x2, y2, px, py) != 0:
        return False
    return min(x1, x2) <= px <= max(x1, x2) and min(y1, y2) <= py <= max(y1, y2)


def _bbox_pairs_ref(S):
    m = len(S)
    x1 = np.minimum(S[:, 0], S[:, 2]); x2 = np.maximum(S[:, 0], S[:, 2])
    y1 = np.minimum(S[:, 1], S[:, 3]); y2 = np.maximum(S[:, 1], S[:, 3])
    ov = (
        (x1[:, None] <= x2[None, :]) & (x2[:, None] >= x1[None, :])
        & (y1[:, None] <= y2[None, :]) & (y2[:, None] >= y1[None, :])
    )
    ii, jj = np.nonzero(ov)
    k = ii < jj
    return ii[k], jj[k]


def node_segments_ref(S, pid, wt, max_iter=8):
    """The r5 scalar implementation (verbatim semantics)."""
    S = np.asarray(S, np.int64).reshape(-1, 4).copy()
    pid = np.asarray(pid, np.int64).copy()
    wt = np.asarray(wt, np.int64).copy()
    for it in range(max_iter + 1):
        m = len(S)
        if m == 0:
            break
        splits = defaultdict(set)
        I, J = _bbox_pairs_ref(S)
        for t in range(len(I)):
            a, b = int(I[t]), int(J[t])
            ax1, ay1, ax2, ay2 = (int(v) for v in S[a])
            bx1, by1, bx2, by2 = (int(v) for v in S[b])
            share = (ax1, ay1) in ((bx1, by1), (bx2, by2)) or \
                (ax2, ay2) in ((bx1, by1), (bx2, by2))
            d1 = _cross(ax1, ay1, ax2, ay2, bx1, by1)
            d2 = _cross(ax1, ay1, ax2, ay2, bx2, by2)
            d3 = _cross(bx1, by1, bx2, by2, ax1, ay1)
            d4 = _cross(bx1, by1, bx2, by2, ax2, ay2)
            collin = d1 == 0 and d2 == 0
            if share and not collin:
                continue
            if collin:
                for px, py in ((bx1, by1), (bx2, by2)):
                    if _on_segment(px, py, ax1, ay1, ax2, ay2) and \
                            (px, py) not in ((ax1, ay1), (ax2, ay2)):
                        splits[a].add((px, py))
                for px, py in ((ax1, ay1), (ax2, ay2)):
                    if _on_segment(px, py, bx1, by1, bx2, by2) and \
                            (px, py) not in ((bx1, by1), (bx2, by2)):
                        splits[b].add((px, py))
                continue
            if ((d1 > 0) != (d2 > 0) or d1 == 0 or d2 == 0) and (
                (d3 > 0) != (d4 > 0) or d3 == 0 or d4 == 0
            ):
                if d1 == 0 and _on_segment(bx1, by1, ax1, ay1, ax2, ay2):
                    px, py = bx1, by1
                elif d2 == 0 and _on_segment(bx2, by2, ax1, ay1, ax2, ay2):
                    px, py = bx2, by2
                elif d3 == 0 and _on_segment(ax1, ay1, bx1, by1, bx2, by2):
                    px, py = ax1, ay1
                elif d4 == 0 and _on_segment(ax2, ay2, bx1, by1, bx2, by2):
                    px, py = ax2, ay2
                else:
                    denom = float(d3 - d4)
                    if denom == 0:
                        continue
                    t2 = d3 / denom
                    px = int(np.floor(ax1 + t2 * (ax2 - ax1) + 0.5))
                    py = int(np.floor(ay1 + t2 * (ay2 - ay1) + 0.5))
                if (px, py) not in ((ax1, ay1), (ax2, ay2)):
                    splits[a].add((px, py))
                if (px, py) not in ((bx1, by1), (bx2, by2)):
                    splits[b].add((px, py))
        if not splits:
            break
        if it == max_iter:
            raise NodingError(sorted({int(pid[i]) for i in splits}))
        newS, newP, newW = [], [], []
        for i in range(m):
            x1, y1, x2, y2 = (int(v) for v in S[i])
            if i in splits:
                pts = [(x1, y1)] + sorted(
                    splits[i], key=lambda p: (abs(p[0] - x1) + abs(p[1] - y1))
                ) + [(x2, y2)]
                for (u1, v1), (u2, v2) in zip(pts[:-1], pts[1:]):
                    if (u1, v1) != (u2, v2):
                        newS.append((u1, v1, u2, v2))
                        newP.append(pid[i]); newW.append(wt[i])
            else:
                newS.append((x1, y1, x2, y2))
                newP.append(pid[i]); newW.append(wt[i])
        S = np.asarray(newS, np.int64)
        pid = np.asarray(newP, np.int64)
        wt = np.asarray(newW, np.int64)
    return S, pid, wt


def _canon(S, pid, wt):
    """Canonical sorted multiset of (x1,y1,x2,y2,pid,wt) with endpoint order
    normalized (direction is preserved by noding, so no flip needed — but
    rebuild order is not)."""
    rows = np.column_stack([S, pid, wt])
    order = np.lexsort(tuple(rows[:, c] for c in range(rows.shape[1] - 1, -1, -1)))
    return rows[order]


def _random_soup(rng, n, span=40):
    """Segment soup on a coarse grid: dense in collinear overlaps, shared
    endpoints, touches and crossings whose snapped points cascade."""
    pts = rng.integers(0, span, size=(n, 4)).astype(np.int64)
    ok = (pts[:, 0] != pts[:, 2]) | (pts[:, 1] != pts[:, 3])
    S = pts[ok]
    pid = rng.integers(0, 5, size=len(S)).astype(np.int64)
    wt = rng.choice(np.array([-1, 1], np.int64), size=len(S))
    return S, pid, wt


@pytest.mark.parametrize("seed", range(30))
def test_vectorized_matches_scalar_reference(seed):
    rng = np.random.default_rng(seed)
    S, pid, wt = _random_soup(rng, 60)
    try:
        expS, expP, expW = node_segments_ref(S, pid, wt)
        exc = None
    except NodingError as e:
        exc = e
    if exc is not None:
        with pytest.raises(NodingError) as got:
            node_segments(S, pid, wt)
        assert got.value.pids == exc.pids
        return
    gotS, gotP, gotW = node_segments(S, pid, wt)
    assert _canon(gotS, gotP, gotW).tolist() == _canon(expS, expP, expW).tolist()


@pytest.mark.parametrize("seed", range(10))
def test_vectorized_arrangement_faces_match(seed):
    """End-to-end: the Arrangement built from either noding has identical
    labeled walk areas (the face-level invariant the kernels consume)."""
    rng = np.random.default_rng(100 + seed)
    S, pid, wt = _random_soup(rng, 40, span=25)
    try:
        a = node_segments_ref(S, pid, wt)
    except NodingError:
        return
    b = node_segments(S, pid, wt)
    arr_a = Arrangement(*a)
    arr_b = Arrangement(*b)
    wa = label_walks(arr_a)
    wb = label_walks(arr_b)
    sig_a = sorted((int(x), tuple(sorted(w.items())))
                   for x, w in zip(arr_a.walk_area2, wa))
    sig_b = sorted((int(x), tuple(sorted(w.items())))
                   for x, w in zip(arr_b.walk_area2, wb))
    assert sig_a == sig_b
