"""Dissolve (geometric union by key) — A2 in SURVEY.md §2.4:
`ST_Union(geo) GROUP BY key` (find_overlap_and_gap-pre.sql:597-615, line
merge pipelines …single_cell.sql:360-369).

Spark-native: groupBy(key) -> Arrow-batched arrangement union per group.
Because resolve() pieces tile exactly on snap-grid-aligned cell borders,
dissolving an owner's per-cell pieces drops the internal border edges —
this IS the cross-cell heal for owner geometry (reference job type 4,
ST_ModEdgeHeal semantics): two pieces meeting at a grid border merge into
one face with the border edge gone.

Scale note: one shuffle on the dissolve key; a single group holds one key's
geometry (bounded for real layers — a municipality's pieces, not the world).
Global all-rows union would instead tree-reduce per partition first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from resolve_overlap_and_gap_spark.geom import wkb
from resolve_overlap_and_gap_spark.geom.arrangement import union_faces

DISSOLVE_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("area", T.DoubleType()),
    T.StructField("n_parts", T.IntegerType()),
    T.StructField("geom", T.BinaryType()),
])


def _bbox_components(polys: list) -> list[list[int]]:
    """Connected components of the bbox-overlap graph via an x-sweep with an
    active max-heap — only parts whose boxes touch can interact in a union,
    so each component unions independently (tree-union semantics). Worst
    case (everything overlapping in x) degrades to the single-arrangement
    cost the decomposition replaces."""
    import heapq

    n = len(polys)
    bb = np.empty((n, 4), dtype=np.int64)
    for i, (_, rings) in enumerate(polys):
        bb[i] = (min(r[:, 0].min() for r in rings), min(r[:, 1].min() for r in rings),
                 max(r[:, 0].max() for r in rings), max(r[:, 1].max() for r in rings))
    parent = np.arange(n)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    active: list[tuple[int, int]] = []
    for i in np.argsort(bb[:, 0], kind="stable"):
        x0 = bb[i, 0]
        while active and active[0][0] < x0:
            heapq.heappop(active)
        for _, j in active:
            if bb[i, 1] <= bb[j, 3] and bb[j, 1] <= bb[i, 3]:
                parent[find(i)] = find(j)
        heapq.heappush(active, (int(bb[i, 2]), int(i)))
    comps: dict[int, list[int]] = {}
    for i in range(n):
        comps.setdefault(find(i), []).append(i)
    return list(comps.values())


def _union_one_group(key: int, geoms: list[bytes], grid_size: float) -> tuple:
    from resolve_overlap_and_gap_spark.geom.core import ring_area2

    polys = []
    for b in geoms:
        for rings in wkb.load_polygons(bytes(b)):
            ir = [np.floor(np.asarray(r, np.float64) / grid_size + 0.5).astype(np.int64)
                  for r in rings]
            polys.append((0, ir))

    def single_part(rings) -> tuple[float, list]:
        # a lone polygon IS its own union — skip the arrangement
        a2 = abs(ring_area2(rings[0].astype(np.float64)))
        for h in rings[1:]:
            a2 -= abs(ring_area2(h.astype(np.float64)))
        return a2, [r.astype(np.float64) * grid_size for r in rings]

    area2 = 0.0
    mp: list[list[np.ndarray]] = []
    n_parts = 0
    for members in _bbox_components(polys):
        if len(members) == 1:
            a2, rings_f = single_part(polys[members[0]][1])
            area2 += a2
            mp.append(rings_f)
            n_parts += 1
            continue
        out = union_faces([polys[i] for i in members])
        for f in out:
            area2 += f.area2
            mp.append([f.shell.astype(np.float64) * grid_size]
                      + [h.astype(np.float64) * grid_size for h in f.holes])
            n_parts += 1
    return (key, area2 / 2.0 * grid_size * grid_size, n_parts, wkb.dump_multipolygon(mp))


AUTO_SALT_TARGET = 2000   # pieces per partial-union task on the hot key
AUTO_SALT_MAX = 64


def _parse_pieces_batch(geoms: np.ndarray, grid_size: float):
    """Batch WKB parse+snap for dissolve inputs.  Rows that are one-
    polygon/one-ring multipolygons (the overwhelming majority of resolve
    pieces) of equal byte length share an exact layout (coords at offset
    22), so each length group is parsed with ONE float64 view + vectorized
    snap; anything else falls back to the generic per-row parser.  Returns
    per row a list of (snapped_rings, bbox_int64) — one entry per polygon
    part, in WKB order (identical structure + values to the scalar path)."""
    n = len(geoms)
    out: list = [None] * n
    lens = np.fromiter((len(b) for b in geoms), np.int64, n)
    for L in np.unique(lens):
        rem = L - 22
        if rem < 16 * 3 or rem % 16:
            continue
        nv = rem // 16
        idx = np.nonzero(lens == L)[0]
        buf = b"".join(geoms[i] for i in idx)
        a = np.frombuffer(buf, np.uint8).reshape(len(idx), L)
        hdr = (
            (a[:, 0] == 1)
            & (a[:, 1] == 6) & (a[:, 2] == 0) & (a[:, 3] == 0) & (a[:, 4] == 0)
            & (a[:, 5] == 1) & (a[:, 6] == 0) & (a[:, 7] == 0) & (a[:, 8] == 0)
            & (a[:, 9] == 1)
            & (a[:, 10] == 3) & (a[:, 11] == 0) & (a[:, 12] == 0) & (a[:, 13] == 0)
            & (a[:, 14] == 1) & (a[:, 15] == 0) & (a[:, 16] == 0) & (a[:, 17] == 0)
            & (a[:, 18] == (nv & 0xFF)) & (a[:, 19] == ((nv >> 8) & 0xFF))
            & (a[:, 20] == ((nv >> 16) & 0xFF)) & (a[:, 21] == ((nv >> 24) & 0xFF))
        )
        ok = np.nonzero(hdr)[0]
        if not len(ok):
            continue
        c = a[ok, 22:].copy().view("<f8").reshape(len(ok), nv, 2)
        ci = np.floor(c / grid_size + 0.5).astype(np.int64)
        bb = np.empty((len(ok), 4), np.int64)
        bb[:, 0] = ci[:, :, 0].min(axis=1)
        bb[:, 1] = ci[:, :, 1].min(axis=1)
        bb[:, 2] = ci[:, :, 0].max(axis=1)
        bb[:, 3] = ci[:, :, 1].max(axis=1)
        sub = idx[ok]
        for q in range(len(ok)):
            out[int(sub[q])] = [([ci[q]], bb[q])]
    for i in range(n):
        if out[i] is None:
            entry = []
            for rings in wkb.load_polygons(bytes(geoms[i])):
                ir = [np.floor(np.asarray(r, np.float64) / grid_size + 0.5)
                      .astype(np.int64) for r in rings]
                bb = np.array(
                    (min(r[:, 0].min() for r in ir),
                     min(r[:, 1].min() for r in ir),
                     max(r[:, 0].max() for r in ir),
                     max(r[:, 1].max() for r in ir)), np.int64)
                entry.append((ir, bb))
            out[i] = entry
    return out


def _components_by_key(poly_key: np.ndarray, poly_bb: np.ndarray) -> np.ndarray:
    """Connected components of the bbox-overlap graph WITHIN each key,
    computed for every key of a bucket at once: in-key candidate pairs by
    offset arithmetic, closed-interval bbox test, then vectorized
    min-label propagation.  Same overlap relation (and therefore the same
    components) as the per-key sweep it replaces.  Returns a label per
    polygon (min poly index of its component)."""
    n = len(poly_key)
    lab = np.arange(n, dtype=np.int64)
    if n < 2:
        return lab
    # keys are contiguous (caller lays polys out key-major)
    brk = np.nonzero(np.r_[True, poly_key[1:] != poly_key[:-1]])[0]
    sizes = np.diff(np.r_[brk, n])
    big = sizes >= 2
    gs, gk = brk[big], sizes[big]
    if not len(gs):
        return lab
    pc = gk * gk
    tp = int(pc.sum())
    wp = np.arange(tp, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(pc)))[:-1], pc)
    s_r = np.repeat(gs, pc)
    k_r = np.repeat(gk, pc)
    ii = s_r + wp // k_r
    jj = s_r + wp % k_r
    lt = ii < jj
    ii, jj = ii[lt], jj[lt]
    ov = (
        (poly_bb[ii, 0] <= poly_bb[jj, 2]) & (poly_bb[jj, 0] <= poly_bb[ii, 2])
        & (poly_bb[ii, 1] <= poly_bb[jj, 3]) & (poly_bb[jj, 1] <= poly_bb[ii, 3])
    )
    ii, jj = ii[ov], jj[ov]
    while len(ii):
        prev = lab
        lab = lab.copy()
        m = np.minimum(lab[ii], lab[jj])
        np.minimum.at(lab, ii, m)
        np.minimum.at(lab, jj, m)
        lab = np.minimum(lab, lab[lab])
        if np.array_equal(lab, prev):
            break
    return lab


def _union_bucket_disjoint(keys: np.ndarray, geoms: np.ndarray,
                           starts: np.ndarray, ends: np.ndarray,
                           grid_size: float, with_geom: bool) -> list[tuple]:
    """All keys of one bucket in ONE arrangement pass: multi-piece
    bbox-components of every key share a single noding/DCEL/labeling
    invocation (multi_union_faces) instead of one full machinery call per
    key, which is what made the heal's final owner dissolve ~1 ms/key.

    EXACT-FAITHFUL to the per-key path: singleton components run the
    identical single_part float math; multi-piece components produce the
    same integer face areas and face counts through the shared
    arrangement (precondition: distinct keys' interiors are disjoint —
    the heal's resolve pieces partition the plane; sharing borders is
    fine).  Geometry is emitted only when with_geom (vertex chains can
    carry collinear subdivision points from neighboring keys, so callers
    that re-emit geometry downstream keep the per-key path)."""
    from resolve_overlap_and_gap_spark.geom.arrangement import multi_union_faces
    from resolve_overlap_and_gap_spark.geom.core import ring_area2

    def single_part(rings) -> tuple[float, list]:
        a2 = abs(ring_area2(rings[0].astype(np.float64)))
        for h in rings[1:]:
            a2 -= abs(ring_area2(h.astype(np.float64)))
        return a2, ([r.astype(np.float64) * grid_size for r in rings]
                    if with_geom else None)

    # phase 1: batch-parse every piece, split each key's polygons into
    # bbox components (all keys at once), then accumulate in EXACTLY the
    # scalar order — keys ascending, components by first-member index,
    # members in WKB order — so the float area sums are bit-identical
    parsed = _parse_pieces_batch(geoms, grid_size)
    poly_rings: list = []
    poly_bb_rows: list = []
    poly_key_rows: list = []
    key_start: list[int] = []
    for s, e in zip(starts, ends):
        key_start.append(len(poly_rings))
        for r in range(s, e):
            for rings, bb in parsed[r]:
                poly_rings.append(rings)
                poly_bb_rows.append(bb)
                poly_key_rows.append(s)  # group tag: one per key slice
    key_start.append(len(poly_rings))
    poly_bb = (np.stack(poly_bb_rows) if poly_bb_rows
               else np.empty((0, 4), np.int64))
    poly_key = np.asarray(poly_key_rows, np.int64)
    lab = _components_by_key(poly_key, poly_bb)

    per_key: dict[int, list] = {}      # key -> [area2, mp, n_parts]
    pid_of: dict[int, int] = {}        # dense pid -> key
    shared_polys: list[tuple[int, list]] = []
    next_pid = 0
    for ki, (s, e) in enumerate(zip(starts, ends)):
        k = int(keys[s])
        lo, hi = key_start[ki], key_start[ki + 1]
        comps: dict[int, list[int]] = {}
        for i in range(lo, hi):
            comps.setdefault(int(lab[i]), []).append(i)
        acc = per_key.setdefault(k, [0.0, [], 0])
        for members in comps.values():
            if len(members) == 1:
                a2, rings_f = single_part(poly_rings[members[0]])
                acc[0] += a2
                if with_geom:
                    acc[1].append(rings_f)
                acc[2] += 1
            else:
                for i in members:
                    shared_polys.append((next_pid, poly_rings[i]))
                pid_of[next_pid] = k
                next_pid += 1
    # phase 2: one arrangement over every multi-piece component
    if shared_polys:
        by_pid = multi_union_faces(shared_polys)
        for p, faces in by_pid.items():
            acc = per_key[pid_of[p]]
            for f in faces:
                acc[0] += f.area2
                if with_geom:
                    acc[1].append(
                        [f.shell.astype(np.float64) * grid_size]
                        + [h.astype(np.float64) * grid_size for h in f.holes])
                acc[2] += 1
    return [
        (k, acc[0] / 2.0 * grid_size * grid_size, acc[2],
         wkb.dump_multipolygon(acc[1]) if with_geom else None)
        for k, acc in per_key.items()
    ]


def dissolve(df: DataFrame, key_col: str, grid_size: float,
             geom_col: str = "geom", n_salts: int | str = 1,
             auto_checkpoint: bool = True, n_buckets: int | None = None,
             disjoint: bool = False, with_geom: bool = True) -> DataFrame:
    """-> (key, area, n_parts, geom WKB multipolygon): union of all
    geometries per key on the snap grid (winding >= 1 rule, so overlapping
    inputs union correctly).

    n_salts > 1 enables the SKEW path: a hot key (one owner with millions
    of pieces) otherwise serializes in a single kernel call.  Two-level
    dissolve — partial union per (key, random salt), then final union of
    the partials per key — is exact because geometric union is associative
    and the winding>=1 rule is idempotent; the salt spreads the heavy
    per-piece work across n_salts tasks and the final level unions only
    n_salts pre-merged multipolygons per key.

    n_salts='auto' sizes the salt count from the data with ONE cheap count
    aggregation (max pieces on any key): 1 when no key exceeds
    AUTO_SALT_TARGET (plain single-level path, no extra pass), else
    ceil(max/TARGET) capped at AUTO_SALT_MAX — so a single giant owner can
    never serialize the heal's final dissolve.

    With 'auto' the sizing count is an EXTRA action over the input, so
    the slimmed input is localCheckpoint()ed internally first — an
    expensive upstream plan is evaluated ONCE, and the dissolve itself
    then reads the checkpoint.  Explicit n_salts pays no extra action and
    no checkpoint.  Callers whose input is ALREADY materialized (border
    heal passes a checkpointed pieces frame) pass auto_checkpoint=False
    to skip re-materializing the geometry bytes.

    n_buckets defaults to the scale-aware kernel bucket count (~128 hash
    groups per core — the same straggler-balance rule as the cell
    kernels)."""
    if n_buckets is None:
        # MANY buckets for both dissolve paths.  Per-key path: buckets only
        # balance keys across tasks, and 100 groups in 256 buckets collide
        # ~17% of the time (serializing unrelated keys) vs <2% in 4096.
        # Disjoint path: the bucket's shared arrangement pays a
        # components x edges anchor ray-cast — both grow with bucket
        # content, so the per-bucket cost is QUADRATIC in bucket size
        # (measured 32x bucket content -> ~200x kernel time); small buckets
        # keep it linear in total data at fixed bucket count.  The 8/core
        # rule is only for overlay_cells kernels, whose ray-casts are
        # cell-sliced.
        sc = df.sparkSession.sparkContext
        n_buckets = max(4096, 128 * sc.defaultParallelism)
    slim = df.select(
        F.col(key_col).cast("long").alias("key"), F.col(geom_col).alias("geom")
    )
    if n_salts == "auto":
        if auto_checkpoint:
            slim = slim.localCheckpoint()
        maxc = (slim.groupBy("key").count()
                .agg(F.max("count").alias("m")).collect()[0]["m"]) or 0
        n_salts = 1 if maxc <= AUTO_SALT_TARGET else min(
            AUTO_SALT_MAX, -(-int(maxc) // AUTO_SALT_TARGET))
    if n_salts > 1:
        # (key, _salt) stay SEPARATE grouping columns: arithmetic packing
        # (key * n_salts + salt, floor-divide back) would round-trip
        # through double in Spark's long division and silently regroup
        # keys above ~2^53/n_salts — polygonize's _pid64 labels use 63 bits
        salted = slim.withColumn("_salt", F.pmod(F.hash("geom"), F.lit(n_salts)))

        def partial_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            keys = pdf["key"].to_numpy()
            salts = pdf["_salt"].to_numpy()
            order = np.lexsort((salts, keys))
            keys, salts = keys[order], salts[order]
            geoms = pdf["geom"].to_numpy(dtype=object)[order]
            brk = (keys[1:] != keys[:-1]) | (salts[1:] != salts[:-1])
            starts = np.flatnonzero(np.r_[True, brk])
            ends = np.r_[starts[1:], len(keys)]
            rows = [
                _union_one_group(int(keys[s]), list(geoms[s:e]), grid_size)
                for s, e in zip(starts, ends)
            ]
            return pd.DataFrame(rows, columns=["key", "area", "n_parts", "geom"])

        partial = salted.withColumn(
            "bucket", F.pmod(F.hash("key", "_salt"), F.lit(n_buckets))
        ).groupBy("bucket").applyInPandas(partial_kernel, DISSOLVE_SCHEMA)
        return dissolve(partial.select("key", "geom"), "key", grid_size,
                        disjoint=disjoint, with_geom=with_geom)

    if disjoint:
        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            keys = pdf["key"].to_numpy()
            order = np.argsort(keys, kind="stable")
            keys = keys[order]
            geoms = pdf["geom"].to_numpy(dtype=object)[order]
            starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
            ends = np.r_[starts[1:], len(keys)]
            rows = _union_bucket_disjoint(
                keys, geoms, starts, ends, grid_size, with_geom)
            return pd.DataFrame(rows, columns=["key", "area", "n_parts", "geom"])
    else:
        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            # sorted numpy slicing instead of pandas groupby: ~1 ms/group
            # groupby overhead dominates when groups are tiny (the common
            # case after per-cell resolve — most owners have 1-5 pieces)
            keys = pdf["key"].to_numpy()
            order = np.argsort(keys, kind="stable")
            keys = keys[order]
            geoms = pdf["geom"].to_numpy(dtype=object)[order]
            starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
            ends = np.r_[starts[1:], len(keys)]
            rows = [
                _union_one_group(int(keys[s]), list(geoms[s:e]), grid_size)
                for s, e in zip(starts, ends)
            ]
            return pd.DataFrame(rows, columns=["key", "area", "n_parts", "geom"])

    # hashed buckets: many keys per Arrow round-trip
    bucketed = slim.withColumn("bucket", F.pmod(F.hash("key"), F.lit(n_buckets)))
    return bucketed.groupBy("bucket").applyInPandas(kernel, DISSOLVE_SCHEMA)
