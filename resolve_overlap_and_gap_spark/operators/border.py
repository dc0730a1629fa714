"""Boundary-exchange pass — the cross-cell reconciliation that makes the
parallel per-cell resolve match a single-cell run (the reference's border
job phases: heal + border small-face removal, job types 4/5/6,
function_resolve_overlap_gap_single_cell.sql:597-787).

Per-cell resolve defers any face touching its cell border (they stay
unmerged there). This pass:

  1. takes gap faces that touch cell borders (from detection),
  2. reassembles them ACROSS cells with an ITERATED PARENT-CELL DISSOLVE —
     group pieces by their parent cell, union per group (union_faces heals
     the grid-border edges), finalize faces that no longer touch the parent
     border, escalate the rest one level coarser, repeat.  Fully
     distributed: each level is one shuffle on the parent key + an
     Arrow-batched union kernel; no driver-side geometry, ever.  Levels are
     bounded by the grid resolution (<= res iterations) and escalation mass
     shrinks geometrically (only faces sitting exactly on the coarser grid
     lines survive a level),
  3. for each reassembled gap below min_area, finds the adjacent resolved
     piece with the LONGEST shared border (an overlay adjacency — exactly
     the ST_RemEdgeNewFace rule) and merges the gap into it,
  4. emits updated pieces (geometry re-dissolved per owner).

Correctness of early finalize: gap pieces connect only through shared
boundary on cell borders, so a merged face strictly interior to its parent
cell cannot gain further mass — everything still pending lies in other
parent cells and could only attach through the parent border.

Faces at or above min_area can never become slivers (union only grows), but
they cannot simply be dropped while they still touch the parent border: a
cross-border sibling that later unions WITHOUT that mass could fall below
min_area and be wrongly finalized as a sliver even though the true gap is
>= min_area.  Such faces convert to KILL INTERVALS — the positive-length
segments where their boundary lies on the parent border lines (pure
interval data, so the open-world exterior never ships geometry).  Kill
intervals escalate alongside live pieces; a live union face whose boundary
overlaps a kill interval with positive length is itself killed (its true
gap is connected to >= min_area mass).  This reproduces the global
union-then-filter semantics exactly: killed mass never enters the live
union, so its contact edges stay on the live faces' boundary and the kill
test fires transitively.  Kill intervals interior to the current parent are
dropped after the level's test (everything that could touch them has been
tested; union never adds new boundary), so kill mass shrinks geometrically
just like live mass.

Adjacency is computed per gap in an Arrow-batched kernel over candidate
neighbors found by a covering-cell equi-join — one shuffle, no driver-side
geometry.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from resolve_overlap_and_gap_spark import grid
from resolve_overlap_and_gap_spark.config import EngineConfig
from resolve_overlap_and_gap_spark.geom import wkb
from resolve_overlap_and_gap_spark.geom.arrangement import Face, overlay, union_faces
from resolve_overlap_and_gap_spark.geom.core import ring_area2
from resolve_overlap_and_gap_spark.operators.overlap_gap import detect_all, with_cells

ASSIGN_SCHEMA = T.StructType([
    T.StructField("owner", T.LongType()),
    T.StructField("gap_area", T.DoubleType()),
    T.StructField("geom", T.BinaryType()),
])

MERGE_SCHEMA = T.StructType([
    T.StructField("cell_id", T.LongType()),      # the PARENT cell
    # 'sliver' (final), 'live' (escalating geometry), 'kill' (escalating
    # border intervals of >= min_area gap mass)
    T.StructField("kind", T.StringType()),
    T.StructField("gap_area", T.DoubleType()),
    T.StructField("geom", T.BinaryType()),       # WKB, or packed intervals
])

_ZMASK = (1 << grid.RES_SHIFT) - 1

# border-gap inputs at or under this many rows reassemble at the root in a
# single round (the multi-level pre-merge only pays off when the per-round
# shuffles carry real mass); larger inputs keep the level-jump cascade
ROOT_JUMP_MAX_ROWS = 200_000


# ---------------------------------------------------------- kill intervals
def pack_intervals(iv) -> bytes:
    """(n,4) int64 (axis, coord, lo, hi) rows -> bytes. axis 0 = vertical
    line x=coord (interval in y); axis 1 = horizontal line y=coord
    (interval in x). Coordinates are snap-grid units."""
    return np.ascontiguousarray(np.asarray(iv, np.int64)).tobytes()


def unpack_intervals(b: bytes) -> np.ndarray:
    return np.frombuffer(bytes(b), dtype=np.int64).reshape(-1, 4)


def ring_border_intervals(rings, cx0: int, cy0: int, cx1: int, cy1: int):
    """Positive-length contacts of closed integer rings with the 4 border
    lines of the box -> list of (axis, coord, lo, hi)."""
    out = []
    for r in rings:
        a = np.asarray(r, np.int64)
        if len(a) < 2:
            continue
        b = np.roll(a, -1, axis=0)
        vert = (a[:, 0] == b[:, 0]) & (a[:, 1] != b[:, 1])
        for coord in (cx0, cx1):
            m = vert & (a[:, 0] == coord)
            if m.any():
                lo = np.minimum(a[m, 1], b[m, 1])
                hi = np.maximum(a[m, 1], b[m, 1])
                out.extend((0, int(coord), int(l), int(h)) for l, h in zip(lo, hi))
        horiz = (a[:, 1] == b[:, 1]) & (a[:, 0] != b[:, 0])
        for coord in (cy0, cy1):
            m = horiz & (a[:, 1] == coord)
            if m.any():
                lo = np.minimum(a[m, 0], b[m, 0])
                hi = np.maximum(a[m, 0], b[m, 0])
                out.extend((1, int(coord), int(l), int(h)) for l, h in zip(lo, hi))
    return out


def merge_intervals(iv: np.ndarray) -> np.ndarray:
    """Coalesce overlapping/touching intervals per (axis, coord) line —
    keeps escalated kill rows from accumulating duplicates level over
    level. Safe for the strict-overlap kill test: merging [a,b],[b,c]
    cannot create a positive overlap that neither part had."""
    iv = np.asarray(iv, np.int64).reshape(-1, 4)
    if len(iv) == 0:
        return iv
    order = np.lexsort((iv[:, 2], iv[:, 1], iv[:, 0]))
    iv = iv[order]
    out = []
    cur = None
    for ax, co, lo, hi in iv:
        if cur is not None and cur[0] == ax and cur[1] == co and lo <= cur[3]:
            cur[3] = max(cur[3], hi)
        else:
            if cur is not None:
                out.append(cur)
            cur = [int(ax), int(co), int(lo), int(hi)]
    out.append(cur)
    return np.asarray(out, np.int64)


def _kills_index(iv: np.ndarray) -> dict:
    idx: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for ax, co, lo, hi in np.asarray(iv, np.int64).reshape(-1, 4):
        idx.setdefault((int(ax), int(co)), []).append((int(lo), int(hi)))
    return idx


def _face_touches_kill(f: Face, idx: dict) -> bool:
    """True iff any boundary edge of f overlaps a kill interval with
    POSITIVE length (point contact does not connect: the arrangement and
    GEOS both keep point-touching parts separate)."""
    if not idx:
        return False
    for ring in [f.shell] + f.holes:
        a = np.asarray(ring, np.int64)
        if len(a) < 2:
            continue
        b = np.roll(a, -1, axis=0)
        vert = (a[:, 0] == b[:, 0]) & (a[:, 1] != b[:, 1])
        for i in np.flatnonzero(vert):
            ivs = idx.get((0, int(a[i, 0])))
            if ivs:
                lo, hi = sorted((int(a[i, 1]), int(b[i, 1])))
                if any(max(lo, l) < min(hi, h) for l, h in ivs):
                    return True
        horiz = (a[:, 1] == b[:, 1]) & (a[:, 0] != b[:, 0])
        for i in np.flatnonzero(horiz):
            ivs = idx.get((1, int(a[i, 1])))
            if ivs:
                lo, hi = sorted((int(a[i, 0]), int(b[i, 0])))
                if any(max(lo, l) < min(hi, h) for l, h in ivs):
                    return True
    return False


def _load_int_polys(b: bytes, g: float) -> list[list[np.ndarray]]:
    out = []
    for rings in wkb.load_polygons(bytes(b)):
        out.append([
            np.floor(np.asarray(r, np.float64) / g + 0.5).astype(np.int64)
            for r in rings
        ])
    return out


def _union_components(polys: list[tuple[int, list[np.ndarray]]]) -> list[Face]:
    """Union with bbox-component decomposition (same trick as dissolve.py):
    only parts whose boxes touch can interact, so each component unions
    independently; singletons skip the arrangement entirely."""
    from resolve_overlap_and_gap_spark.operators.dissolve import _bbox_components

    faces: list[Face] = []
    for members in _bbox_components(polys):
        if len(members) == 1:
            rings = polys[members[0]][1]
            a2 = abs(ring_area2(rings[0].astype(np.float64)))
            for h in rings[1:]:
                a2 -= abs(ring_area2(h.astype(np.float64)))
            faces.append(Face(shell=rings[0], holes=list(rings[1:]),
                              winding={0: 1}, area2=int(a2)))
        else:
            faces.extend(union_faces([polys[i] for i in members]))
    return faces


def _face_area(f: Face, g: float, cfg: EngineConfig) -> float:
    """Decision area of one face in the configured measure (planar units^2,
    or geodesic m^2 — WGS84 spheroid by default — when cfg.geodesic_measure
    and not cfg.utm, matching resolve.face_measure_areas / reference
    ST_Area(geo, true))."""
    if cfg.geodesic_measure and not cfg.utm:
        from resolve_overlap_and_gap_spark.geom.geodesic import polygon_area_m2

        return polygon_area_m2(
            [f.shell.astype(np.float64) * g]
            + [h.astype(np.float64) * g for h in f.holes],
            spheroid=cfg.geodesic_spheroid,
        )
    return f.area2 / 2.0 * g * g


def _merge_to_parent_kernel(pdf: pd.DataFrame, cfg: EngineConfig,
                            is_root: bool) -> pd.DataFrame:
    """One level of the iterated dissolve: pdf holds live gap pieces and
    kill-interval rows keyed by PARENT cell (possibly many parents per
    hashed bucket). Union live pieces per parent, then per out-face:

      - killed (touches a kill interval, or area >= min_area): its true gap
        is >= min_area — never a sliver; if it still touches the parent
        border, its border contact escalates as kill intervals so later
        siblings die too; otherwise it drops (stays a gap).
      - live, interior to parent (or at root): FINAL sliver.
      - live, border-touching: escalates as geometry.

    Input kill intervals still lying on the parent border escalate;
    interior ones have done their job this level and drop."""
    g = cfg.snap_tolerance
    min_area = cfg.min_area_to_keep
    rows = []
    for cell, sub in pdf.groupby("cell_id", sort=True):
        xmin, ymin, xmax, ymax = grid.cell_bounds_np(np.array([cell], dtype=np.int64))
        cx0 = int(np.floor(xmin[0] / g + 0.5)); cy0 = int(np.floor(ymin[0] / g + 0.5))
        cx1 = int(np.floor(xmax[0] / g + 0.5)); cy1 = int(np.floor(ymax[0] / g + 0.5))
        polys: list[tuple[int, list[np.ndarray]]] = []
        kiv_parts: list[np.ndarray] = []
        kinds = sub["kind"] if "kind" in sub.columns else ["live"] * len(sub)
        for kind, b in zip(kinds, sub["geom"]):
            if kind == "kill":
                kiv_parts.append(unpack_intervals(b))
            else:
                polys.extend((0, rings) for rings in _load_int_polys(b, g))
        kiv = (np.vstack(kiv_parts) if kiv_parts
               else np.empty((0, 4), dtype=np.int64))
        idx = _kills_index(kiv)
        out_kill: list[tuple[int, int, int, int]] = []
        for f in _union_components(polys):
            if f.area2 <= 0:
                continue
            area = _face_area(f, g, cfg)
            coords = np.vstack([f.shell] + f.holes) if f.holes else f.shell
            touches = bool(
                (coords[:, 0] == cx0).any() or (coords[:, 0] == cx1).any()
                or (coords[:, 1] == cy0).any() or (coords[:, 1] == cy1).any()
            )
            if area >= min_area or _face_touches_kill(f, idx):
                if touches and not is_root:
                    out_kill.extend(ring_border_intervals(
                        [f.shell] + f.holes, cx0, cy0, cx1, cy1))
                continue
            mp = [[f.shell.astype(np.float64) * g]
                  + [h.astype(np.float64) * g for h in f.holes]]
            kind = "live" if (touches and not is_root) else "sliver"
            rows.append((int(cell), kind, area, wkb.dump_multipolygon(mp)))
        if not is_root:
            for ax, co, lo, hi in kiv:
                if ((ax == 0 and co in (cx0, cx1))
                        or (ax == 1 and co in (cy0, cy1))):
                    out_kill.append((int(ax), int(co), int(lo), int(hi)))
            if out_kill:
                rows.append((int(cell), "kill", 0.0,
                             pack_intervals(merge_intervals(
                                 np.asarray(out_kill, np.int64)))))
    return pd.DataFrame(rows, columns=["cell_id", "kind", "gap_area", "geom"])


def reassemble_border_gaps(border_gaps: DataFrame, cfg: EngineConfig,
                           n_buckets: int = 64, level_jump: int = 3) -> DataFrame:
    """Distributed cross-cell sliver reassembly: iterated ancestor-cell
    dissolve of (cell_id[, kind], geom) border gap rows.  kind 'live' rows
    (the default when the column is absent) carry WKB gap pieces below
    min_area; kind 'kill' rows carry packed border intervals of >= min_area
    gap mass (see pack_intervals).  Returns the final sliver layer
    (gap_area, geom) — every reassembled gap face with
    0 < area < cfg.min_area_to_keep not connected to killed mass.

    level_jump coarsens several quadtree levels per iteration (ceil(res/k)
    shuffles total instead of res): grouping by a deeper ancestor is still
    exact — a face interior to ANY ancestor cell can never gain more mass —
    it just unions slightly larger neighborhoods per group, which the bbox
    component decomposition absorbs.  Mixed-resolution inputs (balanced
    grid) re-key every piece to its ancestor at the iteration's target
    level, so pieces meet at their common ancestor."""
    res_col = F.shiftrightunsigned(F.col("cell_id"), grid.RES_SHIFT).bitwiseAND(F.lit(0x1F))
    empty = border_gaps.sparkSession.createDataFrame([], T.StructType([
        T.StructField("gap_area", T.DoubleType()),
        T.StructField("geom", T.BinaryType()),
    ]))

    if "kind" not in border_gaps.columns:
        border_gaps = border_gaps.withColumn("kind", F.lit("live"))
    pending = border_gaps.select("cell_id", "kind", "geom").localCheckpoint()
    b = pending.agg(F.max(res_col).alias("hi"), F.min(res_col).alias("lo"),
                    F.count("*").alias("n")).collect()[0]
    if b["hi"] is None:
        return empty
    lmax, lmin = int(b["hi"]), int(b["lo"])
    # bounded gap mass: group everything at the root in ONE round instead
    # of ceil(res/level_jump) rounds — each round is a fixed-latency
    # shuffle + kernel + checkpoint, and at this size the root kernel sees
    # the same rows the last round would anyway.  The SAME count that
    # derived the level bounds gates it, so big inputs (100 TB border
    # mass) keep the multi-round pre-merge untouched.
    if int(b["n"]) <= ROOT_JUMP_MAX_ROWS:
        level_jump = max(level_jump, lmax)
    sliver_parts: list[DataFrame] = []

    while True:
        target = max(0, min(lmax - level_jump, lmin))
        is_root = target == 0
        # re-key each piece to its ancestor at `target` (literal shift per
        # resolution present — a handful of filters over checkpointed rows)
        parts = [pending.where(res_col == target)]
        for r in range(target + 1, lmax + 1):
            anc = F.lit(target << grid.RES_SHIFT).cast("long").bitwiseOR(
                F.shiftright(F.col("cell_id").bitwiseAND(F.lit(_ZMASK)),
                             2 * (r - target))
            )
            parts.append(pending.where(res_col == r).withColumn("cell_id", anc))
        cur = parts[0]
        for p in parts[1:]:
            cur = cur.unionByName(p)

        def _make_kernel(root: bool):
            def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
                return _merge_to_parent_kernel(pdf, cfg, root)
            return kernel

        kernel = _make_kernel(is_root)
        merged = (
            cur.withColumn("bucket", F.pmod(F.hash("cell_id"), F.lit(n_buckets)))
            .groupBy("bucket").applyInPandas(kernel, MERGE_SCHEMA)
        ).localCheckpoint()
        sliver_parts.append(merged.where(F.col("kind") == "sliver")
                            .select("gap_area", "geom"))
        if is_root:
            break
        pending = merged.where(F.col("kind") != "sliver")  # checkpointed via merged
        # kill intervals alone can never produce slivers
        if pending.where(F.col("kind") == "live").isEmpty():
            break
        lmax = lmin = target

    out = sliver_parts[0]
    for p in sliver_parts[1:]:
        out = out.unionByName(p)
    return out


def _kill_intervals_udf(cfg: EngineConfig):
    """(cell_id, WKB gap geom) -> packed border-contact intervals of the
    geometry with its cell's border lines (null when there is no
    positive-length contact)."""
    g = cfg.snap_tolerance

    @F.pandas_udf(T.BinaryType())
    def kiv(cell_ids: pd.Series, geoms: pd.Series) -> pd.Series:
        out = []
        for cid, b in zip(cell_ids, geoms):
            xmin, ymin, xmax, ymax = grid.cell_bounds_np(
                np.array([int(cid)], dtype=np.int64))
            cx0 = int(np.floor(xmin[0] / g + 0.5)); cy0 = int(np.floor(ymin[0] / g + 0.5))
            cx1 = int(np.floor(xmax[0] / g + 0.5)); cy1 = int(np.floor(ymax[0] / g + 0.5))
            iv: list = []
            for rings in _load_int_polys(b, g):
                iv.extend(ring_border_intervals(rings, cx0, cy0, cx1, cy1))
            out.append(pack_intervals(merge_intervals(np.asarray(iv, np.int64)))
                       if iv else None)
        return pd.Series(out, dtype=object)

    return kiv


def border_gaps_from_resolve(both: DataFrame) -> DataFrame:
    """resolve(..., emit_border_gaps=True) output -> the (cell_id, kind,
    geom) frame border_gap_merge expects: GAP_OWNER rows are live sub-min
    gap pieces, KILL_OWNER rows carry packed border intervals of
    >= min_area border gaps."""
    from resolve_overlap_and_gap_spark.operators.resolve import (
        GAP_OWNER,
        KILL_OWNER,
    )

    return both.where(F.col("owner").isin(GAP_OWNER, KILL_OWNER)).select(
        "cell_id",
        F.when(F.col("owner") == GAP_OWNER, F.lit("live"))
        .otherwise(F.lit("kill")).alias("kind"),
        "geom",
    )


def _geodesic_area_udf(cfg: EngineConfig):
    from resolve_overlap_and_gap_spark.geom.geodesic import polygon_area_m2

    @F.pandas_udf(T.DoubleType())
    def area_m2(geoms: pd.Series) -> pd.Series:
        vals = np.empty(len(geoms), dtype=np.float64)
        for i, b in enumerate(geoms):
            vals[i] = sum(
                polygon_area_m2([np.asarray(r, np.float64) for r in rings],
                                spheroid=cfg.geodesic_spheroid)
                for rings in wkb.load_polygons(bytes(b))
            )
        return pd.Series(vals)

    return area_m2


def border_gap_merge(features: DataFrame, pieces: DataFrame, cfg: EngineConfig,
                     res: int = 8, border_gaps: DataFrame | None = None,
                     checkpoint: bool = True,
                     dissolve_disjoint: bool = False,
                     dissolve_geom: bool = True,
                     piece_res: list[int] | None = None) -> DataFrame:
    """-> (owner, area, geom) — the final healed layer.

    features: the ORIGINAL polygon layer (fid, geom) — used to detect gaps
    when border_gaps is not supplied.
    pieces: resolve() output (cell_id, owner, other_ids, area, geom).
    border_gaps: optional (cell_id[, kind], geom) border-gap rows — pass
    border_gaps_from_resolve(resolve(..., emit_border_gaps=True)) to reuse
    the resolve overlay instead of running a second full detection.  kind
    'live' rows (default) are sub-min gap pieces; 'kill' rows carry packed
    border intervals of >= min_area border gaps (without them, sub-min
    fragments of a big cross-border gap would be wrongly merged into
    owners).  A geom-only frame is accepted (all-live; cell assigned from
    the bbox center — exact, since each per-cell gap piece lies inside one
    cell).
    checkpoint: set False when the caller already materialized pieces
    (avoids a redundant eager localCheckpoint).
    dissolve_disjoint / dissolve_geom: forwarded to the final owner
    dissolve — resolve pieces partition the plane, so callers that do not
    re-emit the healed geometry (the benched resolve_healed emits
    owner/area/n_parts only) can run the bucket-batched union and skip
    the WKB dumps; defaults keep the exact per-key path with geometry.
    piece_res: the distinct cell resolutions present in `pieces` when the
    caller knows them (fixed-res resolve: [res]) — skips a distinct+collect
    over the pieces table; None derives them from the data (balanced
    resolve emits mixed resolutions).
    """
    g = cfg.snap_tolerance
    spark = pieces.sparkSession
    # pieces feeds BOTH the sliver-candidate join and the final owner
    # dissolve — materialize once or the whole resolve pipeline recomputes
    # per consumer (measured 2x wall on the healed pipeline)
    if checkpoint:
        pieces = pieces.localCheckpoint()

    # 1. border-touching gap faces, split by the min_area threshold:
    #    sub-min pieces reassemble as live geometry; >= min_area gap mass
    #    rides along as kill intervals (its border contact only) so any
    #    live fragment connected to it is recognized as part of a
    #    >= min_area gap and stays a gap instead of merging into an owner.
    if border_gaps is None:
        det = detect_all(features, cfg, res=res).where(
            "kind = 'gap' and touches_border")
        if cfg.geodesic_measure and not cfg.utm:
            # detection areas are planar; the m^2 threshold needs the
            # geodesic measure per piece (Arrow-batched, gap rows only)
            det = det.withColumn("_dec_area",
                                 _geodesic_area_udf(cfg)(F.col("geom")))
        else:
            det = det.withColumn("_dec_area", F.col("area"))
        det = det.localCheckpoint()
        live = det.where(F.col("_dec_area") < cfg.min_area_to_keep).select(
            "cell_id", F.lit("live").alias("kind"), "geom")
        big = det.where(F.col("_dec_area") >= cfg.min_area_to_keep).select(
            "cell_id",
            _kill_intervals_udf(cfg)(F.col("cell_id"), F.col("geom")).alias("geom"),
        )
        kill = big.where(F.col("geom").isNotNull()).select(
            "cell_id", F.lit("kill").alias("kind"), "geom")
        border_gaps = live.unionByName(kill)
    elif "cell_id" not in border_gaps.columns:
        # bbox center is strictly interior to the piece's (unique) cell
        from resolve_overlap_and_gap_spark.operators.overlap_gap import wkb_bounds

        b = border_gaps.withColumn("_b", wkb_bounds(F.col("geom")))
        border_gaps = b.select(
            grid.cell_id_col((F.col("_b.xmin") + F.col("_b.xmax")) / 2,
                             (F.col("_b.ymin") + F.col("_b.ymax")) / 2,
                             res).alias("cell_id"),
            "geom",
        )

    # 2. reassemble across cells: distributed iterated parent-cell dissolve.
    #    (already materialized: built from the loop's checkpointed outputs)
    slivers = reassemble_border_gaps(border_gaps, cfg)
    if slivers.isEmpty():
        from resolve_overlap_and_gap_spark.operators.dissolve import dissolve

        # n_salts='auto': one count agg decides whether any owner is hot
        # enough to need the two-level salted union (a single giant owner
        # must never serialize the heal's final dissolve);
        # auto_checkpoint=False — pieces is already materialized above
        return dissolve(pieces.select("owner", "geom"), "owner", g,
                        n_salts="auto", auto_checkpoint=False,
                        disjoint=dissolve_disjoint,
                        with_geom=dissolve_geom).withColumnRenamed("key", "owner")

    # 3. slivers join candidate pieces sharing a covering cell with the
    #    sliver bbox (J1); adjacency per sliver via overlay; choose
    #    longest-shared-border piece (ST_RemEdgeNewFace rule).
    #    Pieces may sit at MIXED resolutions (balanced-grid resolve): key
    #    the sliver at every resolution present so the equi-join matches
    #    every piece (the res dim is a handful of values).
    sl_df = slivers.select(
        F.monotonically_increasing_id().alias("gap_id"),
        "gap_area",
        F.col("geom").alias("gap_geom"),
    ).localCheckpoint()
    if piece_res is None:
        res_col = F.shiftrightunsigned(
            F.col("cell_id"), grid.RES_SHIFT).bitwiseAND(F.lit(0x1F))
        piece_res = sorted(int(r.r) for r in
                           pieces.select(res_col.alias("r")).distinct().collect())
    if not piece_res:
        piece_res = [res]  # no pieces at all: keep the join shape (empty)
    sl_in = (sl_df.withColumnRenamed("gap_geom", "geom")
             .withColumnRenamed("gap_id", "fid"))
    sl_cells = None
    for r in piece_res:
        part = with_cells(sl_in, r).select(
            F.col("fid").alias("gap_id"), F.col("gap_area"),
            F.col("geom").alias("gap_geom"), F.col("cell_id"))
        sl_cells = part if sl_cells is None else sl_cells.unionByName(part)
    cand = sl_cells.join(
        pieces.select("cell_id", "owner", F.col("geom").alias("piece_geom")), "cell_id"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for gap_id, sub in pdf.groupby("gap_id", sort=True):
            gap_geom = sub["gap_geom"].iloc[0]
            polys = [(-2, rings) for rings in _load_int_polys(gap_geom, g)]
            # bbox prefilter (expanded by 1 grid unit): a piece can share
            # border with the sliver only if their boxes touch — cuts the
            # overlay from all cell-mates (~hundreds) to actual neighbors
            gx0 = min(r[:, 0].min() for _, rings in polys for r in rings) - 1
            gy0 = min(r[:, 1].min() for _, rings in polys for r in rings) - 1
            gx1 = max(r[:, 0].max() for _, rings in polys for r in rings) + 1
            gy1 = max(r[:, 1].max() for _, rings in polys for r in rings) + 1
            owners = {}
            k = 0
            for owner, pg in zip(sub["owner"], sub["piece_geom"]):
                for rings in _load_int_polys(pg, g):
                    s = rings[0]
                    if (s[:, 0].min() > gx1 or s[:, 0].max() < gx0
                            or s[:, 1].min() > gy1 or s[:, 1].max() < gy0):
                        continue
                    polys.append((1000 + k, rings))
                    owners[1000 + k] = int(owner)
                    k += 1
            faces, adj = overlay(polys, with_adjacency=True)
            # face indices covered by the gap vs by pieces
            gap_faces = {i for i, f in enumerate(faces) if -2 in f.cover}
            best_owner, best_len = None, -1.0
            shared: dict[int, float] = {}
            for (a, b), L in adj.items():
                if a < 0 or b < 0:
                    continue
                fa_gap, fb_gap = a in gap_faces, b in gap_faces
                if fa_gap == fb_gap:
                    continue
                piece_face = b if fa_gap else a
                for p in faces[piece_face].cover:
                    if p >= 1000:
                        shared[owners[p]] = shared.get(owners[p], 0.0) + L
            if shared:
                best_owner = min(shared, key=lambda o: (-shared[o], o))
            if best_owner is not None:
                ga = float(sub["gap_area"].iloc[0]) if "gap_area" in sub else 0.0
                out.append((best_owner, ga, bytes(gap_geom)))
        return pd.DataFrame(out, columns=["owner", "gap_area", "geom"])

    assigned = cand.groupBy("gap_id").applyInPandas(
        lambda pdf: kernel(pdf), ASSIGN_SCHEMA
    )

    # 4. final healed layer: dissolve pieces + absorbed slivers per owner
    #    (union_faces removes internal cell-border edges AND welds the
    #    absorbed gap slivers into their new owner's geometry).
    #    assigned is tiny (one row per sliver) — materialize it so the
    #    auto-salt count agg below doesn't recompute the sliver kernel;
    #    n_salts='auto' keeps a hot owner from serializing the union.
    from resolve_overlap_and_gap_spark.operators.dissolve import dissolve

    combined = pieces.select("owner", "geom").unionByName(
        assigned.select("owner", "geom").localCheckpoint()
    )
    # auto_checkpoint=False: both union branches are materialized already
    # (pieces by the caller/checkpoint above, assigned just now) — the
    # auto-salt sizing count re-reads cached partitions instead of
    # re-materializing ~150 MB of geometry
    return dissolve(combined, "owner", g, n_salts="auto",
                    auto_checkpoint=False, disjoint=dissolve_disjoint,
                    with_geom=dissolve_geom).withColumnRenamed("key", "owner")
