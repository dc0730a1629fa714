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
parent cells and could only attach through the parent border.  A face that
reaches min_area while still touching a border is dropped immediately
(union area only grows; it can never become a sliver).

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
    T.StructField("touches", T.BooleanType()),   # touches parent border
    T.StructField("gap_area", T.DoubleType()),
    T.StructField("geom", T.BinaryType()),
])

_ZMASK = (1 << grid.RES_SHIFT) - 1


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
    or spherical m^2 when cfg.geodesic_measure and not cfg.utm — matching
    resolve.face_measure_areas / reference ST_Area(geo, true))."""
    if cfg.geodesic_measure and not cfg.utm:
        from resolve_overlap_and_gap_spark.geom.geodesic import polygon_area_m2

        return polygon_area_m2(
            [f.shell.astype(np.float64) * g]
            + [h.astype(np.float64) * g for h in f.holes]
        )
    return f.area2 / 2.0 * g * g


def _merge_to_parent_kernel(pdf: pd.DataFrame, cfg: EngineConfig) -> pd.DataFrame:
    """One level of the iterated dissolve: pdf holds gap pieces keyed by
    PARENT cell (possibly many parents per hashed bucket). Union per parent,
    test each out-face against the parent border, drop faces that can no
    longer become slivers (area >= min_area)."""
    g = cfg.snap_tolerance
    min_area = cfg.min_area_to_keep
    rows = []
    for cell, sub in pdf.groupby("cell_id", sort=True):
        xmin, ymin, xmax, ymax = grid.cell_bounds_np(np.array([cell], dtype=np.int64))
        cx0 = int(np.floor(xmin[0] / g + 0.5)); cy0 = int(np.floor(ymin[0] / g + 0.5))
        cx1 = int(np.floor(xmax[0] / g + 0.5)); cy1 = int(np.floor(ymax[0] / g + 0.5))
        polys: list[tuple[int, list[np.ndarray]]] = []
        for b in sub["geom"]:
            polys.extend((0, rings) for rings in _load_int_polys(b, g))
        for f in _union_components(polys):
            if f.area2 <= 0:
                continue
            area = _face_area(f, g, cfg)
            if area >= min_area:
                continue  # union only grows: never a sliver, final or not
            coords = np.vstack([f.shell] + f.holes) if f.holes else f.shell
            touches = bool(
                (coords[:, 0] == cx0).any() or (coords[:, 0] == cx1).any()
                or (coords[:, 1] == cy0).any() or (coords[:, 1] == cy1).any()
            )
            mp = [[f.shell.astype(np.float64) * g]
                  + [h.astype(np.float64) * g for h in f.holes]]
            rows.append((int(cell), touches, area, wkb.dump_multipolygon(mp)))
    return pd.DataFrame(rows, columns=["cell_id", "touches", "gap_area", "geom"])


def reassemble_border_gaps(border_gaps: DataFrame, cfg: EngineConfig,
                           n_buckets: int = 64, level_jump: int = 3) -> DataFrame:
    """Distributed cross-cell sliver reassembly: iterated ancestor-cell
    dissolve of (cell_id, geom) border gap pieces.  Returns the final
    sliver layer (gap_area, geom) — every reassembled gap face with
    0 < area < cfg.min_area_to_keep.

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

    pending = border_gaps.select("cell_id", "geom").localCheckpoint()
    b = pending.agg(F.max(res_col).alias("hi"), F.min(res_col).alias("lo")).collect()[0]
    if b["hi"] is None:
        return empty
    lmax, lmin = int(b["hi"]), int(b["lo"])
    sliver_parts: list[DataFrame] = []

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _merge_to_parent_kernel(pdf, cfg)

    while True:
        target = max(0, min(lmax - level_jump, lmin))
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
        merged = (
            cur.withColumn("bucket", F.pmod(F.hash("cell_id"), F.lit(n_buckets)))
            .groupBy("bucket").applyInPandas(kernel, MERGE_SCHEMA)
        ).localCheckpoint()
        # at the root (target 0) there is nothing beyond the border: final
        done = merged.where(~F.col("touches") | F.lit(target == 0))
        sliver_parts.append(done.select("gap_area", "geom"))
        if target == 0:
            break
        pending = merged.where(F.col("touches"))  # checkpointed via merged
        if pending.isEmpty():
            break
        lmax = lmin = target

    out = sliver_parts[0]
    for p in sliver_parts[1:]:
        out = out.unionByName(p)
    return out


def _geodesic_area_udf(cfg: EngineConfig):
    from resolve_overlap_and_gap_spark.geom.geodesic import polygon_area_m2

    @F.pandas_udf(T.DoubleType())
    def area_m2(geoms: pd.Series) -> pd.Series:
        vals = np.empty(len(geoms), dtype=np.float64)
        for i, b in enumerate(geoms):
            vals[i] = sum(
                polygon_area_m2([np.asarray(r, np.float64) for r in rings])
                for rings in wkb.load_polygons(bytes(b))
            )
        return pd.Series(vals)

    return area_m2


def border_gap_merge(features: DataFrame, pieces: DataFrame, cfg: EngineConfig,
                     res: int = 8, border_gaps: DataFrame | None = None,
                     checkpoint: bool = True) -> DataFrame:
    """-> (owner, area, geom) — the final healed layer.

    features: the ORIGINAL polygon layer (fid, geom) — used to detect gaps
    when border_gaps is not supplied.
    pieces: resolve() output (cell_id, owner, other_ids, area, geom).
    border_gaps: optional (cell_id, geom) of border-touching sub-min gap
    faces — pass resolve(..., emit_border_gaps=True)'s GAP_OWNER rows to
    reuse the resolve overlay instead of running a second full detection.
    A geom-only frame is accepted (cell assigned from the bbox center —
    exact, since each per-cell gap piece lies inside one cell).
    checkpoint: set False when the caller already materialized pieces
    (avoids a redundant eager localCheckpoint).
    """
    g = cfg.snap_tolerance
    spark = pieces.sparkSession
    # pieces feeds BOTH the sliver-candidate join and the final owner
    # dissolve — materialize once or the whole resolve pipeline recomputes
    # per consumer (measured 2x wall on the healed pipeline)
    if checkpoint:
        pieces = pieces.localCheckpoint()

    # 1. border-touching gap faces. Only pieces below min_area can be part
    #    of a cross-border sliver (if any piece is >= min_area the
    #    reassembled gap is too) — exact pre-filter that excludes the large
    #    open-world gaps from the union below.
    if border_gaps is None:
        det = detect_all(features, cfg, res=res)
        if cfg.geodesic_measure and not cfg.utm:
            # detection areas are planar; the m^2 prefilter needs the
            # geodesic measure per piece (Arrow-batched, gap rows only)
            gaps = det.where("kind = 'gap' and touches_border")
            border_gaps = gaps.where(
                _geodesic_area_udf(cfg)(F.col("geom")) < cfg.min_area_to_keep
            ).select("cell_id", "geom")
        else:
            border_gaps = det.where(
                f"kind = 'gap' and touches_border and area < {cfg.min_area_to_keep}"
            ).select("cell_id", "geom")
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

        return dissolve(pieces.select("owner", "geom"), "owner", g).withColumnRenamed(
            "key", "owner"
        )

    # 3. slivers join candidate pieces sharing a covering cell with the
    #    sliver bbox (J1); adjacency per sliver via overlay; choose
    #    longest-shared-border piece (ST_RemEdgeNewFace rule)
    sl_df = slivers.select(
        F.monotonically_increasing_id().alias("gap_id"),
        "gap_area",
        F.col("geom").alias("gap_geom"),
    ).localCheckpoint()
    sl_cells = with_cells(sl_df.withColumnRenamed("gap_geom", "geom")
                          .withColumnRenamed("gap_id", "fid"), res)
    sl_cells = sl_cells.select(F.col("fid").alias("gap_id"), F.col("gap_area"),
                               F.col("geom").alias("gap_geom"), F.col("cell_id"))
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
    #    absorbed gap slivers into their new owner's geometry)
    from resolve_overlap_and_gap_spark.operators.dissolve import dissolve

    combined = pieces.select("owner", "geom").unionByName(
        assigned.select("owner", "geom")
    )
    return dissolve(combined, "owner", g).withColumnRenamed("key", "owner")
