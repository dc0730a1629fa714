"""Boundary-exchange pass — the cross-cell reconciliation that makes the
parallel per-cell resolve match a single-cell run (the reference's border
job phases: heal + border small-face removal, job types 4/5/6,
function_resolve_overlap_gap_single_cell.sql:597-787).

Per-cell resolve defers any face touching its cell border (they stay
unmerged there). This pass:

  1. collects gap faces that touch cell borders (from detection),
  2. dissolves them ACROSS cells (union_faces heals the grid-border edges,
     reassembling each sliver that was split by a border),
  3. for each reassembled gap below min_area, finds the adjacent resolved
     piece with the LONGEST shared border (an overlay adjacency — exactly
     the ST_RemEdgeNewFace rule) and merges the gap into it,
  4. emits updated pieces (geometry re-dissolved per owner).

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

from resolve_overlap_and_gap_spark.config import EngineConfig
from resolve_overlap_and_gap_spark.geom import wkb
from resolve_overlap_and_gap_spark.geom.arrangement import Face, overlay, union_faces
from resolve_overlap_and_gap_spark.operators.overlap_gap import detect_all, with_cells

ASSIGN_SCHEMA = T.StructType([
    T.StructField("owner", T.LongType()),
    T.StructField("gap_area", T.DoubleType()),
    T.StructField("geom", T.BinaryType()),
])


def _load_int_polys(b: bytes, g: float) -> list[list[np.ndarray]]:
    out = []
    for rings in wkb.load_polygons(bytes(b)):
        out.append([
            np.floor(np.asarray(r, np.float64) / g + 0.5).astype(np.int64)
            for r in rings
        ])
    return out


def border_gap_merge(features: DataFrame, pieces: DataFrame, cfg: EngineConfig,
                     res: int = 8, border_gaps: DataFrame | None = None) -> DataFrame:
    """-> (owner, area, geom) — the final healed layer.

    features: the ORIGINAL polygon layer (fid, geom) — used to detect gaps
    when border_gaps is not supplied.
    pieces: resolve() output (cell_id, owner, other_ids, area, geom).
    border_gaps: optional (geom) of border-touching sub-min gap faces —
    pass resolve(..., emit_border_gaps=True)'s GAP_OWNER rows to reuse the
    resolve overlay instead of running a second full detection.
    """
    g = cfg.snap_tolerance
    spark = pieces.sparkSession
    # pieces feeds BOTH the sliver-candidate join and the final owner
    # dissolve — materialize once or the whole resolve pipeline recomputes
    # per consumer (measured 2x wall on the healed pipeline)
    pieces = pieces.localCheckpoint()

    # 1. border-touching gap faces. Only pieces below min_area can be part
    #    of a cross-border sliver (if any piece is >= min_area the
    #    reassembled gap is too) — exact pre-filter that excludes the large
    #    open-world gaps from the union below.
    if border_gaps is None:
        det = detect_all(features, cfg, res=res)
        border_gaps = det.where(
            f"kind = 'gap' and touches_border and area < {cfg.min_area_to_keep}"
        ).select("geom")

    # 2. reassemble across cells: global dissolve of border gap pieces.
    #    Gap mass is sparse (slivers); a single-partition union is bounded.
    gap_rows = [r.geom for r in border_gaps.collect()]
    gap_polys = []
    for b in gap_rows:
        gap_polys.extend((0, rings) for rings in _load_int_polys(b, g))
    # component decomposition: slivers from distant borders can't interact,
    # so union per bbox-overlap component (same trick as dissolve.py)
    from resolve_overlap_and_gap_spark.operators.dissolve import _bbox_components

    merged = []
    if gap_polys:
        for members in _bbox_components(gap_polys):
            if len(members) == 1:
                rings = gap_polys[members[0]][1]
                from resolve_overlap_and_gap_spark.geom.core import ring_area2

                a2 = abs(ring_area2(rings[0].astype(np.float64)))
                for h in rings[1:]:
                    a2 -= abs(ring_area2(h.astype(np.float64)))
                merged.append(Face(shell=rings[0], holes=list(rings[1:]),
                                   winding={0: 1}, area2=int(a2)))
            else:
                merged.extend(union_faces([gap_polys[i] for i in members]))
    min_area2 = 2.0 * cfg.min_area_to_keep / (g * g)
    slivers = [f for f in merged if 0 < f.area2 < min_area2]
    if not slivers:
        from resolve_overlap_and_gap_spark.operators.dissolve import dissolve

        return dissolve(pieces.select("owner", "geom"), "owner", g).withColumnRenamed(
            "key", "owner"
        )

    # 3. ship slivers as a small dim table; candidates = pieces sharing a
    #    covering cell with the sliver bbox (J1), adjacency per sliver via
    #    overlay; choose longest-shared-border piece (ST_RemEdgeNewFace rule)
    sl_rows = []
    for i, f in enumerate(slivers):
        mp = [[f.shell.astype(np.float64) * g]
              + [h.astype(np.float64) * g for h in f.holes]]
        sl_rows.append((i, f.area2 / 2.0 * g * g, wkb.dump_multipolygon(mp)))
    sl_df = spark.createDataFrame(pd.DataFrame(sl_rows, columns=["gap_id", "gap_area", "gap_geom"]))
    sl_cells = with_cells(sl_df.withColumnRenamed("gap_geom", "geom")
                          .withColumnRenamed("gap_id", "fid"), res)
    sl_cells = sl_cells.select(F.col("fid").alias("gap_id"), F.col("geom").alias("gap_geom"),
                               F.col("cell_id"))
    cand = sl_cells.join(
        pieces.select("cell_id", "owner", F.col("geom").alias("piece_geom")), "cell_id"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for gap_id, sub in pdf.groupby("gap_id", sort=True):
            gap_geom = sub["gap_geom"].iloc[0]
            polys = [(-2, rings) for rings in _load_int_polys(gap_geom, g)]
            owners = {}
            for k, (owner, pg) in enumerate(zip(sub["owner"], sub["piece_geom"])):
                for rings in _load_int_polys(pg, g):
                    polys.append((1000 + k, rings))
                owners[1000 + k] = int(owner)
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

    cand = cand.join(sl_df.select("gap_id", "gap_area"), "gap_id")
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
