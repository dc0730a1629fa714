"""Line-layer operators — the reference's attribute-bearing border lines
path (line_table_name in types_resolve_overlap.sql:1-7; ar5 scenario,
src/test/sql/regress/resolve_overlap_and_gap.sql:202-222).

polygonize_lines: node a LineString network per cell and extract the faces
it encloses (TopoGeo_addLinestring + GetFaceGeometry semantics,
SURVEY.md §2.9) — the engine path for layers whose geometry arrives as
borders rather than polygons.

edge_attributes: J7 — after polygonize, recover which input line each face
border came from (lineage-carried, not re-joined: each noded sub-segment
remembers its source line id, replacing the reference's ST_DWithin re-join
…single_cell.sql:390-414).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from resolve_overlap_and_gap_spark.geom import wkb
from resolve_overlap_and_gap_spark.geom.arrangement import (
    Arrangement,
    label_walks,
    node_segments,
)

POLYGONIZE_SCHEMA = T.StructType([
    T.StructField("face_id", T.LongType()),
    T.StructField("area", T.DoubleType()),
    T.StructField("geom", T.BinaryType()),
    T.StructField("border_line_ids", T.ArrayType(T.LongType())),
])


def _polygonize_batch(pdf: pd.DataFrame, grid_size: float) -> pd.DataFrame:
    """Node all lines of the batch, walk faces, emit positive walks with
    the distinct source-line ids along their borders (sorted)."""
    segs, lids = [], []
    for lid, b in zip(pdf["lid"], pdf["geom"]):
        kind, coords = wkb.load(bytes(b))
        if kind != "linestring":
            continue
        c = np.floor(np.asarray(coords, np.float64) / grid_size + 0.5).astype(np.int64)
        keep = (np.diff(c, axis=0) != 0).any(axis=1)
        s = np.hstack([c[:-1][keep], c[1:][keep]])
        segs.append(s)
        lids.extend([int(lid)] * len(s))
    if not segs:
        return pd.DataFrame(columns=["face_id", "area", "geom", "border_line_ids"])
    S = np.vstack(segs)
    pid = np.asarray(lids, dtype=np.int64)
    wt = np.ones(len(S), dtype=np.int64)
    S, pid, wt = node_segments(S, pid, wt)
    # for lines, every noded segment is an edge regardless of net winding:
    # feed each one twice (both directions cancel nowhere) — Arrangement
    # keeps an edge when its net dict is non-empty, so use distinct pids
    # per direction trick: keep as-is (wt=1) which preserves all edges.
    arr = Arrangement(S, pid, wt)
    # source lines per undirected edge
    edge_lines: dict[int, set[int]] = defaultdict(set)
    for eid, net in enumerate(arr.net):
        edge_lines[eid] = set(net.keys())
    rows = []
    k = 0
    for wid, a2 in enumerate(arr.walk_area2):
        if a2 <= 0:
            continue
        coords = arr.walk_coords(wid)
        lids_here: set[int] = set()
        for h in arr.walks[wid]:
            lids_here |= edge_lines[h // 2]
        rows.append((
            k,
            a2 / 2.0 * grid_size * grid_size,
            wkb.dump_polygon([coords.astype(np.float64) * grid_size]),
            sorted(lids_here),
        ))
        k += 1
    out = pd.DataFrame(rows, columns=["face_id", "area", "geom", "border_line_ids"])
    return out


def polygonize_lines(lines: DataFrame, grid_size: float,
                     geom_col: str = "geom", id_col: str = "lid") -> DataFrame:
    """Single-partition polygonize (line networks are small relative to the
    polygon layer; the reference runs its ar5 line phase single-threaded
    too — function_resolve_overlap_gap_run.sql:202-276). face_id is ordered
    by face min-vertex for determinism."""
    slim = lines.select(F.col(id_col).cast("long").alias("lid"), F.col(geom_col).alias("geom"))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = _polygonize_batch(pdf, grid_size)
        if len(out):
            # deterministic ids: sort by (area, wkb bytes)
            out = out.sort_values(["area", "geom"], kind="mergesort").reset_index(drop=True)
            out["face_id"] = np.arange(len(out), dtype=np.int64)
        return out

    return (
        slim.coalesce(1)
        .withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(lambda pdf: kernel(pdf), POLYGONIZE_SCHEMA)
    )


RESOLVE_LINES_SCHEMA = T.StructType([
    T.StructField("cell_id", T.LongType()),
    T.StructField("owner", T.LongType()),
    T.StructField("other_ids", T.ArrayType(T.LongType())),
    T.StructField("border_line_ids", T.ArrayType(T.LongType())),
    T.StructField("area", T.DoubleType()),
    T.StructField("geom", T.BinaryType()),
])


def resolve_with_lines(polygons: DataFrame, lines: DataFrame, cfg, res: int = 8,
                       n_buckets: int = 256) -> DataFrame:
    """The ar5 scenario (polygon layer + attribute-bearing border lines,
    resolve_overlap_and_gap.sql:202-222): lines participate in the per-cell
    arrangement as CUT LINES — they split faces without affecting coverage —
    and every output face reports the line ids on its border (J7,
    lineage-carried). One extra covering-cell join for the line layer."""
    from pyspark.sql import functions as FF

    from resolve_overlap_and_gap_spark import grid as G
    from resolve_overlap_and_gap_spark.operators.overlap_gap import (
        UNIVERSE, _clip_to_cell, _snap_polys, with_cells,
    )
    from resolve_overlap_and_gap_spark.geom.arrangement import overlay
    from resolve_overlap_and_gap_spark.geom.core import clip_ring_to_box

    g = cfg.snap_tolerance
    feats = polygons.select(
        FF.col("fid").cast("long").alias("fid"), "geom"
    )
    pcells = with_cells(feats, res).select(
        "cell_id", FF.col("fid"), FF.col("geom"), FF.lit("poly").alias("kind")
    )
    lfeats = lines.select(FF.col("lid").cast("long").alias("fid"), "geom")
    lcells = with_cells(lfeats, res).select(
        "cell_id", FF.col("fid"), FF.col("geom"), FF.lit("line").alias("kind")
    )
    cells = pcells.unionByName(lcells).withColumn(
        "bucket", FF.pmod(FF.hash("cell_id"), FF.lit(n_buckets))
    )

    def one_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        cell = int(pdf["cell_id"].iloc[0])
        xmin, ymin, xmax, ymax = G.cell_bounds_np(np.array([cell], dtype=np.int64))
        cx0 = int(np.floor(xmin[0] / g + 0.5)); cy0 = int(np.floor(ymin[0] / g + 0.5))
        cx1 = int(np.floor(xmax[0] / g + 0.5)); cy1 = int(np.floor(ymax[0] / g + 0.5))
        polys, cut = [], []
        for kind, fid, geom in zip(pdf["kind"], pdf["fid"], pdf["geom"]):
            if kind == "poly":
                for pid2, rings in _snap_polys(int(fid), geom, g):
                    clipped = _clip_to_cell(rings, cx0, cy0, cx1, cy1)
                    if clipped:
                        polys.append((pid2, clipped))
            else:
                k2, coords = wkb.load(bytes(geom))
                if k2 != "linestring":
                    continue
                c = np.floor(np.asarray(coords, np.float64) / g + 0.5)
                # clamp into the cell box (cut lines need no exact clip —
                # out-of-cell parts are re-cut in their own cells)
                c[:, 0] = np.clip(c[:, 0], cx0, cx1)
                c[:, 1] = np.clip(c[:, 1], cy0, cy1)
                cut.append((int(fid), c.astype(np.int64)))
        box = np.array([[cx0, cy0], [cx1, cy0], [cx1, cy1], [cx0, cy1]], np.int64)
        polys.append((UNIVERSE, [box]))
        faces = overlay(polys, cut_lines=cut)
        rows = []
        for f in faces:
            cover = sorted(p for p in f.cover if p != UNIVERSE)
            if not cover:
                continue
            mp = [[f.shell.astype(np.float64) * g]
                  + [h.astype(np.float64) * g for h in f.holes]]
            rows.append((cell, cover[0], cover[1:], f.lines,
                         f.area2 / 2.0 * g * g, wkb.dump_multipolygon(mp)))
        return pd.DataFrame(rows, columns=[
            "cell_id", "owner", "other_ids", "border_line_ids", "area", "geom"])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = [one_cell(sub) for _, sub in pdf.groupby("cell_id", sort=True)]
        if not parts:
            return pd.DataFrame(columns=[f.name for f in RESOLVE_LINES_SCHEMA])
        return pd.concat(parts, ignore_index=True)

    return cells.groupBy("bucket").applyInPandas(kernel, RESOLVE_LINES_SCHEMA)


VALIDATE_SCHEMA = T.StructType([
    T.StructField("n_features", T.LongType()),
    T.StructField("n_overlap_pairs", T.LongType()),
    T.StructField("overlap_area", T.DoubleType()),
    T.StructField("n_interior_gaps", T.LongType()),
    T.StructField("interior_gap_area", T.DoubleType()),
    T.StructField("is_valid_coverage", T.BooleanType()),
])


def validate_coverage(features: DataFrame, cfg, res: int = 8,
                      min_gap_area: float = 0.0) -> DataFrame:
    """ValidateTopology analog (function_resolve_overlap_gap_run.sql:390-424
    — 0 rows = valid): a layer is a valid coverage iff it has no overlaps
    and no interior gaps above min_gap_area. One detection pass."""
    from resolve_overlap_and_gap_spark.operators.overlap_gap import detect_all

    det = detect_all(features, cfg, res=res)
    agg = det.agg(
        F.sum(F.when(F.col("kind") == "overlap", 1).otherwise(0)).alias("n_overlap_pairs"),
        F.sum(F.when(F.col("kind") == "overlap", F.col("area")).otherwise(0.0)).alias("overlap_area"),
        F.sum(F.when((F.col("kind") == "gap") & ~F.col("touches_border")
                     & (F.col("area") > min_gap_area), 1).otherwise(0)).alias("n_interior_gaps"),
        F.sum(F.when((F.col("kind") == "gap") & ~F.col("touches_border")
                     & (F.col("area") > min_gap_area), F.col("area")).otherwise(0.0)).alias("interior_gap_area"),
    )
    n = features.count()
    return agg.select(
        F.lit(n).alias("n_features"),
        F.coalesce(F.col("n_overlap_pairs"), F.lit(0)).alias("n_overlap_pairs"),
        F.coalesce(F.col("overlap_area"), F.lit(0.0)).alias("overlap_area"),
        F.coalesce(F.col("n_interior_gaps"), F.lit(0)).alias("n_interior_gaps"),
        F.coalesce(F.col("interior_gap_area"), F.lit(0.0)).alias("interior_gap_area"),
        ((F.coalesce(F.col("n_overlap_pairs"), F.lit(0)) == 0)
         & (F.coalesce(F.col("n_interior_gaps"), F.lit(0)) == 0)).alias("is_valid_coverage"),
    )
