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
