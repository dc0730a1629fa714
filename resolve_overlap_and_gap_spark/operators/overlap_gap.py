"""Overlap / gap detection engine — the Spark-native re-creation of
find-overlap-and-gap (reference inlined at
src/test/sql/regress/find_overlap_and_gap-pre.sql:297-757; per-cell kernel
:525-757).

Reference per-cell semantics:
  clip features to the cell (ST_Intersection, drop zero area :556-585) ->
  overlaps: self-join `&& AND ST_Overlaps AND NOT ST_Equals`, emit
  ST_Intersection with area > 0 (:618-646) ->
  gaps: ST_Difference(cell_geo, ST_Union(data)) dumped to parts (:650-688).

Spark realization: one covering-cell explode (JVM), one shuffle
(repartition by cell), one `applyInPandas` running the snapped integer
arrangement per cell. The arrangement gives overlaps AND gaps AND counts in
a single pass (faces labeled with their winding cover set), instead of the
reference's three scans.

Cross-cell exactness: cell borders are snapped-grid-aligned, every feature
is clipped to each cell it touches with exact integer Sutherland–Hodgman,
so per-cell faces tile exactly and pair overlaps are not double-counted
(each pair face is counted in the cell that contains it; a pair spanning
cells contributes per-cell pieces, like the reference's per-cell results).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from resolve_overlap_and_gap_spark import grid
from resolve_overlap_and_gap_spark.config import EngineConfig
from resolve_overlap_and_gap_spark.geom import wkb
from resolve_overlap_and_gap_spark.geom.arrangement import Face, overlay
from resolve_overlap_and_gap_spark.geom.core import clip_ring_to_box, ring_area2

UNIVERSE = -1  # poly id of the cell box in the overlay


def default_cell_buckets(df) -> int:
    """Cell-bucket count for the applyInPandas kernel stages: ~8 hash
    groups per core — multiple cells per bucket so the BATCHED overlay
    kernels (overlay_cells / the bucket dissolve) amortize their fixed
    numpy phases across the batch, while 8 waves/core still give AQE
    straggler smoothing.  Scales with the cluster, never a constant.
    History: r6 measured 256 -> 4096 as a win for the PER-CELL kernels
    (more AQE units); with the batched kernels the direction reverses
    (resolve noop at sf0.1/32 cores: 4096 buckets 7.8 s -> 256 buckets
    5.4 s), so the default follows the batched kernels."""
    return max(64, 8 * df.sparkSession.sparkContext.defaultParallelism)


# ------------------------------------------------------------ bounds stage
BOUNDS_SCHEMA = T.StructType(
    [
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType()),
    ]
)


@F.pandas_udf(BOUNDS_SCHEMA)
def wkb_bounds(geoms: pd.Series) -> pd.DataFrame:
    """Arrow-batched bounds of WKB geometries.

    Single-ring little-endian polygons of equal byte length share an exact
    byte layout (coords at offset 13, stride 16), so the batch is grouped
    by blob length and each group's bounds come from ONE vectorized
    min/max over a (rows x verts) float64 view — no per-row parsing.
    Anything else (multipolygons, multi-ring, other types) falls back to
    the generic per-row parser; results are bit-identical either way."""
    n = len(geoms)
    out = np.empty((n, 4), dtype=np.float64)
    done = np.zeros(n, dtype=bool)
    lens = np.fromiter((len(b) for b in geoms), np.int64, n)
    vals = geoms.to_numpy(dtype=object)
    for L in np.unique(lens):
        rem = L - 13
        if rem < 16 * 3 or rem % 16:
            continue
        nv = rem // 16
        idx = np.nonzero(lens == L)[0]
        buf = b"".join(vals[i] for i in idx)
        a = np.frombuffer(buf, np.uint8).reshape(len(idx), L)
        hdr = (
            (a[:, 0] == 1)
            & (a[:, 1] == 3) & (a[:, 2] == 0) & (a[:, 3] == 0) & (a[:, 4] == 0)
            & (a[:, 5] == 1) & (a[:, 6] == 0) & (a[:, 7] == 0) & (a[:, 8] == 0)
            & (a[:, 9] == (nv & 0xFF)) & (a[:, 10] == ((nv >> 8) & 0xFF))
            & (a[:, 11] == ((nv >> 16) & 0xFF)) & (a[:, 12] == ((nv >> 24) & 0xFF))
        )
        ok = np.nonzero(hdr)[0]
        if not len(ok):
            continue
        c = a[ok, 13:].copy().view("<f8").reshape(len(ok), nv, 2)
        sub = idx[ok]
        out[sub, 0] = c[:, :, 0].min(axis=1)
        out[sub, 1] = c[:, :, 1].min(axis=1)
        out[sub, 2] = c[:, :, 0].max(axis=1)
        out[sub, 3] = c[:, :, 1].max(axis=1)
        done[sub] = True
    for i in np.nonzero(~done)[0]:
        allc = wkb.load_coords(bytes(vals[i]))
        out[i] = (allc[:, 0].min(), allc[:, 1].min(),
                  allc[:, 0].max(), allc[:, 1].max())
    return pd.DataFrame(out, columns=["xmin", "ymin", "xmax", "ymax"])


def with_cells(features: DataFrame, res: int, geom_col: str = "geom") -> DataFrame:
    """Feature -> covering cells (J1 key generation for real geometries)."""
    b = features.withColumn("_b", wkb_bounds(F.col(geom_col)))
    b = b.select("*", "_b.xmin", "_b.ymin", "_b.xmax", "_b.ymax").drop("_b")
    return b.withColumn(
        "cell_id",
        F.explode(
            grid.covering_cells_col(
                F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"), res
            )
        ),
    )


# ------------------------------------------------------------ per-cell kernel
def _snap_polys(fid: int, geom: bytes, g: float) -> list[tuple[int, list[np.ndarray]]]:
    out = []
    for rings in wkb.load_polygons(bytes(geom)):
        ir = []
        for r in rings:
            c = np.floor(np.asarray(r, dtype=np.float64) / g + 0.5).astype(np.int64)
            ir.append(c)
        out.append((fid, ir))
    return out


def _clip_to_cell(rings: list[np.ndarray], cxmin, cymin, cxmax, cymax) -> list[np.ndarray]:
    out = []
    for r in rings:
        # fast path: ring entirely inside the (closed) cell box — the
        # Sutherland-Hodgman clip keeps every vertex and adds none, so its
        # output is exactly the open ring; skip the float round-trip
        # (most features touch one cell at the density-derived res)
        rr = r
        if len(rr) > 1 and rr[0, 0] == rr[-1, 0] and rr[0, 1] == rr[-1, 1]:
            rr = rr[:-1]
        x = rr[:, 0]; y = rr[:, 1]
        if (x.min() >= cxmin and x.max() <= cxmax
                and y.min() >= cymin and y.max() <= cymax):
            if len(rr) >= 3 and ring_area2(rr.astype(np.float64)) != 0:
                out.append(rr)
            continue
        c = clip_ring_to_box(r.astype(np.float64), cxmin, cymin, cxmax, cymax)
        if len(c) >= 3 and ring_area2(c) != 0:
            out.append(np.floor(c + 0.5).astype(np.int64))
    return out


def _cell_prep(pdf: pd.DataFrame, g: float):
    """Snap + clip one cell's features and add the UNIVERSE cell box —
    the shared front half of the per-cell and batched overlay kernels."""
    cell = int(pdf["cell_id"].iloc[0])
    xmin, ymin, xmax, ymax = grid.cell_bounds_np(np.array([cell], dtype=np.int64))
    cxmin = int(np.floor(xmin[0] / g + 0.5)); cymin = int(np.floor(ymin[0] / g + 0.5))
    cxmax = int(np.floor(xmax[0] / g + 0.5)); cymax = int(np.floor(ymax[0] / g + 0.5))
    polys = []
    for fid, geom in zip(pdf["fid"], pdf["geom"]):
        for pid, rings in _snap_polys(int(fid), geom, g):
            clipped = _clip_to_cell(rings, cxmin, cymin, cxmax, cymax)
            if clipped:
                polys.append((pid, clipped))
    box = np.array([[cxmin, cymin], [cxmax, cymin], [cxmax, cymax], [cxmin, cymax]],
                   dtype=np.int64)
    polys.append((UNIVERSE, [box]))
    return cell, (cxmin, cymin, cxmax, cymax), polys


def _cell_faces(pdf: pd.DataFrame, cfg: EngineConfig, res: int,
                quarantine: list[int] | None = None) -> tuple[int, list[Face]] | None:
    """Shared kernel: snap + clip all features of one cell, overlay with the
    cell box as UNIVERSE. Returns (cell_id, faces).  quarantine: list to
    receive pids whose noding failed to converge (the overlay retries
    without them — reference _no_cut_line_failed semantics)."""
    g = cfg.snap_tolerance
    cell = int(pdf["cell_id"].iloc[0])
    xmin, ymin, xmax, ymax = grid.cell_bounds_np(np.array([cell], dtype=np.int64))
    # cell box in grid units (floor/ceil to int; borders grid-aligned)
    cxmin = int(np.floor(xmin[0] / g + 0.5))
    cymin = int(np.floor(ymin[0] / g + 0.5))
    cxmax = int(np.floor(xmax[0] / g + 0.5))
    cymax = int(np.floor(ymax[0] / g + 0.5))
    polys: list[tuple[int, list[np.ndarray]]] = []
    for fid, geom in zip(pdf["fid"], pdf["geom"]):
        for pid, rings in _snap_polys(int(fid), geom, g):
            clipped = _clip_to_cell(rings, cxmin, cymin, cxmax, cymax)
            if clipped:
                polys.append((pid, clipped))
    box = np.array(
        [[cxmin, cymin], [cxmax, cymin], [cxmax, cymax], [cxmin, cymax]], dtype=np.int64
    )
    polys.append((UNIVERSE, [box]))
    return cell, overlay(polys, noding_max_iter=cfg.noding_max_iter,
                         quarantine=quarantine)


DETECT_SCHEMA = T.StructType([
    T.StructField("cell_id", T.LongType()),
    T.StructField("kind", T.StringType()),           # 'overlap' | 'gap'
    T.StructField("id_a", T.LongType()),              # null for gaps
    T.StructField("id_b", T.LongType()),
    T.StructField("area", T.DoubleType()),
    T.StructField("touches_border", T.BooleanType()),  # null for overlaps
    T.StructField("geom", T.BinaryType()),
])


def detect_all(features: DataFrame, cfg: EngineConfig, res: int = 6,
               geom_col: str = "geom", id_col: str = "fid",
               n_buckets: int | None = None,
               with_geom: bool = True) -> DataFrame:
    """One-pass detection: per cell, ONE overlay yields both overlap rows
    (per feature pair, J2 semantics) and gap rows (uncovered faces,
    ST_Difference(cell, union) semantics). The reference needs three scans
    per cell for the same outputs (clip, self-join, difference).

    Cells are processed in hashed BUCKETS of n_buckets groups: one Arrow
    round-trip covers many cells (per-cell groups would pay the
    applyInPandas overhead thousands of times); AQE still splits skewed
    buckets. The kernel loops cells inside the batch."""
    g = cfg.snap_tolerance
    if n_buckets is None:
        n_buckets = default_cell_buckets(features)
    feats = features.select(
        F.col(id_col).cast("long").alias("fid"), F.col(geom_col).alias("geom")
    )
    cells = with_cells(feats, res).withColumn(
        "bucket", F.pmod(F.hash("cell_id"), F.lit(n_buckets))
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _detect_bucket(pdf, cfg, g, with_geom)

    return cells.groupBy("bucket").applyInPandas(kernel, DETECT_SCHEMA)


def _detect_bucket(pdf: pd.DataFrame, cfg: EngineConfig, g: float,
                   with_geom: bool = True) -> pd.DataFrame:
    """Batched detect kernel: ONE noding/DCEL/labeling pass over every cell
    of the bucket (overlay_cells) — exactly equal to per-cell overlays."""
    from resolve_overlap_and_gap_spark.geom.arrangement import overlay_cells

    preps = []
    subs = []
    for _, sub in pdf.groupby("cell_id", sort=True):
        cell, box, polys = _cell_prep(sub, g)
        preps.append((cell, polys))
        subs.append((cell, box, sub))
    q_of: dict = {}
    faces_of = overlay_cells(preps, noding_max_iter=cfg.noding_max_iter,
                             quarantine_of=q_of)
    parts = [
        _detect_rows(cell, box, faces_of[cell],
                     sorted(q_of.get(cell, [])), sub, g, with_geom)
        for cell, box, sub in subs
    ]
    parts = [p for p in parts if len(p)]  # pandas-3: no all-NA concat
    if not parts:
        return pd.DataFrame(
            columns=["cell_id", "kind", "id_a", "id_b", "area",
                     "touches_border", "geom"])
    return pd.concat(parts, ignore_index=True)


def _detect_one_cell(pdf: pd.DataFrame, cfg: EngineConfig, res: int, g: float,
                     with_geom: bool = True) -> pd.DataFrame:
    quarantined: list[int] = []
    cell, faces = _cell_faces(pdf, cfg, res, quarantine=quarantined)
    xmin, ymin, xmax, ymax = grid.cell_bounds_np(np.array([cell], dtype=np.int64))
    cxmin = int(np.floor(xmin[0] / g + 0.5)); cymin = int(np.floor(ymin[0] / g + 0.5))
    cxmax = int(np.floor(xmax[0] / g + 0.5)); cymax = int(np.floor(ymax[0] / g + 0.5))
    return _detect_rows(cell, (cxmin, cymin, cxmax, cymax), faces,
                        quarantined, pdf, g, with_geom)


def _detect_rows(cell: int, box: tuple, faces, quarantined, pdf: pd.DataFrame,
                 g: float, with_geom: bool = True) -> pd.DataFrame:
    cxmin, cymin, cxmax, cymax = box
    rows = []
    # non-convergent features are reported, not silently dropped (kind =
    # 'quarantined', id_a = feature id, geometry = the clipped input)
    if quarantined:
        by_fid: dict[int, list] = {}
        for fid, geom in zip(pdf["fid"], pdf["geom"]):
            if int(fid) in quarantined:
                by_fid[int(fid)] = bytes(geom)
        for fid in sorted(by_fid):
            rows.append((cell, "quarantined", fid, None, 0.0, None, by_fid[fid]))
    pairs: dict[tuple[int, int], list[Face]] = {}
    for f in faces:
        if f.cover == frozenset([UNIVERSE]):
            s = f.shell
            touches = bool(
                (s[:, 0] == cxmin).any() or (s[:, 0] == cxmax).any()
                or (s[:, 1] == cymin).any() or (s[:, 1] == cymax).any()
            )
            gg = (wkb.dump_multipolygon(
                [[f.shell.astype(np.float64) * g]
                 + [h.astype(np.float64) * g for h in f.holes]])
                  if with_geom else None)
            rows.append((cell, "gap", None, None, f.area2 / 2.0 * g * g,
                         touches, gg))
            continue
        ids = sorted(p for p in f.cover if p != UNIVERSE)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.setdefault((ids[i], ids[j]), []).append(f)
    for (a, b), fs in sorted(pairs.items()):
        area = sum(f.area2 for f in fs) / 2.0 * g * g
        if area <= 0:
            continue
        gg = (wkb.dump_multipolygon(
            [[f.shell.astype(np.float64) * g]
             + [h.astype(np.float64) * g for h in f.holes] for f in fs])
              if with_geom else None)
        rows.append((cell, "overlap", a, b, area, None, gg))
    return pd.DataFrame(
        rows,
        columns=["cell_id", "kind", "id_a", "id_b", "area", "touches_border", "geom"],
    )




def assign_balanced_cells(features: DataFrame, cfg: EngineConfig,
                          geom_col: str = "geom", id_col: str = "fid") -> DataFrame:
    """Assign features to the content-balanced (mixed-resolution) cell
    frontier: refine hot cells (by feature-center count) to children until
    each holds <= max_rows_in_each_cell — cbg_content_based_balanced_grid
    semantics (find_overlap_and_gap-pre.sql:208-236).

    The frontier PARTITIONS the whole plane: a cell is a frontier cell iff
    it is not hot and its parent chain from base resolution is all hot.
    Cold cells — including cells holding zero feature centers — stay at the
    coarsest resolution, so feature BODIES extending beyond any center are
    still covered (quadtree descend below, not a semi-join against counted
    cells, which would drop center-less area). Returns (fid, geom, ...,
    cell_id) rows; shared by balanced detect and balanced resolve.

    Hot sets are per-level DataFrame dims (log-of-skew levels): the covers
    anti-/semi-join them, so a 100 TB frontier never rides the driver as
    an isin literal — AQE broadcasts each dim while small and shuffles
    when it isn't.
    """
    from resolve_overlap_and_gap_spark.operators.celljoin import (
        content_balanced_cells,
    )

    feats = features.select(
        F.col(id_col).cast("long").alias("fid"), F.col(geom_col).alias("geom")
    )
    b = feats.withColumn("_b", wkb_bounds(F.col("geom")))
    b = b.select("*", "_b.xmin", "_b.ymin", "_b.xmax", "_b.ymax").drop("_b")
    b = b.withColumn("cx", (F.col("xmin") + F.col("xmax")) / 2).withColumn(
        "cy", (F.col("ymin") + F.col("ymax")) / 2
    )
    b.cache()
    _, hot_by_res = content_balanced_cells(
        b, cfg.grid.base_resolution, cfg.grid.max_resolution,
        cfg.grid.max_rows_in_each_cell, lon="cx", lat="cy", with_hot=True,
    )

    def cover_at(df: DataFrame, r: int) -> DataFrame:
        return df.withColumn(
            "cell_id",
            F.explode(
                grid.covering_cells_col(
                    F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"), r
                )
            ),
        )

    zmask = (1 << grid.RES_SHIFT) - 1
    parts: list[DataFrame] = []
    r = cfg.grid.base_resolution
    cover = cover_at(b, r)
    while True:
        hot = hot_by_res.get(r)
        if hot is None:
            parts.append(cover)
            break
        parts.append(cover.join(hot, "cell_id", "left_anti"))
        desc = (cover.join(hot, "cell_id", "left_semi")
                .dropDuplicates(["fid"]).drop("cell_id"))
        child_cover = cover_at(desc, r + 1)
        parent_id = F.lit(r << grid.RES_SHIFT).cast("long").bitwiseOR(
            F.shiftright(F.col("cell_id").bitwiseAND(F.lit(zmask)), 2)
        )
        cover = (
            child_cover.withColumn("_parent", parent_id)
            .join(hot.withColumnRenamed("cell_id", "_parent"),
                  "_parent", "left_semi")
            .drop("_parent")
        )
        r += 1
    assigned = parts[0]
    for p in parts[1:]:
        assigned = assigned.unionByName(p)
    return assigned


def detect_all_balanced(features: DataFrame, cfg: EngineConfig,
                        geom_col: str = "geom", id_col: str = "fid",
                        n_buckets: int | None = None,
                        assigned: DataFrame | None = None,
                        with_geom: bool = True) -> DataFrame:
    """Detection over the CONTENT-BALANCED grid (the reference's
    cbg_content_based_balanced_grid semantics,
    find_overlap_and_gap-pre.sql:121-249): hot cells refine to children
    until each holds <= max_rows_in_each_cell features, then the same
    per-cell kernel runs on the mixed-resolution frontier.

    The kernel is resolution-agnostic (cell bounds derive from the Morton
    id), so only the assignment changes: features explode to covering cells
    at every frontier resolution and semi-join the frontier (a broadcast of
    the small cell dim per resolution).

    ``assigned`` (optional): a precomputed assign_balanced_cells result to
    reuse — the reference builds its grid ONCE in resolve_overlap_gap_init
    before any cell job, so a pipeline running detect + resolve on the
    same layer should pass the same (ideally checkpointed) assignment to
    both instead of re-deriving the frontier twice."""
    g = cfg.snap_tolerance
    if n_buckets is None:
        n_buckets = default_cell_buckets(features)
    if assigned is None:
        assigned = assign_balanced_cells(features, cfg, geom_col, id_col)
    cells = assigned.withColumn("bucket", F.pmod(F.hash("cell_id"), F.lit(n_buckets)))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # the kernel is resolution-agnostic (cell bounds derive from the
        # Morton id), so mixed-resolution balanced cells batch the same way
        return _detect_bucket(pdf, cfg, g, with_geom)

    return cells.groupBy("bucket").applyInPandas(kernel, DETECT_SCHEMA)


def detect(features: DataFrame, cfg: EngineConfig, res: int = 6,
           geom_col: str = "geom", id_col: str = "fid") -> tuple[DataFrame, DataFrame]:
    """-> (overlaps, gaps) as separate DataFrames (cache detect_all() first
    if you consume both)."""
    allr = detect_all(features, cfg, res, geom_col, id_col)
    overlaps = allr.where(F.col("kind") == "overlap").select(
        "cell_id", "id_a", "id_b", "area", "geom"
    )
    gaps = allr.where(F.col("kind") == "gap").select(
        "cell_id", "area", "touches_border", "geom"
    )
    return overlaps, gaps
