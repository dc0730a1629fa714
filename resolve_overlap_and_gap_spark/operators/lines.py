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


def polygonize_lines(lines: DataFrame, grid_size: float, res: int | None = 8,
                     geom_col: str = "geom", id_col: str = "lid",
                     n_buckets: int = 64) -> DataFrame:
    """Polygonize a LineString network into the faces it encloses.

    res=<int> (default): DISTRIBUTED — cell-partition the arrangement at
    quadtree resolution `res` (see polygonize_lines_grid; per-cell overlay,
    one shuffle, cross-cell face reassembly via distributed connected
    components). This is the 100 TB path: no single-partition stage.

    res=None: legacy single-partition arrangement (tiny layers / debugging;
    mirrors the reference's single-threaded ar5 line phase,
    function_resolve_overlap_gap_run.sql:202-276).

    Both paths order face_id by (area, wkb) for determinism.  Hole
    semantics differ on line ISLANDS (a closed ring floating inside
    another face): the distributed path is hole-correct (overlay faces
    carry holes; the surrounding face's area excludes the island), while
    the legacy path emits positive walks only, counting island interiors
    in both the island face and its surrounding face.  For island-free
    networks (every tested fixture) the outputs are identical."""
    if res is not None:
        return polygonize_lines_grid(lines, grid_size, res, geom_col, id_col,
                                     n_buckets)
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


# ------------------------------------------------- distributed polygonize
#
# Cell-partitioned polygonize (the reference's job-type 2/4/5 pattern
# applied to the line phase): each cell arranges (its lines ∪ the cell
# box) into candidate face PIECES; pieces of the same global face meet
# across cell borders along border stretches NOT covered by an input line
# ("free intervals").  Connected components over the piece↔free-interval
# graph reassemble global faces; any component touching the outer rim of
# the gridded region is the unbounded face and is dropped; the rest
# dissolve per component.  Exactness: cell borders are snap-grid-aligned
# and line↔border crossings are rounded with exact integer arithmetic, so
# the two cells sharing a border derive bit-identical crossing points and
# the per-cell pieces tile the global arrangement's faces exactly.

PIECES_SCHEMA = T.StructType([
    T.StructField("cell_id", T.LongType()),
    T.StructField("piece", T.LongType()),      # stable global piece id
    T.StructField("area2", T.LongType()),      # 2*area in grid units^2
    T.StructField("rim", T.BooleanType()),     # touches gridded-region rim
    T.StructField("lids", T.ArrayType(T.LongType())),
    T.StructField("geom", T.BinaryType()),
    # free border intervals: [axis(0=x-border,1=y-border), coord, lo, hi]
    T.StructField("ivals", T.ArrayType(T.ArrayType(T.LongType()))),
])


def _clip_seg_box(x0: int, y0: int, x1: int, y1: int,
                  bx0: int, by0: int, bx1: int, by1: int):
    """Exact integer Liang–Barsky: clip segment to box, rounding crossing
    points half-up with pure-integer arithmetic.  The SAME fraction is
    evaluated in both cells sharing a border, so rounded crossings agree
    bit-for-bit across cells (the cross-cell exactness invariant)."""
    dx, dy = x1 - x0, y1 - y0
    n0, d0 = 0, 1   # t0 = n0/d0
    n1, d1 = 1, 1   # t1 = n1/d1
    for p, q in ((-dx, x0 - bx0), (dx, bx1 - x0), (-dy, y0 - by0), (dy, by1 - y0)):
        if p == 0:
            if q < 0:
                return None
            continue
        # r = q/p with positive denominator
        rn, rd = (q, p) if p > 0 else (-q, -p)
        if p < 0:
            if rn * d0 > n0 * rd:       # r > t0
                n0, d0 = rn, rd
        else:
            if rn * d1 < n1 * rd:       # r < t1
                n1, d1 = rn, rd
    if n0 * d1 > n1 * d0:               # t0 > t1: outside
        return None

    def pt(n: int, d: int) -> tuple[int, int]:
        # round(v + 1/2) down == half-up rounding, exact for any sign
        px = (2 * (x0 * d + dx * n) + d) // (2 * d)
        py = (2 * (y0 * d + dy * n) + d) // (2 * d)
        return px, py

    a = (x0, y0) if (n0, d0) == (0, 1) else pt(n0, d0)
    b = (x1, y1) if (n1, d1) == (1, 1) else pt(n1, d1)
    if a == b:
        return None
    return a, b


def _pid64(cell: int, k: int) -> int:
    import hashlib

    h = hashlib.md5(f"{cell}:{k}".encode()).digest()
    return int.from_bytes(h[:8], "big") & 0x7FFFFFFFFFFFFFFF


def _piece_rows_for_cell(cell: int, sub: pd.DataFrame, g: float,
                         region: tuple[int, int, int, int]) -> list[tuple]:
    """Overlay one cell's clipped lines against the cell box; emit piece
    rows with free border intervals and rim flags."""
    from resolve_overlap_and_gap_spark import grid as G
    from resolve_overlap_and_gap_spark.geom.arrangement import overlay
    from resolve_overlap_and_gap_spark.operators.overlap_gap import UNIVERSE

    xmin, ymin, xmax, ymax = G.cell_bounds_np(np.array([cell], dtype=np.int64))
    cx0 = int(np.floor(xmin[0] / g + 0.5)); cy0 = int(np.floor(ymin[0] / g + 0.5))
    cx1 = int(np.floor(xmax[0] / g + 0.5)); cy1 = int(np.floor(ymax[0] / g + 0.5))
    cut: list[tuple[int, np.ndarray]] = []
    cover: dict[tuple[int, int], list[tuple[int, int]]] = {}
    order = np.argsort(sub["lid"].to_numpy(), kind="stable")
    for i in order:
        lid = int(sub["lid"].iloc[i])
        kind, coords = wkb.load(bytes(sub["geom"].iloc[i]))
        if kind != "linestring":
            continue
        c = np.floor(np.asarray(coords, np.float64) / g + 0.5).astype(np.int64)
        for j in range(len(c) - 1):
            s = _clip_seg_box(int(c[j, 0]), int(c[j, 1]),
                              int(c[j + 1, 0]), int(c[j + 1, 1]),
                              cx0, cy0, cx1, cy1)
            if s is None:
                continue
            (ax, ay), (bx, by) = s
            cut.append((lid, np.array([[ax, ay], [bx, by]], dtype=np.int64)))
            # on-border segments become covered (wall) intervals
            if ax == bx and ax in (cx0, cx1):
                cover.setdefault((0, ax), []).append((min(ay, by), max(ay, by)))
            elif ay == by and ay in (cy0, cy1):
                cover.setdefault((1, ay), []).append((min(ax, bx), max(ax, bx)))
    box = np.array([[cx0, cy0], [cx1, cy0], [cx1, cy1], [cx0, cy1]], np.int64)
    faces = overlay([(UNIVERSE, [box])], cut_lines=cut)
    rx0, ry0, rx1, ry1 = region

    def covered(key: tuple[int, int], lo: int, hi: int) -> bool:
        # overlay nodes walks at cover endpoints: each boundary pair is
        # fully covered or disjoint — test the (doubled) midpoint
        m2 = lo + hi
        for a, b in cover.get(key, ()):
            if 2 * a <= m2 <= 2 * b:
                return True
        return False

    rows = []
    for k, f in enumerate(faces):
        ivals: list[list[int]] = []
        rim = False
        for ring in [f.shell] + list(f.holes):
            n = len(ring)
            for j in range(n):
                ux, uy = int(ring[j, 0]), int(ring[j, 1])
                vx, vy = int(ring[(j + 1) % n, 0]), int(ring[(j + 1) % n, 1])
                if ux == vx and ux in (cx0, cx1):
                    key, lo, hi = (0, ux), min(uy, vy), max(uy, vy)
                elif uy == vy and uy in (cy0, cy1):
                    key, lo, hi = (1, uy), min(ux, vx), max(ux, vx)
                else:
                    continue
                if lo == hi:
                    continue
                if (key[0] == 0 and key[1] in (rx0, rx1)) or \
                   (key[0] == 1 and key[1] in (ry0, ry1)):
                    rim = True
                    continue  # region rim is never a portal
                if not covered(key, lo, hi):
                    ivals.append([key[0], key[1], lo, hi])
        mp = [[f.shell.astype(np.float64) * g]
              + [h.astype(np.float64) * g for h in f.holes]]
        rows.append((cell, _pid64(cell, k), int(f.area2), rim,
                     sorted(f.lines), wkb.dump_multipolygon(mp), ivals))
    return rows


def polygonize_lines_grid(lines: DataFrame, grid_size: float, res: int = 8,
                          geom_col: str = "geom", id_col: str = "lid",
                          n_buckets: int = 64) -> DataFrame:
    """Distributed polygonize — see module comment above.  Plan shape:
    one covering-cell shuffle + per-cell Arrow kernels for pieces, one
    equi-join on (border line, chunk) for portal edges, O(log diameter)
    min-label rounds with pointer jumping for components, one dissolve
    shuffle for final faces.  The only driver-side data are the layer's
    4 bbox doubles and per-round convergence counts."""
    from resolve_overlap_and_gap_spark import grid as G
    from resolve_overlap_and_gap_spark.operators.overlap_gap import wkb_bounds, with_cells

    g = grid_size
    spark = lines.sparkSession
    slim = lines.select(F.col(id_col).cast("long").alias("fid"),
                        F.col(geom_col).alias("geom"))

    # ---- region: covering cells of the layer bbox + one-cell margin (so
    # a line lying exactly on a cell boundary can never sit on the rim)
    bb = slim.withColumn("_b", wkb_bounds(F.col("geom"))).agg(
        F.min("_b.xmin").alias("x0"), F.min("_b.ymin").alias("y0"),
        F.max("_b.xmax").alias("x1"), F.max("_b.ymax").alias("y1"),
    ).collect()[0]
    if bb["x0"] is None:
        return spark.createDataFrame([], POLYGONIZE_SCHEMA)
    n = 1 << res
    ix0, iy0 = G.xy_np(np.array([bb["x0"]]), np.array([bb["y0"]]), res)
    ix1, iy1 = G.xy_np(np.array([bb["x1"]]), np.array([bb["y1"]]), res)
    ix0 = max(int(ix0[0]) - 1, 0); iy0 = max(int(iy0[0]) - 1, 0)
    ix1 = min(int(ix1[0]) + 1, n - 1); iy1 = min(int(iy1[0]) + 1, n - 1)
    region_cells = (
        spark.range(ix0, ix1 + 1).withColumnRenamed("id", "ix")
        .crossJoin(spark.range(iy0, iy1 + 1).withColumnRenamed("id", "iy"))
        .select(G.cell_from_xy_col(F.col("ix"), F.col("iy"), res).alias("cell_id"))
        .repartition(max(n_buckets // 4, 1))
    )
    # region rim in grid units (for the unbounded-face test)
    c00 = G.cell_from_xy_np(np.array([ix0]), np.array([iy0]), res)
    c11 = G.cell_from_xy_np(np.array([ix1]), np.array([iy1]), res)
    bx0, by0, _, _ = G.cell_bounds_np(c00)
    _, _, bx1, by1 = G.cell_bounds_np(c11)
    region = (int(np.floor(bx0[0] / g + 0.5)), int(np.floor(by0[0] / g + 0.5)),
              int(np.floor(bx1[0] / g + 0.5)), int(np.floor(by1[0] / g + 0.5)))

    # ---- pieces: overlay cells holding lines; whole-box pieces elsewhere
    lcells = with_cells(slim, res).select("cell_id", F.col("fid").alias("lid"), "geom")

    def line_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        rows: list[tuple] = []
        for cid, sub in pdf.groupby("cell_id", sort=True):
            rows.extend(_piece_rows_for_cell(int(cid), sub, g, region))
        return pd.DataFrame(rows, columns=[f.name for f in PIECES_SCHEMA])

    line_pieces = (
        lcells.withColumn("bucket", F.pmod(F.hash("cell_id"), F.lit(n_buckets)))
        .groupBy("bucket").applyInPandas(line_kernel, PIECES_SCHEMA)
    )

    def empty_kernel(it):
        for pdf in it:
            rows = []
            for cid in pdf["cell_id"]:
                cell = int(cid)
                xmin, ymin, xmax, ymax = G.cell_bounds_np(np.array([cell], dtype=np.int64))
                cx0 = int(np.floor(xmin[0] / g + 0.5)); cy0 = int(np.floor(ymin[0] / g + 0.5))
                cx1 = int(np.floor(xmax[0] / g + 0.5)); cy1 = int(np.floor(ymax[0] / g + 0.5))
                rx0, ry0, rx1, ry1 = region
                ivals, rim = [], False
                for key, lo, hi in (((0, cx0), cy0, cy1), ((0, cx1), cy0, cy1),
                                    ((1, cy0), cx0, cx1), ((1, cy1), cx0, cx1)):
                    if (key[0] == 0 and key[1] in (rx0, rx1)) or \
                       (key[0] == 1 and key[1] in (ry0, ry1)):
                        rim = True
                        continue
                    ivals.append([key[0], key[1], lo, hi])
                box = np.array([[cx0, cy0], [cx1, cy0], [cx1, cy1], [cx0, cy1]],
                               np.float64) * g
                rows.append((cell, _pid64(cell, 0),
                             2 * (cx1 - cx0) * (cy1 - cy0), rim, [],
                             wkb.dump_polygon([box]), ivals))
            yield pd.DataFrame(rows, columns=[f.name for f in PIECES_SCHEMA])

    empty_cells = region_cells.join(
        lcells.select("cell_id").distinct(), "cell_id", "left_anti"
    )
    pieces = line_pieces.unionByName(
        empty_cells.mapInPandas(empty_kernel, PIECES_SCHEMA)
    ).localCheckpoint()

    # ---- connected components by HIERARCHICAL UNION-FIND (the
    # reassemble_border_gaps pattern applied to the portal graph): group
    # nodes by ancestor cell, union-find per group over free-interval
    # overlaps (an in-kernel sweep — two intervals on the same border line
    # with positive-length overlap are the same face), escalate only the
    # representatives that still hold intervals on the GROUP boundary.
    # ceil(res/level_jump) shuffles total, data-independent — a min-label
    # propagation loop would instead need O(component diameter) rounds.
    level_jump = 4
    targets: list[int] = []
    t = res
    while t > 0:
        t = max(t - level_jump, 0)
        targets.append(t)

    def cc_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        rows: list[tuple] = []
        for gcell, sub in pdf.groupby("gcell", sort=True):
            xmin, ymin, xmax, ymax = G.cell_bounds_np(np.array([int(gcell)], dtype=np.int64))
            gx0 = int(np.floor(xmin[0] / g + 0.5)); gy0 = int(np.floor(ymin[0] / g + 0.5))
            gx1 = int(np.floor(xmax[0] / g + 0.5)); gy1 = int(np.floor(ymax[0] / g + 0.5))
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            def union(x: int, y: int) -> None:
                rx, ry = find(x), find(y)
                if rx != ry:
                    if ry < rx:
                        rx, ry = ry, rx
                    parent[ry] = rx

            by_line: dict[tuple[int, int], list[tuple[int, int, int]]] = {}
            ext: dict[int, list[list[int]]] = {}
            for node, ivals in zip(sub["node"], sub["ivals"]):
                nd = int(node)
                parent.setdefault(nd, nd)
                for v in ivals if ivals is not None else ():
                    axis, coord, lo, hi = int(v[0]), int(v[1]), int(v[2]), int(v[3])
                    on_boundary = (axis == 0 and coord in (gx0, gx1)) or \
                                  (axis == 1 and coord in (gy0, gy1))
                    if on_boundary:
                        ext.setdefault(nd, []).append([axis, coord, lo, hi])
                    else:
                        by_line.setdefault((axis, coord), []).append((lo, hi, nd))
            for ivs in by_line.values():
                ivs.sort()
                cur_root: int | None = None
                cur_max = 0
                for lo, hi, nd in ivs:
                    if cur_root is not None and lo < cur_max:
                        # strict <: corner touches don't merge
                        union(cur_root, nd)
                        cur_root = find(nd)
                        cur_max = max(cur_max, hi)
                    else:
                        cur_root, cur_max = nd, hi
            comp_ext: dict[int, list[list[int]]] = {}
            for nd in parent:
                r = find(nd)
                rows.append(("m", nd, int(r), None))
                if nd in ext:
                    comp_ext.setdefault(r, []).extend(ext[nd])
            for r, ivs in comp_ext.items():
                rows.append(("r", int(r), int(gcell), ivs))
        return pd.DataFrame(rows, columns=["kind", "a", "b", "ivals"])

    CC_SCHEMA = T.StructType([
        T.StructField("kind", T.StringType()),
        T.StructField("a", T.LongType()),
        T.StructField("b", T.LongType()),
        T.StructField("ivals", T.ArrayType(T.ArrayType(T.LongType()))),
    ])
    _ZMASK = (1 << G.RES_SHIFT) - 1
    cur = pieces.select(F.col("piece").alias("node"), "cell_id", "ivals")
    cur_res = res
    level_maps: list[DataFrame] = []
    for target in targets:
        if cur_res == target:
            gcell = F.col("cell_id")
        else:
            gcell = F.lit(target << G.RES_SHIFT).cast("long").bitwiseOR(
                F.shiftright(F.col("cell_id").bitwiseAND(F.lit(_ZMASK)),
                             2 * (cur_res - target))
            )
        out_cc = (
            cur.withColumn("gcell", gcell)
            .withColumn("bucket", F.pmod(F.hash("gcell"), F.lit(n_buckets)))
            .groupBy("bucket").applyInPandas(
                lambda pdf: cc_kernel(pdf), CC_SCHEMA)
        ).localCheckpoint()
        level_maps.append(out_cc.where(F.col("kind") == "m")
                          .select(F.col("a").alias("member"), F.col("b").alias("rep")))
        cur = out_cc.where(F.col("kind") == "r").select(
            F.col("a").alias("node"), F.col("b").alias("cell_id"), "ivals"
        )
        cur_res = target

    # compose the per-level maps: piece -> final component label
    labels = level_maps[0].select(F.col("member").alias("piece"),
                                  F.col("rep").alias("label"))
    for m in level_maps[1:]:
        m2 = m.select(F.col("member").alias("label"), F.col("rep").alias("nl"))
        labels = labels.join(m2, "label", "left").select(
            "piece", F.coalesce("nl", "label").alias("label")
        )

    # ---- drop the unbounded component(s); dissolve the rest per label
    lp = pieces.join(labels, "piece")
    comp_rim = lp.groupBy("label").agg(F.max("rim").alias("has_rim"))
    kept = lp.join(comp_rim.where(~F.col("has_rim")).select("label"), "label")

    from resolve_overlap_and_gap_spark.operators.dissolve import dissolve

    faces = dissolve(kept.select("label", "geom"), "label", g).select(
        F.col("key").alias("label"), "area", "geom"
    )
    lids = kept.select("label", F.explode_outer("lids").alias("lid")).groupBy("label").agg(
        F.sort_array(F.array_compact(F.collect_set("lid"))).alias("border_line_ids")
    )
    out = faces.join(lids, "label")
    # deterministic ids: global (area, wkb) order — a single narrow window
    # over FINAL faces only (output-sized, not input-sized)
    from pyspark.sql import Window

    w = Window.orderBy("area", "geom")
    return out.select(
        (F.row_number().over(w) - 1).alias("face_id"), "area", "geom",
        "border_line_ids",
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
        # quarantine non-convergent features instead of failing the job —
        # the reference's line-scenario failure table (_no_cut_line_failed,
        # function_resolve_overlap_gap_init.sql:221-232) maps to
        # ResolveResult.quarantined via the QUARANTINE_OWNER rows below
        quarantined: list[int] = []
        faces = overlay(polys, cut_lines=cut,
                        noding_max_iter=cfg.noding_max_iter,
                        quarantine=quarantined)
        rows = []
        if quarantined:
            from resolve_overlap_and_gap_spark.operators.resolve import (
                QUARANTINE_OWNER,
            )

            by_fid: dict[int, list] = {}
            for pid2, rings in polys:
                if pid2 in quarantined:
                    by_fid.setdefault(pid2, []).append(
                        [r.astype(np.float64) * g for r in rings])
            for fid in sorted(by_fid):
                rows.append((cell, QUARANTINE_OWNER, [fid], [], 0.0,
                             wkb.dump_multipolygon(by_fid[fid])))
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
        parts = [p for p in parts if len(p)]  # pandas-3: no all-NA concat
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
