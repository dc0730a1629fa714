"""k-nearest-neighbor joins (north-rule addition; SURVEY.md §2.3 notes the
reference has no kNN — required by the graft).

Two implementations with identical results:
  * ``knn_bruteforce`` — broadcast the (small) query set, score all points,
    window top-k. The oracle-checkable baseline.
  * ``knn_cell_ring`` — the scale path: candidates come from grid-cell rings
    around each query, expanding until the kth distance is provably below the
    ring guarantee (exact, not approximate). Per-iteration work is one cell
    equi-join; ring geometry is generated JVM-side (sequence + explode).

Distances are squared planar degrees (the engine's `utm=False` planar mode);
ties break by neighbor id — the determinism rule (SURVEY.md §2.6 O1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from resolve_overlap_and_gap_spark import grid


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.col("d2").asc(), F.col("pid").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def knn_bruteforce(points: DataFrame, queries: DataFrame, k: int) -> DataFrame:
    """points: (pid, px, py); queries: (qid, qx, qy). Returns
    (qid, pid, rank, d2). Excludes self-matches on id equality.

    The points side is repartitioned first: a small parquet arrives as one
    input split and crossJoin preserves partitioning, which would put the
    whole |points| x |queries| product in a single task."""
    sc = points.sparkSession.sparkContext
    points = points.repartition(sc.defaultParallelism * 2)
    j = points.crossJoin(F.broadcast(queries)).where(F.col("pid") != F.col("qid"))
    scored = j.withColumn(
        "d2",
        (F.col("px") - F.col("qx")) * (F.col("px") - F.col("qx"))
        + (F.col("py") - F.col("qy")) * (F.col("py") - F.col("qy")),
    )
    return _topk(scored, k).select("qid", "pid", "rank", "d2")


def _cells_in_rings(queries: DataFrame, res: int, ring: int,
                    min_ring: int = 0) -> DataFrame:
    """(qid, cell_id) for all cells with Chebyshev ring distance in
    (min_ring, ring] of the query's cell — generated with
    sequence()+explode, bit-math morton. min_ring > 0 yields the ANNULUS
    only, so an expanding search never re-joins already-scanned cells."""
    n = 1 << res
    ix, iy = grid.xy_col(F.col("qx"), F.col("qy"), res)
    q = queries.withColumn("_ix", ix).withColumn("_iy", iy)
    dx = F.explode(F.sequence(F.lit(-ring), F.lit(ring))).alias("dx")
    q = q.select("*", dx)
    q = q.select("*", F.explode(F.sequence(F.lit(-ring), F.lit(ring))).alias("dy"))
    if min_ring > 0:
        q = q.where(F.greatest(F.abs(F.col("dx")), F.abs(F.col("dy"))) > min_ring)
    jx = F.pmod(F.col("_ix") + F.col("dx"), F.lit(n))  # wrap lon
    jy = F.col("_iy") + F.col("dy")
    q = q.where((jy >= 0) & (jy < n))
    return q.select(
        F.col("qid"), F.col("qx"), F.col("qy"),
        grid.cell_from_xy_col(jx.cast("long"), jy.cast("long"), res).alias("cell_id"),
    ).dropDuplicates(["qid", "cell_id"])


def auto_res(n_points: int, per_cell: int = 16) -> int:
    """Density-adaptive grid resolution (the content-balanced principle of
    function_resolve_overlap_gap_init.sql:76-90 applied to kNN): pick res so
    a 3x3 ring-1 window holds ~9*per_cell points — most queries then finish
    in one ring instead of sweeping empty cells of a too-fine grid."""
    import math

    return max(2, min(int(math.log(max(n_points / per_cell, 1.0), 4)), 10))


def knn_cell_ring(points: DataFrame, queries: DataFrame, k: int, res: int | None = None,
                  max_ring: int | None = None) -> DataFrame:
    """Exact kNN by expanding cell rings. A query is finished once its kth
    candidate distance is <= (ring * min_cell_side)^2 — no closer point can
    exist outside the searched rings. Unfinished queries double the ring.

    The reference's analog is the content-grid bounded neighbor join; ring
    expansion replaces its `&&` envelope expansion (SURVEY.md J-table note).

    Each ring's top-k and finished-set are persisted: the driver loop probes
    them (stats + isEmpty) and the final union reads them again — without
    persistence every ring's candidate join would recompute ~3x.

    Unfinished queries scan only the NEW annulus each round (cells with
    Chebyshev distance in (prev_ring, ring]); candidates already seen are
    carried forward as the persisted previous top-k — sufficient, since a
    point outside a round's top-k is farther than its kth and can never
    enter the final top-k.
    """
    if res is None:
        res = auto_res(points.count())
    n = 1 << res
    cell_h = 180.0 / n  # min cell side (degrees)
    if max_ring is None:
        max_ring = n  # full sweep upper bound
    pts = points.withColumn("cell_id", grid.cell_id_col(F.col("px"), F.col("py"), res))
    pts.cache()
    remaining = queries
    ring = 1
    prev_ring = 0
    prev_top: DataFrame | None = None  # (qid, pid, d2) of unfinished queries
    done_parts: list[DataFrame] = []
    to_unpersist: list[DataFrame] = []
    while ring <= max_ring:
        cand_cells = _cells_in_rings(remaining, res, ring, min_ring=prev_ring)
        j = cand_cells.join(pts, "cell_id").where(F.col("pid") != F.col("qid"))
        scored = j.withColumn(
            "d2",
            (F.col("px") - F.col("qx")) * (F.col("px") - F.col("qx"))
            + (F.col("py") - F.col("qy")) * (F.col("py") - F.col("qy")),
        ).select("qid", "pid", "d2")
        if prev_top is not None:
            scored = scored.unionByName(prev_top)
        top = _topk(scored, k).select("qid", "pid", "rank", "d2").persist()
        to_unpersist.append(top)
        guarantee = (ring * cell_h) ** 2
        stats = top.groupBy("qid").agg(F.max("d2").alias("kth_d2"), F.count("*").alias("n_found"))
        finished_ids = stats.where((F.col("n_found") >= k) & (F.col("kth_d2") <= guarantee)).select("qid")
        if ring >= max_ring:
            finished_ids = stats.select("qid")
        finished_ids = finished_ids.persist()
        to_unpersist.append(finished_ids)
        done_parts.append(top.join(F.broadcast(finished_ids), "qid"))
        remaining = remaining.join(F.broadcast(finished_ids), "qid", "left_anti")
        if remaining.isEmpty():
            break
        prev_top = top.join(F.broadcast(finished_ids), "qid", "left_anti").select(
            "qid", "pid", "d2"
        )
        prev_ring = ring
        ring *= 2
    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionByName(p)
    out = out.localCheckpoint()  # materialize before releasing ring caches
    for df in to_unpersist:
        df.unpersist()
    pts.unpersist()
    return out
