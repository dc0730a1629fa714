"""Geodesic distance-within join (ST_DWithin(a, b, d) with spheroid=true
semantics — function_resolve_overlap_gap_run.sql:285,302 uses planar DWithin;
the geodesic variant is the `utm=false` measurement path of
…utils/function_01_get_face_area.sql:24-28 applied to a join predicate).

Spark-first: a latitude-band equi-join generates candidates (1 shuffle),
then the exact haversine predicate filters JVM-side (whole-stage codegen,
no Python). A degree of latitude is >= 110.574 km everywhere, so any pair
within `radius_km` differs by at most radius_km/110.574 degrees of latitude
=> same or adjacent band. The band join is therefore a strict superset of
the true result and the final filter is exact.

At 100TB: candidates ~ |rows within +-1 band of a probe|, never the cross
product; hot bands (the equator is not hotter here, but real data clusters)
are split by AQE skew-join.

The haversine formula text is shared verbatim with the DuckDB oracle
(haversine_sql), so query and oracle cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KM_PER_DEG_LAT_MIN = 110.574  # minimum km per degree of latitude (sphere)
EARTH_RADIUS_KM = 6371.0088   # IUGG mean earth radius


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Great-circle distance in km — identical SQL text in Spark and DuckDB
    (radians/sin/cos/asin/sqrt/least are shared spellings)."""
    return (
        f"(2.0 * {EARTH_RADIUS_KM!r} * asin(least(1.0, sqrt("
        f"pow(sin((radians({lat2}) - radians({lat1})) / 2.0), 2.0)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin((radians({lon2}) - radians({lon1})) / 2.0), 2.0)))))"
    )


def dwithin_geodesic_join(
    probes: DataFrame,   # qid, qx (lon), qy (lat)
    points: DataFrame,   # pid, px (lon), py (lat)
    radius_km: float,
    res: int | None = None,
    keep_exact: bool = False,
) -> DataFrame:
    """All (qid, pid) pairs with haversine(q, p) <= radius_km, plus the
    distance floored to decameters (dist_x100 = floor(km * 100));
    keep_exact additionally returns the exact dist_km (for rank-exact
    consumers like knn_geodesic_ring — flooring would corrupt tie order).

    Candidates via a 2-D cell equi-join: each probe explodes to the grid
    cells covering the exact spherical bounding box of its radius circle —
    lat extent r/110.574 deg (conservative: true km/deg >= 110.574), lon
    extent the textbook circle bound dlon = asin(sin(r/R)/cos(lat_q))
    (the circle's true maximum longitude excursion on the sphere), full lon
    range when the circle reaches a pole. Boxes crossing the antimeridian
    split in two (shift 360), then (qid, cell) dedups. Points key to their
    single cell, so the equi-join is a strict candidate superset and the
    haversine filter is exact. Prunes BOTH dimensions (the previous
    latitude-band variant scanned every longitude in a 3-band strip)."""
    import math

    from resolve_overlap_and_gap_spark import grid

    dlat = radius_km / KM_PER_DEG_LAT_MIN
    if res is None:
        # cell lat-height ~ 2*dlat: a probe box spans ~2x2 cells
        res = max(2, min(int(math.log2(max(180.0 / (2.0 * dlat), 1.0))), 11))
    p = points.withColumn("cell_id", grid.cell_id_col(F.col("px"), F.col("py"), res))
    # dlon via sin(r/R): asin argument sin(r/R)/cos(lat); >=1 -> pole in circle
    arg = f"(sin({radius_km!r} / {EARTH_RADIUS_KM!r}) / cos(radians(qy)))"
    q = probes.withColumn(
        "_dlon",
        F.expr(
            f"case when abs(qy) + {dlat!r} >= 90.0 then 180.0 "
            f"when {arg} >= 1.0 then 180.0 "
            f"else degrees(asin({arg})) + 1e-9 end"
        ),
    )
    # split at the antimeridian: shift the out-of-range part by 360
    shifts = F.array(F.lit(0.0), F.lit(-360.0), F.lit(360.0))
    q = q.withColumn("_shift", F.explode(shifts))
    q = q.where(
        (F.col("qx") - F.col("_dlon") + F.col("_shift") < 180.0)
        & (F.col("qx") + F.col("_dlon") + F.col("_shift") > -180.0)
    )
    q = q.withColumn(
        "cell_id",
        F.explode(
            grid.covering_cells_col(
                F.greatest(F.col("qx") - F.col("_dlon") + F.col("_shift"), F.lit(-180.0)),
                F.col("qy") - F.lit(dlat),
                F.least(F.col("qx") + F.col("_dlon") + F.col("_shift"), F.lit(179.9999999)),
                F.col("qy") + F.lit(dlat),
                res,
            )
        ),
    ).dropDuplicates(["qid", "cell_id"])
    d = haversine_sql("qy", "qx", "py", "px")
    out = (
        q.select("qid", "qx", "qy", "cell_id").join(p, "cell_id")
        .withColumn("dist_km", F.expr(d))
        .where(F.col("dist_km") <= radius_km)
    )
    cols = ["qid", "pid", "cast(floor(dist_km * 100.0) as bigint) as dist_x100"]
    if keep_exact:
        cols.append("dist_km")
    return out.selectExpr(*cols)


def knn_geodesic(points: DataFrame, probes: DataFrame, k: int) -> DataFrame:
    """Exact geodesic kNN: haversine distance, ties by neighbor id.
    Broadcast the (small) probe set; the per-probe top-k window runs after a
    partial JVM-side filter. For the banded scale path see
    dwithin_geodesic_join (radius queries) and knn.knn_cell_ring (planar)."""
    from pyspark.sql import Window

    d = haversine_sql("qy", "qx", "py", "px")
    # spread the points side first: a small parquet arrives as ONE input
    # split, and crossJoin preserves partitioning — without this the whole
    # |points| x |probes| product (and its trig) runs in a single task
    sc = points.sparkSession.sparkContext
    points = points.repartition(sc.defaultParallelism * 2)
    scored = points.crossJoin(F.broadcast(probes)).where(
        F.col("pid") != F.col("qid")
    ).withColumn("dist_km", F.expr(d))
    w = Window.partitionBy("qid").orderBy(F.col("dist_km").asc(), F.col("pid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "pid", "rank")
    )


def knn_geodesic_ring(points: DataFrame, probes: DataFrame, k: int,
                      r0_km: float | None = None, max_km: float = 25000.0) -> DataFrame:
    """Exact geodesic kNN — the scale path: expanding-radius search built on
    dwithin_geodesic_join (2D cell equi-join candidates, exact haversine
    refine). A probe finishes at radius r once it has >= k neighbors within
    r: the r-circle search is exhaustive (strict candidate superset +
    exact filter), so nothing outside r can beat the kth distance <= r.
    Unfinished probes double the radius (half the planet is the cap).

    Same results as knn_geodesic (brute force) — ties by neighbor id.
    Per-iteration results persist: the driver probes finished-counts and the
    final union re-reads them."""
    from pyspark.sql import Window

    if r0_km is None:
        # expect ~k neighbors within r0: earth area / n_points * k, with
        # slack so most probes finish in one round
        n = points.count()
        area_per = 510_000_000.0 / max(n, 1)
        import math

        r0_km = max(1.0, 2.0 * math.sqrt(k * area_per / math.pi))
    remaining = probes
    r = r0_km
    prev_r = 0.0
    prev_top: DataFrame | None = None  # (qid, pid, dist_km) of unfinished probes
    parts: list[DataFrame] = []
    to_unpersist: list[DataFrame] = []
    w = Window.partitionBy("qid").orderBy(F.col("dist_km").asc(), F.col("pid").asc())
    while True:
        found = dwithin_geodesic_join(remaining, points, r, keep_exact=True).where(
            F.col("pid") != F.col("qid")
        )
        # annulus carry: the previous round ranked EVERY point within
        # prev_r, so anything inside prev_r not in the carried top-k can
        # never enter the final top-k — re-rank only the new shell plus
        # the carried candidates
        if prev_top is not None:
            found = found.where(F.col("dist_km") > prev_r).select(
                "qid", "pid", "dist_km"
            ).unionByName(prev_top)
        else:
            found = found.select("qid", "pid", "dist_km")
        top = (
            found.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .persist()
        )
        to_unpersist.append(top)
        counts = top.groupBy("qid").agg(F.count("*").alias("n_found"))
        last_round = r >= max_km
        fin = counts.where(F.lit(True) if last_round else (F.col("n_found") >= k)).select("qid").persist()
        to_unpersist.append(fin)
        parts.append(top.join(F.broadcast(fin), "qid"))
        remaining = remaining.join(F.broadcast(fin), "qid", "left_anti")
        if last_round or remaining.isEmpty():
            break
        prev_top = top.join(F.broadcast(fin), "qid", "left_anti").select(
            "qid", "pid", "dist_km"
        )
        prev_r = r
        r *= 2.0
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.select("qid", "pid", "rank").localCheckpoint()
    for df in to_unpersist:
        df.unpersist()
    return out
