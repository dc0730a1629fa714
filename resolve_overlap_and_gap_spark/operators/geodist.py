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
) -> DataFrame:
    """All (qid, pid) pairs with haversine(q, p) <= radius_km, plus the
    distance floored to decameters (dist_x100 = floor(km * 100))."""
    band_h = radius_km / KM_PER_DEG_LAT_MIN  # degrees; safe lower bound
    p = points.withColumn("band", F.floor(F.col("py") / band_h).cast("long"))
    q = probes.withColumn(
        "band",
        F.explode(
            F.array(*[F.floor(F.col("qy") / band_h).cast("long") + d for d in (-1, 0, 1)])
        ),
    )
    d = haversine_sql("qy", "qx", "py", "px")
    return (
        q.join(p, "band")
        .withColumn("dist_km", F.expr(d))
        .where(F.col("dist_km") <= radius_km)
        .selectExpr("qid", "pid", "cast(floor(dist_km * 100.0) as bigint) as dist_x100")
    )


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
