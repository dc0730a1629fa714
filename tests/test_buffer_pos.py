"""ST_Buffer (dilate/erode) + ST_PointOnSurface kernels and their
Arrow-batched Spark wrappers.

Exactness claims tested:
  * erosion of an axis-aligned square is an EXACT inner square (the
    corner disks never reach the inner corner, so only the edge bands
    carve — the classic morphological identity);
  * dilation area matches w^2 + 4wd + k-gon(d) to rounding tolerance;
  * dilation strictly contains the input; erode(dilate(P)) recovers P's
    area to arc tolerance;
  * point_on_surface is strictly inside, and inside the ring (not the
    hole) for an annulus.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from resolve_overlap_and_gap_spark.geom.buffer import (
    _poly_area2,
    buffer_line,
    buffer_polygon,
    point_on_surface,
)
from resolve_overlap_and_gap_spark.geom.core import points_in_polygon

SQ = [np.array([[0, 0], [1000, 0], [1000, 1000], [0, 1000]])]


def _kgon_area(d: float, quad_segs: int = 8) -> float:
    k = 4 * quad_segs
    return k / 2.0 * d * d * math.sin(2.0 * math.pi / k)


def test_erode_square_exact():
    out = buffer_polygon(SQ, -100)
    assert len(out) == 1 and len(out[0]) == 1
    s = out[0][0]
    assert s[:, 0].min() == 100 and s[:, 0].max() == 900
    assert s[:, 1].min() == 100 and s[:, 1].max() == 900
    assert _poly_area2(out) / 2.0 == 800 * 800


def test_erode_to_nothing():
    assert buffer_polygon(SQ, -600) == []


def test_dilate_square_area_and_containment():
    d = 150
    out = buffer_polygon(SQ, d)
    area = _poly_area2(out) / 2.0
    expect = 1000.0**2 + 4 * 1000.0 * d + _kgon_area(d)
    assert area == pytest.approx(expect, rel=2e-3)
    # contains the original corners strictly
    for rings in out:
        m = points_in_polygon(np.array([[0.0, 0.0], [1000.0, 1000.0],
                                        [500.0, 500.0]]), rings)
        assert m.all()


def test_dilate_then_erode_roundtrip():
    d = 120
    grown = buffer_polygon(SQ, d)
    assert len(grown) == 1
    back = buffer_polygon(grown[0], -d)
    area = _poly_area2(back) / 2.0
    assert area == pytest.approx(1000.0**2, rel=5e-3)


def test_dilate_preserves_hole():
    annulus = [np.array([[0, 0], [1000, 0], [1000, 1000], [0, 1000]]),
               np.array([[400, 400], [400, 600], [600, 600], [600, 400]])]
    out = buffer_polygon(annulus, 50)
    assert len(out) == 1 and len(out[0]) == 2  # hole survives, shrunk
    hole = out[0][1]
    assert 440 <= hole[:, 0].min() <= 460 and 540 <= hole[:, 0].max() <= 560


def test_buffer_line_area():
    d = 80
    line = np.array([[0, 0], [2000, 0]])
    out = buffer_line(line, d)
    area = _poly_area2(out) / 2.0
    expect = 2 * d * 2000.0 + _kgon_area(d)
    assert area == pytest.approx(expect, rel=2e-3)


def test_point_on_surface_square_and_annulus():
    x, y = point_on_surface(SQ)
    assert points_in_polygon(np.array([[x, y]]), SQ).all()
    annulus = [np.array([[0, 0], [1000, 0], [1000, 1000], [0, 1000]]),
               np.array([[200, 200], [200, 800], [800, 800], [800, 200]])]
    x, y = point_on_surface(annulus)
    assert points_in_polygon(np.array([[x, y]]), annulus).all()
    # strictly in the ring region, not the hole
    assert not (200 < x < 800 and 200 < y < 800) or not (
        points_in_polygon(np.array([[x, y]]), [annulus[1]]).any()
    )


@pytest.mark.spark
def test_spark_wrappers(spark):
    from pyspark.sql import functions as F

    from resolve_overlap_and_gap_spark.geom import wkb
    from resolve_overlap_and_gap_spark.operators.geofunc import (
        with_buffer,
        with_point_on_surface,
    )

    g = 1e-5
    rows = [(1, wkb.dump_polygon([SQ[0].astype(np.float64) * g]))]
    df = spark.createDataFrame(rows, "fid long, geom binary")
    buf = with_buffer(df, dist=100 * g, grid_size=g).collect()[0]
    polys = wkb.load_polygons(bytes(buf.geom_buf))
    assert len(polys) == 1
    a = abs(sum(np.cross(r[i], r[(i + 1) % len(r)])
                for r in [polys[0][0]] for i in range(len(r)))) / 2.0
    expect = (1000.0**2 + 4 * 1000.0 * 100 + _kgon_area(100)) * g * g
    assert a == pytest.approx(expect, rel=5e-3)

    pos = with_point_on_surface(df, grid_size=g).collect()[0]
    assert 0 < pos.x < 1000 * g and 0 < pos.y < 1000 * g


@pytest.mark.spark
def test_translate_and_extend_line(spark):
    """ST_Translate + extend_line mirror the reference formula
    (…utils/function_03_extend_line.sql): the documented example
    extend_line(line((1,2),(3,4)), 2) yields (3+sqrt2, 4+sqrt2) ->
    (1-sqrt2, 2-sqrt2); translate shifts polygons rigidly."""
    from pyspark.sql import functions as F

    from resolve_overlap_and_gap_spark.geom import wkb
    from resolve_overlap_and_gap_spark.operators.geofunc import (
        extend_line,
        st_translate,
    )

    line = wkb.dump_linestring(np.array([[1.0, 2.0], [3.0, 4.0]]))
    df = spark.createDataFrame([(1, line)], "fid long, geom binary")
    out = df.withColumn("ext", extend_line(F.col("geom"), 2.0)).collect()[0]
    _, c = wkb.load(bytes(out.ext))
    s2 = math.sqrt(2.0)
    assert c[0] == pytest.approx([3 + s2, 4 + s2], abs=1e-12)
    assert c[1] == pytest.approx([1 - s2, 2 - s2], abs=1e-12)

    sq = wkb.dump_polygon([np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])])
    dfp = spark.createDataFrame([(1, sq)], "fid long, geom binary")
    tr = dfp.withColumn("t", st_translate(F.col("geom"), 5.0, -2.0)).collect()[0]
    rings = wkb.load_polygons(bytes(tr.t))
    assert rings[0][0][:, 0].min() == pytest.approx(5.0)
    assert rings[0][0][:, 1].min() == pytest.approx(-2.0)
    # degenerate inputs pass through unchanged
    pt_line = wkb.dump_linestring(np.array([[1.0, 1.0], [1.0, 1.0]]))
    dfd = spark.createDataFrame([(1, pt_line)], "fid long, geom binary")
    out2 = dfd.withColumn("ext", extend_line(F.col("geom"), 2.0)).collect()[0]
    assert bytes(out2.ext) == pt_line
