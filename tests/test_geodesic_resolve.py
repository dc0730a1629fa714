"""Geodesic-measure threading (cfg.geodesic_measure): sliver thresholds are
evaluated in spherical m^2 instead of planar degree^2 — the reference's
utm=false path threads ST_Area(geo, true) through every face-area decision
(…utils/function_01_get_face_area.sql:24-28, types_resolve_overlap.sql:19).

Oracle: at high latitude a 1-degree square covers ~cos(lat) of the ground
area it would cover at the equator.  A face sized just above a planar
threshold is therefore KEPT in planar mode but MERGED in geodesic mode when
the same nominal threshold is expressed in m^2 at the equator.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from resolve_overlap_and_gap_spark.config import EngineConfig
from resolve_overlap_and_gap_spark.geom import wkb
from resolve_overlap_and_gap_spark.geom.geodesic import ring_area_m2
from resolve_overlap_and_gap_spark.operators.resolve import resolve

RES = 4  # one res-4 cell spans 22.5 x 11.25 deg; layer sits inside one cell

BIG_ID, SMALL_ID = 1, 2
LAT0, LAT1 = 79.0, 80.0          # high latitude: cos ~ 0.18


def _square(x0, y0, x1, y1) -> np.ndarray:
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)


BIG2_ID = 3


@pytest.fixture(scope="module")
def layer(spark):
    # a thin strip sandwiched between two unit squares: its longest shared
    # border is a polygon (not the open world), so the sliver merge absorbs
    # it into a neighbor instead of deleting it
    big = _square(10.0, LAT0, 11.0, LAT1)
    strip = _square(11.0, LAT0, 11.05, LAT1)
    big2 = _square(11.05, LAT0, 12.05, LAT1)
    return spark.createDataFrame(
        [(BIG_ID, wkb.dump_polygon([big])),
         (SMALL_ID, wkb.dump_polygon([strip])),
         (BIG2_ID, wkb.dump_polygon([big2]))],
        "fid long, geom binary",
    )


SMALL_PLANAR_AREA = 0.05 * 1.0
# the strip's spherical area if it sat at the EQUATOR (m^2)
SMALL_EQUATOR_M2 = ring_area_m2(_square(0.0, -0.5, 0.05, 0.5))


@pytest.mark.spark
def test_planar_mode_keeps_the_face(spark, layer):
    cfg = EngineConfig(snap_tolerance=1e-5,
                       min_area_to_keep=0.9 * SMALL_PLANAR_AREA)
    owners = {r.owner for r in resolve(layer, cfg, res=RES).collect()}
    assert SMALL_ID in owners  # 0.04 deg^2 >= 0.036 deg^2: kept


@pytest.mark.spark
def test_geodesic_mode_merges_the_face(spark, layer):
    # same nominal 0.9x threshold, expressed in m^2 at the equator: at
    # lat 79.5 the face measures only ~cos(79.5 deg) ~ 0.18 of that
    cfg = EngineConfig(snap_tolerance=1e-5,
                       min_area_to_keep=0.9 * SMALL_EQUATOR_M2,
                       geodesic_measure=True)
    out = resolve(layer, cfg, res=RES).collect()
    owners = {r.owner for r in out}
    assert SMALL_ID not in owners          # merged into the big neighbor
    total = sum(r.area for r in out)
    # area conservation (planar measure in the output column): the strip is
    # absorbed into a neighbor, not deleted
    assert total == pytest.approx(2.0 + SMALL_PLANAR_AREA, rel=1e-6)


@pytest.mark.spark
def test_geodesic_flag_ignored_when_utm(spark, layer):
    """utm=True layers are already planar meters: the geodesic flag must
    not reinterpret them."""
    cfg = EngineConfig(snap_tolerance=1e-5,
                       min_area_to_keep=0.9 * SMALL_PLANAR_AREA,
                       geodesic_measure=True, utm=True)
    owners = {r.owner for r in resolve(layer, cfg, res=RES).collect()}
    assert SMALL_ID in owners
