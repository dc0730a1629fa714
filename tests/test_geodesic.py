from __future__ import annotations

import numpy as np
import pytest

from resolve_overlap_and_gap_spark.geom import geodesic as g


def test_equator_degree_square():
    ring = np.array([[0, -0.5], [1, -0.5], [1, 0.5], [0, 0.5]], float)
    a = g.ring_area_m2(ring)
    # 1 deg x 1 deg at the equator ~ (111.195 km)^2
    assert a == pytest.approx((111195.0) ** 2, rel=2e-3)


def test_high_latitude_shrinks():
    eq = g.ring_area_m2(np.array([[0, -0.5], [1, -0.5], [1, 0.5], [0, 0.5]], float))
    hi = g.ring_area_m2(np.array([[0, 59.5], [1, 59.5], [1, 60.5], [0, 60.5]], float))
    assert hi == pytest.approx(eq * np.cos(np.radians(60)), rel=1e-2)


def test_antimeridian_ring():
    ring = np.array([[179.5, -0.5], [-179.5, -0.5], [-179.5, 0.5], [179.5, 0.5]], float)
    a = g.ring_area_m2(ring)
    assert a == pytest.approx((111195.0) ** 2, rel=2e-3)


def test_hole_subtracts():
    shell = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
    hole = np.array([[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5]], float)
    assert g.polygon_area_m2([shell, hole]) == pytest.approx(
        g.ring_area_m2(shell) - g.ring_area_m2(hole)
    )


def test_length_meridian_vs_parallel():
    meridian = g.line_length_m(np.array([[0, 0], [0, 1]], float))
    assert meridian == pytest.approx(111195.0, rel=1e-3)
    parallel60 = g.line_length_m(np.array([[0, 60], [1, 60]], float))
    assert parallel60 == pytest.approx(111195.0 * np.cos(np.radians(60)), rel=1e-3)


def test_distance_symmetry_and_zero():
    d = g.distance_m(10.0, 59.0, 10.0, 59.0)
    assert float(d) == 0.0
    d1 = g.distance_m(10.0, 59.0, 11.0, 60.0)
    d2 = g.distance_m(11.0, 60.0, 10.0, 59.0)
    assert float(d1) == pytest.approx(float(d2))