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

# ---------------------------------------------------------------- spheroid
def test_spheroid_total_area_is_wgs84():
    """Equator ring -> hemisphere; x2 must hit the published WGS84 surface
    area 510.0656e12 m^2 (the authalic q-series is exact for bands)."""
    eq = np.array([[0, 0], [90, 0], [180, 0], [-90, 0]], float)
    hemi = g.ring_area_m2(eq, spheroid=True)
    assert 2 * hemi == pytest.approx(510.0656e12, rel=1e-5)


def test_spheroid_vs_sphere_error_bound():
    """Documented divergence: mean-radius sphere areas differ from the
    spheroid by up to ~0.8% (latitude-dependent), never more than 1% and
    never zero away from the crossover band (~30-45 deg)."""
    for lat in (0, 15, 30, 45, 60, 75):
        box = np.array([[10, lat], [10.1, lat], [10.1, lat + 0.1],
                        [10, lat + 0.1]], float)
        ratio = g.ring_area_m2(box, spheroid=True) / g.ring_area_m2(box)
        assert 0.99 < ratio < 1.01
    eq_ratio = (g.ring_area_m2(np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float),
                               spheroid=True)
                / g.ring_area_m2(np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)))
    assert abs(eq_ratio - 1.0) > 2e-3  # genuinely a different figure


def test_spheroid_distance_known_lines():
    """Lambert reduced-latitude formula against published geodesics:
    meridian quadrant 10001965.73 m, equator quadrant a*pi/2, and the
    classic Vincenty test line (Flinders Peak - Buninyong, 54972.271 m)."""
    assert float(g.distance_m(0, 0, 0, 90, spheroid=True)) == pytest.approx(
        10001965.73, abs=10.0)
    assert float(g.distance_m(0, 0, 90, 0, spheroid=True)) == pytest.approx(
        10018754.17, abs=0.01)
    assert float(g.distance_m(144.424868, -37.951033,
                              143.926496, -37.652821,
                              spheroid=True)) == pytest.approx(54972.271, abs=1.0)
    assert float(g.distance_m(5.0, 52.0, 5.0, 52.0, spheroid=True)) == 0.0


def test_spheroid_length_matches_distance_sum():
    line = np.array([[0, 0], [1, 0.5], [2, 1.5]], float)
    total = (float(g.distance_m(0, 0, 1, 0.5, spheroid=True))
             + float(g.distance_m(1, 0.5, 2, 1.5, spheroid=True)))
    assert g.line_length_m(line, spheroid=True) == pytest.approx(total)
