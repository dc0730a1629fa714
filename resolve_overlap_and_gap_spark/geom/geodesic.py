"""Geodesic measures on the sphere (numpy) — the utm=false path of the
reference (ST_Area(geo, true) / ST_Length(geo, true) / ST_Distance spheroid;
…utils/function_01_get_face_area.sql:24-28, types_resolve_overlap.sql:19).

PostGIS measures on the WGS84 *spheroid*; with no pyproj in this container
we use the mean-radius *sphere* (difference < ~0.4% — documented
divergence; swap in a spheroid series when pyproj is available).
"""

from __future__ import annotations

import numpy as np

R_MEAN = 6371008.8  # IUGG mean Earth radius, meters


def ring_area_m2(coords_deg: np.ndarray) -> float:
    """Unsigned spherical polygon area (m^2) via the spherical shoelace
    (sum of (lam2-lam1)*(2 + sin(phi1) + sin(phi2))/2)."""
    c = np.asarray(coords_deg, dtype=np.float64)
    if len(c) > 1 and (c[0] == c[-1]).all():
        c = c[:-1]
    if len(c) < 3:
        return 0.0
    lam = np.radians(c[:, 0])
    phi = np.radians(c[:, 1])
    lam2 = np.roll(lam, -1)
    phi2 = np.roll(phi, -1)
    dlam = lam2 - lam
    # wrap to (-pi, pi] so rings crossing the antimeridian measure correctly
    dlam = (dlam + np.pi) % (2 * np.pi) - np.pi
    total = (dlam * (2.0 + np.sin(phi) + np.sin(phi2))).sum() / 2.0
    return abs(total) * R_MEAN * R_MEAN


def polygon_area_m2(rings: list[np.ndarray]) -> float:
    a = ring_area_m2(rings[0])
    for h in rings[1:]:
        a -= ring_area_m2(h)
    return a


def line_length_m(coords_deg: np.ndarray) -> float:
    """Great-circle (haversine) length in meters."""
    c = np.asarray(coords_deg, dtype=np.float64)
    if len(c) < 2:
        return 0.0
    lam = np.radians(c[:, 0]); phi = np.radians(c[:, 1])
    dphi = np.diff(phi); dlam = np.diff(lam)
    a = np.sin(dphi / 2) ** 2 + np.cos(phi[:-1]) * np.cos(phi[1:]) * np.sin(dlam / 2) ** 2
    return float((2 * R_MEAN * np.arcsin(np.sqrt(a))).sum())


def distance_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Vectorized haversine point distance (m)."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2 * R_MEAN * np.arcsin(np.sqrt(a))
