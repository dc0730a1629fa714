"""Robustness: MultiPolygon and polygon-with-hole WKB inputs through the
full detection and resolve pipelines (the reference's Larvik two-ring case,
FIXTURES.md F1)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from resolve_overlap_and_gap_spark.config import EngineConfig
from resolve_overlap_and_gap_spark.geom import wkb
from resolve_overlap_and_gap_spark.operators.overlap_gap import detect_all
from resolve_overlap_and_gap_spark.operators.resolve import resolve

CFG = EngineConfig(snap_tolerance=1e-5)


def _sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float)


@pytest.mark.spark
def test_multipolygon_and_hole_inputs(spark):
    rows = [
        # multipolygon feature: two islands
        (1, wkb.dump_multipolygon([[_sq(3.0, 2.0, 3.4, 2.4)], [_sq(4.0, 2.0, 4.4, 2.4)]])),
        # donut feature
        (2, wkb.dump_polygon([_sq(3.1, 2.1, 3.9, 2.9), _sq(3.45, 2.45, 3.55, 2.55)])),
        # plain overlapping square
        (3, wkb.dump_polygon([_sq(4.2, 2.1, 4.8, 2.8)])),
    ]
    df = spark.createDataFrame(rows, "fid long, geom binary")
    det = detect_all(df, CFG, res=6).cache()
    pairs = {(r.id_a, r.id_b) for r in det.where("kind = 'overlap'").collect()}
    # island A overlaps donut ring; island B overlaps square 3
    assert (1, 2) in pairs and (1, 3) in pairs
    # the donut's hole shows as a gap face NOT touching the cell border
    hole_gaps = det.where("kind = 'gap' and not touches_border").collect()
    hole_area = 0.1 * 0.1
    assert any(abs(r.area - hole_area) < 1e-6 for r in hole_gaps), [r.area for r in hole_gaps]

    resolved = resolve(df, CFG, res=6)
    total = resolved.agg(F.sum("area")).collect()[0][0]
    # union area: computed pieces must cover all three features minus overlaps
    a1 = 2 * 0.4 * 0.4
    a2 = 0.8 * 0.8 - 0.1 * 0.1
    a3 = 0.6 * 0.7
    ovl_12 = 0.3 * 0.3  # island A ∩ donut ring (hole is elsewhere)
    ovl_13 = 0.2 * 0.3
    union = a1 + a2 + a3 - ovl_12 - ovl_13
    assert total == pytest.approx(union, rel=1e-6)