"""ar5-scenario test: polygon layer + attribute border lines jointly
resolved — cut lines split faces without changing coverage, and each output
face reports its border line ids (FIXTURES.md F4)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from resolve_overlap_and_gap_spark.config import EngineConfig
from resolve_overlap_and_gap_spark.geom import wkb
from resolve_overlap_and_gap_spark.operators.lines import resolve_with_lines

CFG = EngineConfig(snap_tolerance=1e-5)


@pytest.mark.spark
def test_cut_line_splits_face(spark):
    # one square polygon, one vertical cut line through its middle
    sq = np.array([[3.0, 2.0], [3.8, 2.0], [3.8, 2.8], [3.0, 2.8]], float)
    polys = spark.createDataFrame(
        [(7, wkb.dump_polygon([sq]))], "fid long, geom binary"
    )
    line = np.array([[3.4, 1.9], [3.4, 2.9]], float)
    lines = spark.createDataFrame(
        [(101, wkb.dump_linestring(line))], "lid long, geom binary"
    )
    out = resolve_with_lines(polys, lines, CFG, res=5).collect()
    # the square is split into two faces by the cut line
    assert len(out) == 2
    for r in out:
        assert r.owner == 7
        assert r.border_line_ids == [101]
        assert r.area == pytest.approx(0.8 * 0.8 / 2, rel=1e-6)


@pytest.mark.spark
def test_lines_do_not_change_coverage(spark):
    sq1 = np.array([[0.5, 0.5], [1.3, 0.5], [1.3, 1.3], [0.5, 1.3]], float)
    sq2 = np.array([[1.0, 0.5], [1.8, 0.5], [1.8, 1.3], [1.0, 1.3]], float)
    polys = spark.createDataFrame(
        [(1, wkb.dump_polygon([sq1])), (2, wkb.dump_polygon([sq2]))],
        "fid long, geom binary",
    )
    line = np.array([[0.4, 0.9], [1.9, 0.9]], float)  # horizontal cut
    lines = spark.createDataFrame(
        [(55, wkb.dump_linestring(line))], "lid long, geom binary"
    )
    out = resolve_with_lines(polys, lines, CFG, res=5)
    total = out.agg(F.sum("area")).collect()[0][0]
    union = 0.8 * 0.8 * 2 - 0.3 * 0.8
    assert total == pytest.approx(union, rel=1e-6)
    # overlap face exists and is split by the line into two pieces
    ovl = [r for r in out.collect() if r.other_ids]
    assert len(ovl) == 2
    assert all(r.owner == 1 and r.other_ids == [2] for r in ovl)
    assert all(55 in r.border_line_ids for r in ovl)