"""The metric-diff oracle (reference compare harness): after resolve+heal,
detection must find ZERO overlap area and no small interior gaps — the
reference's own correctness proof (resolve_overlap_gap_compare_result.sql:
184-268: overlap count/area must go to 0)."""

from __future__ import annotations

import pytest

from resolve_overlap_and_gap_spark.config import EngineConfig
from resolve_overlap_and_gap_spark.operators.compare import compare_before_after
from tests.conftest import SF_SMOKE


@pytest.mark.spark
def test_clean_after_resolve(spark):
    from resolve_overlap_and_gap_spark.plans.queries import derived_polygon_layer

    layer = derived_polygon_layer(spark, SF_SMOKE, scale=4.0)
    cfg = EngineConfig(snap_tolerance=1e-5, min_area_to_keep=1e-4)
    rows = {r.phase: r for r in compare_before_after(layer, cfg, res=5).collect()}
    assert rows["before"].n_overlaps > 0          # input really has overlaps
    assert rows["after"].n_overlaps == 0          # fully resolved
    assert rows["after"].overlap_area == 0.0
    assert rows["after"].n_small_interior_gaps == 0
