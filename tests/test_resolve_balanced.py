"""resolve_balanced: the resolve pipeline over the content-balanced grid.

With sliver merging off (min_area_to_keep=0) resolved pieces are exactly the
arrangement faces. Faces are grid-invariant up to the snap wobble along cell
cut-lines (clip intersections snap to the 1e-5 grid, and different grids cut
at different places), so per-owner areas must agree within
O(perimeter x snap_tolerance) — and the owner SET must match exactly (the
earlier center-only frontier bug dropped whole polygon parts in cells
holding no feature center, a >1e0 area error this test guards against).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from resolve_overlap_and_gap_spark.config import EngineConfig, GridConfig
from resolve_overlap_and_gap_spark.operators.resolve import resolve, resolve_balanced


def _layer(spark, n=400):
    from resolve_overlap_and_gap_spark import derive
    from resolve_overlap_and_gap_spark.sources.pages import with_ngon_footprint

    pts = spark.range(0, n, 1, 8).selectExpr(*derive.point_select("id", "pid", derive.SPARK))
    # cluster half the features into a hot spot so refinement triggers
    pts = pts.selectExpr(
        "pid",
        "case when pid % 2 = 0 then px / 50.0 else px end as px",
        "case when pid % 2 = 0 then py / 50.0 else py end as py",
    )
    return with_ngon_footprint(pts, scale=3.0).select(F.col("pid").alias("fid"), "geom")


def _owner_areas(df):
    rows = df.groupBy("owner").agg(F.sum("area").alias("a")).collect()
    return {r.owner: round(r.a, 12) for r in rows}


@pytest.mark.spark
def test_resolve_balanced_matches_fixed_res(spark):
    layer = _layer(spark).cache()
    cfg = EngineConfig(
        snap_tolerance=1e-5, min_area_to_keep=0.0,
        grid=GridConfig(base_resolution=4, max_resolution=9, max_rows_in_each_cell=40),
    )
    bal = resolve_balanced(layer, cfg)
    fixed = resolve(layer, cfg, res=5)
    a_bal, a_fixed = _owner_areas(bal), _owner_areas(fixed)
    assert set(a_bal) == set(a_fixed)
    tol = 5e-4  # ~perimeter (few deg) x snap (1e-5), with margin
    mism = {o: (a_bal[o], a_fixed[o]) for o in a_bal
            if abs(a_bal[o] - a_fixed[o]) > tol}
    assert not mism, list(mism.items())[:3]
    # refinement actually happened: mixed resolutions present
    from resolve_overlap_and_gap_spark import grid as G
    import numpy as np

    cells = np.array([r.cell_id for r in bal.select("cell_id").distinct().collect()],
                     dtype=np.int64)
    assert len(set(G.cell_res_np(cells).tolist())) >= 2
