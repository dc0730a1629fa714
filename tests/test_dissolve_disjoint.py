"""r6 optimization pin: the bucket-batched disjoint dissolve (one
arrangement pass per bucket, multi_union_faces) must equal the per-key
union path row for row in (key, area, n_parts) on plane-partitioning
input — the heal's final owner dissolve."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.mark.spark
def test_disjoint_dissolve_equals_exact_on_heal(spark):
    from resolve_overlap_and_gap_spark.config import EngineConfig
    from resolve_overlap_and_gap_spark.operators.border import (
        border_gap_merge,
        border_gaps_from_resolve,
    )
    from resolve_overlap_and_gap_spark.operators.resolve import resolve
    from resolve_overlap_and_gap_spark.plans.queries import (
        DETECT_CFG_SNAP,
        _density_res,
        derived_polygon_layer,
    )

    layer = derived_polygon_layer(spark, SF)
    res = _density_res(spark, SF)
    cfg = EngineConfig(snap_tolerance=DETECT_CFG_SNAP, min_area_to_keep=1e-4)
    both = resolve(layer, cfg, res=res, emit_border_gaps=True).select(
        "cell_id", "owner", "geom").localCheckpoint()
    pieces = both.where(F.col("owner") >= 0)

    def run(**kw):
        h = border_gap_merge(layer, pieces, cfg, res=res,
                             border_gaps=border_gaps_from_resolve(both),
                             checkpoint=False, **kw)
        return {tuple(r) for r in h.select(
            "owner",
            F.expr("cast(floor(area * 1e9) as bigint)").alias("a"),
            "n_parts").collect()}

    exact = run()
    fast = run(dissolve_disjoint=True, dissolve_geom=False)
    assert exact == fast and len(exact) > 0


@pytest.mark.spark
def test_disjoint_dissolve_direct(spark):
    """dissolve(disjoint=True) == dissolve() on resolve pieces directly
    (values incl. areas, not just counts)."""
    from resolve_overlap_and_gap_spark.config import EngineConfig
    from resolve_overlap_and_gap_spark.operators.dissolve import dissolve
    from resolve_overlap_and_gap_spark.operators.resolve import resolve
    from resolve_overlap_and_gap_spark.plans.queries import (
        DETECT_CFG_SNAP,
        _density_res,
        derived_polygon_layer,
    )

    layer = derived_polygon_layer(spark, SF)
    cfg = EngineConfig(snap_tolerance=DETECT_CFG_SNAP, min_area_to_keep=1e-4)
    pieces = resolve(layer, cfg, res=_density_res(spark, SF)).select(
        "owner", "geom").localCheckpoint()

    def rows(df):
        return {tuple(r) for r in df.select(
            "key", F.expr("cast(floor(area * 1e10) as bigint)").alias("a"),
            "n_parts").collect()}

    exact = rows(dissolve(pieces, "owner", cfg.snap_tolerance))
    fast = rows(dissolve(pieces, "owner", cfg.snap_tolerance,
                         disjoint=True, with_geom=False))
    assert exact == fast and len(exact) > 0
