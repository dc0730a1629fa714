"""Detection-engine tests: mirrors the reference's compare-harness metrics
(resolve_overlap_gap_compare_result.sql:96-268) on the jittered-tiling
fixture, plus cross-parallelism determinism."""

from __future__ import annotations

import numpy as np
import pytest

from resolve_overlap_and_gap_spark.config import EngineConfig
from resolve_overlap_and_gap_spark.operators.overlap_gap import detect_all
from resolve_overlap_and_gap_spark.sources.fixtures import tiling_df

CFG = EngineConfig(snap_tolerance=1e-5)


@pytest.fixture(scope="module")
def fixture_df(spark):
    df = tiling_df(spark, k=10, cell=0.1, jitter=0.02, seed=42)
    df.cache().count()
    return df


@pytest.mark.spark
def test_detection_finds_overlaps_and_gaps(spark, fixture_df):
    res = detect_all(fixture_df, CFG, res=8).cache()
    ovl = res.where("kind = 'overlap'")
    gaps = res.where("kind = 'gap' and not touches_border")
    n_ovl = ovl.count()
    n_gap = gaps.count()
    # jittered tiling must produce many overlaps and interior gaps
    assert n_ovl > 50
    assert n_gap > 10
    # overlap areas positive and bounded by 2*jitter band area
    rows = ovl.select("area").collect()
    assert all(0 < r.area < 0.1 * 0.04 * 4 for r in rows)


@pytest.mark.spark
def test_pairwise_overlap_area_matches_single_cell_run(spark, fixture_df):
    """Cross-cell exactness: per-pair overlap area summed over cells at a
    fine grid equals the single-coarse-cell result (cell borders are
    snap-grid aligned; clipping is exact)."""
    import pyspark.sql.functions as F

    fine = (
        detect_all(fixture_df, CFG, res=9)
        .where("kind = 'overlap'")
        .groupBy("id_a", "id_b")
        .agg(F.sum("area").alias("area"))
    )
    coarse = (
        detect_all(fixture_df, CFG, res=4)
        .where("kind = 'overlap'")
        .groupBy("id_a", "id_b")
        .agg(F.sum("area").alias("area"))
    )
    f = {(r.id_a, r.id_b): r.area for r in fine.collect()}
    c = {(r.id_a, r.id_b): r.area for r in coarse.collect()}
    assert set(f) == set(c)
    # areas agree up to the snapped-clip bound O(grid x border crossings):
    # clip points on cell borders round to the snap grid (documented
    # ST_SnapToGrid-style semantics), so finer grids differ by ~1e-6 deg^2
    for kpair in f:
        assert f[kpair] == pytest.approx(c[kpair], rel=2e-3, abs=2e-6), kpair


@pytest.mark.spark
def test_cell_partition_is_exact(spark, fixture_df):
    """Strong exactness: within a cell, overlay faces PARTITION the cell —
    sum of all face areas (covered + gaps, incl. holes) equals the cell area
    exactly in integer grid units (the ValidateTopology analog)."""
    from resolve_overlap_and_gap_spark import grid as G
    from resolve_overlap_and_gap_spark.operators.overlap_gap import (
        UNIVERSE, _cell_faces, with_cells,
    )

    feats = fixture_df.selectExpr("cast(fid as long) fid", "geom")
    cells = with_cells(feats, 8)
    pdfs = cells.toPandas()
    for cell_id, pdf in pdfs.groupby("cell_id"):
        cell, faces = _cell_faces(pdf, CFG, 8)
        g = CFG.snap_tolerance
        xmin, ymin, xmax, ymax = G.cell_bounds_np(np.array([cell]))
        cx0 = int(np.floor(xmin[0] / g + 0.5)); cy0 = int(np.floor(ymin[0] / g + 0.5))
        cx1 = int(np.floor(xmax[0] / g + 0.5)); cy1 = int(np.floor(ymax[0] / g + 0.5))
        want2 = 2 * (cx1 - cx0) * (cy1 - cy0)
        got2 = sum(f.area2 for f in faces if UNIVERSE in f.winding and f.winding[UNIVERSE] > 0)
        assert got2 == want2, cell_id


@pytest.mark.spark
def test_determinism_across_shuffle_partitions(spark, fixture_df):
    """O1 determinism: identical detection rows regardless of parallelism."""
    a = detect_all(fixture_df.repartition(1), CFG, res=8)
    b = detect_all(fixture_df.repartition(16), CFG, res=8)
    ra = sorted(map(tuple, a.drop("geom").collect()))
    rb = sorted(map(tuple, b.drop("geom").collect()))
    assert ra == rb


@pytest.mark.spark
def test_no_overlap_layer_clean(spark):
    """A perfect tiling (zero jitter) has no overlaps and no interior gaps."""
    df = tiling_df(spark, k=5, cell=0.1, jitter=0.0, seed=1)
    res = detect_all(df, CFG, res=8).cache()
    assert res.where("kind = 'overlap'").count() == 0
    interior_gaps = res.where("kind = 'gap' and not touches_border")
    assert interior_gaps.count() == 0
