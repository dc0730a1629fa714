from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from resolve_overlap_and_gap_spark.config import EngineConfig
from resolve_overlap_and_gap_spark.geom import wkb
from resolve_overlap_and_gap_spark.operators.lines import polygonize_lines, validate_coverage
from resolve_overlap_and_gap_spark.operators.resolve import resolve
from resolve_overlap_and_gap_spark.sources.fixtures import tiling_df

G = 1e-5


def _ls(*pts):
    return wkb.dump_linestring(np.asarray(pts, dtype=float))


@pytest.mark.spark
def test_polygonize_grid_of_lines(spark):
    """A 2x1 grid drawn as 7 border lines -> 2 faces, each knowing its
    border line ids (J7 lineage-carried attribute recovery)."""
    rows = [
        (1, _ls((0, 0), (1, 0))),
        (2, _ls((1, 0), (2, 0))),
        (3, _ls((0, 1), (1, 1))),
        (4, _ls((1, 1), (2, 1))),
        (5, _ls((0, 0), (0, 1))),
        (6, _ls((1, 0), (1, 1))),   # shared middle border
        (7, _ls((2, 0), (2, 1))),
    ]
    df = spark.createDataFrame(rows, "lid long, geom binary")
    faces = polygonize_lines(df, G).collect()
    assert len(faces) == 2
    for f in faces:
        assert f.area == pytest.approx(1.0, rel=1e-9)
    borders = [set(f.border_line_ids) for f in faces]
    assert {1, 3, 5, 6} in borders and {2, 4, 6, 7} in borders


@pytest.mark.spark
def test_polygonize_crossing_lines(spark):
    """Two crossing 'X' diagonals plus a frame: noding splits at the cross,
    4 triangular faces appear."""
    rows = [
        (1, _ls((0, 0), (2, 0), (2, 2), (0, 2), (0, 0))),  # frame
        (2, _ls((0, 0), (2, 2))),
        (3, _ls((2, 0), (0, 2))),
    ]
    df = spark.createDataFrame(rows, "lid long, geom binary")
    faces = polygonize_lines(df, G).collect()
    assert len(faces) == 4
    assert sum(f.area for f in faces) == pytest.approx(4.0, rel=1e-9)


@pytest.mark.spark
def test_validate_coverage(spark):
    cfg = EngineConfig(snap_tolerance=1e-5, min_area_to_keep=5e-4)
    dirty = tiling_df(spark, k=5, cell=0.1, jitter=0.015, seed=9)
    v1 = validate_coverage(dirty, cfg, res=8).collect()[0]
    assert not v1.is_valid_coverage and v1.n_overlap_pairs > 0

    clean_pieces = resolve(dirty, cfg, res=8)
    relabeled = clean_pieces.select(
        F.monotonically_increasing_id().alias("fid"), "geom"
    )
    # after resolve: zero overlaps, and every remaining interior gap is
    # ABOVE min_area (large genuine gaps stay, like the reference's)
    v_all = validate_coverage(relabeled, cfg, res=8, min_gap_area=0.0).collect()[0]
    v_big = validate_coverage(relabeled, cfg, res=8,
                              min_gap_area=cfg.min_area_to_keep).collect()[0]
    assert v_all.n_overlap_pairs == 0
    assert v_all.n_interior_gaps == v_big.n_interior_gaps  # no slivers left

@pytest.mark.spark
def test_polygonize_distributed_matches_single(spark):
    """Distributed (cell-partitioned) polygonize == single-partition
    arrangement on a 4x3 lattice of unit squares spanning many res=10
    cells: same face count, same areas, same border-line attribution."""
    rows, lid = [], 0
    KX, KY = 4, 3
    for i in range(KX + 1):
        for j in range(KY):
            lid += 1
            rows.append((lid, _ls((i, j), (i, j + 1))))
    for j in range(KY + 1):
        for i in range(KX):
            lid += 1
            rows.append((lid, _ls((i, j), (i + 1, j))))
    df = spark.createDataFrame(rows, "lid long, geom binary")
    single = polygonize_lines(df, G, res=None).collect()
    dist = polygonize_lines(df, G, res=10).collect()
    assert len(single) == len(dist) == KX * KY
    for s, d in zip(sorted(r.area for r in single),
                    sorted(r.area for r in dist)):
        assert d == pytest.approx(s, rel=1e-12)
    assert (sorted(tuple(r.border_line_ids) for r in single)
            == sorted(tuple(r.border_line_ids) for r in dist))


@pytest.mark.spark
def test_polygonize_enclosed_empty_cells(spark):
    """A single ring spanning many cells whose interior contains FULLY
    EMPTY cells: the empty-cell pseudo-pieces must carry connectivity so
    the interior reassembles as one bounded face (and the outside, which
    reaches the region rim through the margin cells, is dropped)."""
    rows = [(1, _ls((0.1, 0.1), (3.1, 0.1), (3.1, 3.1), (0.1, 3.1), (0.1, 0.1)))]
    df = spark.createDataFrame(rows, "lid long, geom binary")
    faces = polygonize_lines(df, G, res=10).collect()
    assert len(faces) == 1
    assert faces[0].area == pytest.approx(9.0, rel=1e-9)
    assert list(faces[0].border_line_ids) == [1]
