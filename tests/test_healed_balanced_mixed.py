"""The balanced healed oracle must actually exercise a MIXED-resolution
frontier (otherwise it degenerates to the fixed-res case): assert the
resolve output spans >= 2 resolutions at the oracle's sf0.01 config, and
that the healed result still matches the closed form there."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from resolve_overlap_and_gap_spark import grid
from resolve_overlap_and_gap_spark.config import EngineConfig, GridConfig
from resolve_overlap_and_gap_spark.operators.resolve import resolve_balanced
from tests.conftest import SF_ORACLE


@pytest.mark.spark
def test_balanced_healed_frontier_is_mixed(spark):
    from resolve_overlap_and_gap_spark.plans import queries as Q

    layer = Q._healed_cluster_layer(spark, SF_ORACLE, mod=10)
    cfg = EngineConfig(
        snap_tolerance=Q.DETECT_CFG_SNAP, min_area_to_keep=2e-3,
        grid=GridConfig(base_resolution=8, max_resolution=12,
                        max_rows_in_each_cell=6),
    )
    both = resolve_balanced(layer, cfg, emit_border_gaps=True)
    res_col = F.shiftrightunsigned(F.col("cell_id"), grid.RES_SHIFT).bitwiseAND(F.lit(0x1F))
    res_seen = sorted(int(r.r) for r in
                      both.select(res_col.alias("r")).distinct().collect())
    assert len(res_seen) >= 2, res_seen
    assert res_seen[0] == 8  # cold cells stay at base

    # and the full oracle query over this config stays closed-form exact
    out = {r.owner: (r.area_x1e8, r.n_parts)
           for r in Q.q_healed_strip_balanced(spark, SF_ORACLE).collect()}
    ks = sorted(out)
    assert len(ks) % 4 == 0 and len(ks) > 0
    for owner, (a, n) in out.items():
        want = {0: 540000, 1: 288000, 2: 230000, 3: 230000}[owner % 4]
        assert (a, n) == (want, 1), (owner, a, n)
