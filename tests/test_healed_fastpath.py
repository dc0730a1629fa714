"""The healed pipeline's fast path (border gaps emitted by the resolve
overlay) must produce the same final layer as the classic path (second
detection pass) — same overlay, same faces, one pass saved."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from resolve_overlap_and_gap_spark.config import EngineConfig
from resolve_overlap_and_gap_spark.operators.border import (
    border_gap_merge,
    border_gaps_from_resolve,
)
from resolve_overlap_and_gap_spark.operators.resolve import resolve


def _canon(df):
    return sorted(
        (r.owner, round(r.area, 12), r.n_parts)
        for r in df.select("owner", "area", "n_parts").collect()
    )


@pytest.mark.spark
def test_healed_fastpath_equals_classic(spark):
    from resolve_overlap_and_gap_spark.plans.queries import derived_polygon_layer

    layer = derived_polygon_layer(spark, "/root/testdata/sf0.001", scale=4.0).cache()
    cfg = EngineConfig(snap_tolerance=1e-5, min_area_to_keep=1e-4)

    classic = border_gap_merge(layer, resolve(layer, cfg, res=5), cfg, res=5)

    both = resolve(layer, cfg, res=5, emit_border_gaps=True).localCheckpoint()
    pieces = both.where(F.col("owner") >= 0)
    fast = border_gap_merge(layer, pieces, cfg, res=5,
                            border_gaps=border_gaps_from_resolve(both))

    assert _canon(fast) == _canon(classic)
