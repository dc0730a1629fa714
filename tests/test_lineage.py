"""Resume-equivalence test (mirrors the reference's restart scenario,
src/test/sql/regress/resolve_overlap_and_gap.sql:98-168): kill after a
partial run, resume, final table identical to a single-shot run."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from resolve_overlap_and_gap_spark.config import EngineConfig
from resolve_overlap_and_gap_spark.lineage import Lineage, run_stage_checkpointed
from resolve_overlap_and_gap_spark.operators.overlap_gap import with_cells
from resolve_overlap_and_gap_spark.operators.resolve import RESOLVE_SCHEMA, resolve
from resolve_overlap_and_gap_spark.sources.fixtures import tiling_df

CFG = EngineConfig(snap_tolerance=1e-5, min_area_to_keep=5e-4)
RES = 8


def _compute(cfg, res):
    """The resolve kernel as a cells->result mapper (reuses resolve()'s
    kernel via a tiny shim: run resolve on the distinct features present)."""
    from resolve_overlap_and_gap_spark.operators import resolve as R

    def fn(todo_rows):
        import pandas as pd

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return R._cell_kernel(pdf, cfg, res)

        return todo_rows.groupBy("cell_id").applyInPandas(kernel, RESOLVE_SCHEMA)

    return fn


@pytest.mark.spark
def test_resume_equivalence(spark, tmp_path):
    df = tiling_df(spark, k=6, cell=0.1, jitter=0.015, seed=3)
    df.cache().count()
    feats = df.selectExpr("cast(fid as long) fid", "geom")
    cells = with_cells(feats, RES)

    # ---- single-shot oracle
    oracle = sorted(
        (r.cell_id, r.owner, tuple(r.other_ids), round(r.area, 15))
        for r in resolve(df, CFG, res=RES).collect()
    )

    # ---- partial run: only half the cells (simulated kill), then resume
    lin = Lineage(spark, str(tmp_path / "ckpt"))
    all_cells = [r.cell_id for r in cells.select("cell_id").distinct().collect()]
    half = set(sorted(all_cells)[: len(all_cells) // 2])
    partial_cells = cells.where(F.col("cell_id").isin(list(half)))
    run_stage_checkpointed(lin, "resolve", partial_cells, _compute(CFG, RES), "resolved")
    done_after_partial = lin.done_cells("resolve").count()
    assert done_after_partial == len(half)

    # ---- resume with the FULL cell set: only remaining cells recompute
    result = run_stage_checkpointed(lin, "resolve", cells, _compute(CFG, RES), "resolved")
    got = sorted(
        (r.cell_id, r.owner, tuple(r.other_ids), round(r.area, 15))
        for r in result.collect()
    )
    assert got == oracle
    assert lin.done_cells("resolve").count() == len(all_cells)

    # ---- idempotence: a third run recomputes nothing and changes nothing
    before = lin._read_lineage().count()
    result2 = run_stage_checkpointed(lin, "resolve", cells, _compute(CFG, RES), "resolved")
    assert lin._read_lineage().count() == before
    got2 = sorted(
        (r.cell_id, r.owner, tuple(r.other_ids), round(r.area, 15))
        for r in result2.collect()
    )
    assert got2 == oracle
