#!/usr/bin/env python
"""Time the resolve_healed pipeline phase by phase (guide §1: isolate the
stage before optimizing it).  Mirrors q_resolve_healed exactly; each phase
boundary is a localCheckpoint/action identical to the query's own."""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from resolve_overlap_and_gap_spark.config import EngineConfig
    from resolve_overlap_and_gap_spark.operators.border import (
        border_gap_merge,
        border_gaps_from_resolve,
        reassemble_border_gaps,
    )
    from resolve_overlap_and_gap_spark.operators.dissolve import dissolve
    from resolve_overlap_and_gap_spark.operators.resolve import resolve
    from resolve_overlap_and_gap_spark.plans.queries import (
        DETECT_CFG_SNAP,
        _density_res,
        derived_polygon_layer,
    )
    from resolve_overlap_and_gap_spark.session import get_spark

    spark = get_spark(app_name="rog-healed-phases", parallelism=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    t0 = time.time()
    layer = derived_polygon_layer(spark, sf_dir)
    res = _density_res(spark, sf_dir)
    cfg = EngineConfig(snap_tolerance=DETECT_CFG_SNAP, min_area_to_keep=1e-4)
    print(f"[layer+res] {time.time()-t0:6.2f}s  res={res}")

    sc.setJobDescription("phase 1: resolve kernel + checkpoint")
    t0 = time.time()
    both = resolve(layer, cfg, res=res, emit_border_gaps=True).select(
        "cell_id", "owner", "geom").localCheckpoint()
    print(f"[resolve+ckpt] {time.time()-t0:6.2f}s  rows={both.count()}")

    sc.setJobDescription("phase 2: border gap reassembly")
    t0 = time.time()
    gaps = border_gaps_from_resolve(both)
    slivers = reassemble_border_gaps(gaps, cfg).localCheckpoint()
    n_sliver = slivers.count()
    print(f"[reassembly] {time.time()-t0:6.2f}s  slivers={n_sliver}")

    pieces = both.where(F.col("owner") >= 0)

    sc.setJobDescription("phase 3+4: full border_gap_merge (assign + dissolve)")
    t0 = time.time()
    healed = border_gap_merge(layer, pieces, cfg, res=res,
                              border_gaps=gaps,
                              checkpoint=False,
                              dissolve_disjoint=True, dissolve_geom=False)
    out = healed.select(
        "owner",
        F.expr("cast(floor(area * 1e9) as bigint)").alias("area_x1e9"),
        "n_parts",
    )
    n = out.count()
    print(f"[merge+dissolve] {time.time()-t0:6.2f}s  owners={n}")

    sc.setJobDescription("phase 3b: final dissolve alone (disjoint, no geom)")
    t0 = time.time()
    d = dissolve(pieces.select("owner", "geom"), "owner", cfg.snap_tolerance,
                 n_salts="auto", auto_checkpoint=False,
                 disjoint=True, with_geom=False)
    print(f"[dissolve only] {time.time()-t0:6.2f}s  rows={d.count()}")


if __name__ == "__main__":
    main()
