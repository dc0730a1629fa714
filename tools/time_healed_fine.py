#!/usr/bin/env python
"""Finer-grained timing of the resolve_healed pipeline internals."""
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
    from resolve_overlap_and_gap_spark.grid import RES_SHIFT
    from resolve_overlap_and_gap_spark.operators.border import (
        border_gaps_from_resolve,
        reassemble_border_gaps,
    )
    from resolve_overlap_and_gap_spark.operators.dissolve import dissolve
    from resolve_overlap_and_gap_spark.operators.overlap_gap import with_cells
    from resolve_overlap_and_gap_spark.operators.resolve import resolve
    from resolve_overlap_and_gap_spark.operators.overlap_gap import (
        default_cell_buckets,
    )
    from resolve_overlap_and_gap_spark.plans.queries import (
        DETECT_CFG_SNAP,
        _density_res,
        derived_polygon_layer,
    )
    from resolve_overlap_and_gap_spark.session import get_spark
    from resolve_overlap_and_gap_spark import grid

    spark = get_spark(app_name="rog-healed-fine", parallelism=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    t0 = time.time()
    layer = derived_polygon_layer(spark, sf_dir)
    res = _density_res(spark, sf_dir)
    cfg = EngineConfig(snap_tolerance=DETECT_CFG_SNAP, min_area_to_keep=1e-4)
    print(f"[layer+res] {time.time()-t0:6.2f}s res={res} buckets={default_cell_buckets(layer)}", flush=True)

    feats = layer.select(F.col("fid").cast("long").alias("fid"), "geom")
    sc.setJobDescription("a: with_cells explode only")
    t0 = time.time()
    noop(with_cells(feats, res))
    print(f"[a with_cells noop] {time.time()-t0:6.2f}s", flush=True)

    sc.setJobDescription("b: resolve noop (no ckpt)")
    t0 = time.time()
    noop(resolve(layer, cfg, res=res, emit_border_gaps=True)
         .select("cell_id", "owner", "geom"))
    print(f"[b resolve noop] {time.time()-t0:6.2f}s", flush=True)

    sc.setJobDescription("c: resolve + localCheckpoint")
    t0 = time.time()
    both = resolve(layer, cfg, res=res, emit_border_gaps=True).select(
        "cell_id", "owner", "geom").localCheckpoint()
    print(f"[c resolve+ckpt] {time.time()-t0:6.2f}s", flush=True)

    gaps = border_gaps_from_resolve(both)
    pieces = both.where(F.col("owner") >= 0)

    sc.setJobDescription("d: reassembly")
    t0 = time.time()
    slivers = reassemble_border_gaps(gaps, cfg)
    sl_df = slivers.select(
        F.monotonically_increasing_id().alias("gap_id"),
        "gap_area",
        F.col("geom").alias("gap_geom"),
    ).localCheckpoint()
    print(f"[d reassembly+ckpt] {time.time()-t0:6.2f}s n={sl_df.count()}", flush=True)

    sc.setJobDescription("e: piece_res distinct")
    t0 = time.time()
    res_col = F.shiftrightunsigned(F.col("cell_id"), RES_SHIFT).bitwiseAND(F.lit(0x1F))
    piece_res = sorted(int(r.r) for r in
                       pieces.select(res_col.alias("r")).distinct().collect())
    print(f"[e piece_res] {time.time()-t0:6.2f}s {piece_res}", flush=True)

    sc.setJobDescription("f: sliver candidates + assign kernel")
    t0 = time.time()
    from resolve_overlap_and_gap_spark.operators import border as B
    sl_in = (sl_df.withColumnRenamed("gap_geom", "geom")
             .withColumnRenamed("gap_id", "fid"))
    sl_cells = None
    for r in piece_res:
        part = with_cells(sl_in, r).select(
            F.col("fid").alias("gap_id"), F.col("gap_area"),
            F.col("geom").alias("gap_geom"), F.col("cell_id"))
        sl_cells = part if sl_cells is None else sl_cells.unionByName(part)
    cand = sl_cells.join(
        pieces.select("cell_id", "owner", F.col("geom").alias("piece_geom")),
        "cell_id")
    noop(cand)
    print(f"[f cand join noop] {time.time()-t0:6.2f}s", flush=True)

    sc.setJobDescription("g: final dissolve (disjoint, no geom) on pieces")
    t0 = time.time()
    d = dissolve(pieces.select("owner", "geom"), "owner", cfg.snap_tolerance,
                 n_salts="auto", auto_checkpoint=False,
                 disjoint=True, with_geom=False)
    noop(d)
    print(f"[g dissolve noop] {time.time()-t0:6.2f}s", flush=True)


if __name__ == "__main__":
    main()
