#!/usr/bin/env python
"""cProfile the disjoint dissolve kernel on real heal inputs (sf0.1)."""
from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n_sample = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from resolve_overlap_and_gap_spark.config import EngineConfig
    from resolve_overlap_and_gap_spark.operators.dissolve import (
        _union_bucket_disjoint,
    )
    from resolve_overlap_and_gap_spark.operators.overlap_gap import (
        default_cell_buckets,
    )
    from resolve_overlap_and_gap_spark.operators.resolve import resolve
    from resolve_overlap_and_gap_spark.plans.queries import (
        DETECT_CFG_SNAP,
        _density_res,
        derived_polygon_layer,
    )
    from resolve_overlap_and_gap_spark.session import get_spark

    spark = get_spark(app_name="rog-profile-dissolve", parallelism=16)
    spark.sparkContext.setLogLevel("ERROR")

    layer = derived_polygon_layer(spark, sf_dir)
    res = _density_res(spark, sf_dir)
    cfg = EngineConfig(snap_tolerance=DETECT_CFG_SNAP, min_area_to_keep=1e-4)
    g = cfg.snap_tolerance
    both = resolve(layer, cfg, res=res, emit_border_gaps=True).select(
        "cell_id", "owner", "geom").localCheckpoint()
    pieces = both.where(F.col("owner") >= 0).select(
        F.col("owner").cast("long").alias("key"), "geom")
    # match dissolve()'s own bucket rule (many small buckets — the shared
    # arrangement's ray-cast is quadratic in bucket content)
    n_buckets = max(4096,
                    128 * spark.sparkContext.defaultParallelism)
    pdf = pieces.withColumn(
        "bucket", F.pmod(F.hash("key"), F.lit(n_buckets))
    ).where(F.col("bucket") < n_sample).toPandas()
    print(f"sampled {len(pdf)} pieces across {n_sample}/{n_buckets} buckets")

    keys = pdf["key"].to_numpy()
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    geoms = pdf["geom"].to_numpy(dtype=object)[order]
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    ends = np.r_[starts[1:], len(keys)]

    t0 = time.time()
    prof = cProfile.Profile()
    prof.enable()
    rows = _union_bucket_disjoint(keys, geoms, starts, ends, g, False)
    prof.disable()
    print(f"kernel wall: {time.time()-t0:.2f}s, out rows: {len(rows)}")
    st = pstats.Stats(prof)
    st.sort_stats("cumulative").print_stats(30)
    st.sort_stats("tottime").print_stats(30)


if __name__ == "__main__":
    main()
