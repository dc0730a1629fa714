#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north rule): run the identical
spatial-join + tiling job at two parallelism levels (default local[8] vs
local[32]) on the same input and report throughput at both plus
efficiency = (T_N / T_4N) / 4.

The job is the engine's headline pipeline — full polygon overlap/gap
detection + resolve + raster tile assignment/ownership + point-in-footprint
join — over a constant-density synthetic layer of SCALING_N polygons
(default 600k), sized so compute dominates scheduling overhead the way a
real multi-executor 100TB job would. Outputs are counted and must be
IDENTICAL at both levels (exact-match gate).

Each run is a fresh subprocess (fresh JVM) so executor-thread counts are
honest. Record results in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent

RUN_SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from resolve_overlap_and_gap_spark.session import get_spark
# SCALING_PROFILE=ratio reproduces the 2-tasks/core + 64MB-advisory config
# (measured N->4N efficiency 0.80; lower absolute throughput at both
# levels). Default = the engine's throughput-tuned session defaults.
kw = {{}}
if os.environ.get("SCALING_PROFILE", "") == "ratio":
    kw = dict(shuffle_partitions=2 * {cpus},
              extra_conf={{"spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m"}})
spark = get_spark(app_name="rog-scaling", parallelism={cpus}, **kw)
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
from resolve_overlap_and_gap_spark.plans import queries as Q
from resolve_overlap_and_gap_spark.operators.overlap_gap import (
    detect_all, detect_all_balanced, assign_balanced_cells)
from resolve_overlap_and_gap_spark.operators.resolve import (
    resolve, resolve_balanced)
from resolve_overlap_and_gap_spark.operators.celljoin import point_in_box_join
from resolve_overlap_and_gap_spark.config import EngineConfig, GridConfig
from resolve_overlap_and_gap_spark import derive

# SCALING_GRID=balanced swaps in the content-balanced (adaptive) grid —
# the suite's benched default — so the >=0.8 criterion is evidenced on
# the shipped path, not only the fixed-res variant.
GRID = os.environ.get("SCALING_GRID", "fixed")

N = {n}
res = Q.res_for_n(N)
layer = Q.synthetic_polygon_layer(spark, N)
parts = spark.sparkContext.defaultParallelism * 2
pts = spark.range(0, N, 1, parts).selectExpr(
    *derive.point_select("id", "pid", Q.SPARK)).withColumnRenamed("pid", "point_id")
boxes = spark.range(0, N // 64, 1, parts).selectExpr(
    *derive.box_select("id", "bid", Q.SPARK, 0.5))

# warmup at small scale (JVM JIT, python workers) — not measured
wl = Q.synthetic_polygon_layer(spark, 20000)
detect_all(wl, EngineConfig(snap_tolerance=1e-5), res=5).count()

t0 = time.monotonic()
rows = 0
if GRID == "balanced":
    gc = GridConfig(base_resolution=res, max_resolution=res + 4,
                    max_rows_in_each_cell=160)
    cfg_b = EngineConfig(snap_tolerance=1e-5, grid=gc)
    # reference parity: the grid is built ONCE (resolve_overlap_gap_init)
    # and both phases consume it — checkpoint the assignment and share it
    asg = assign_balanced_cells(layer, cfg_b).localCheckpoint()
    rows += detect_all_balanced(layer, cfg_b, n_buckets=1024,
                                assigned=asg).count()
    rows += resolve_balanced(
        layer, EngineConfig(snap_tolerance=1e-5, min_area_to_keep=1e-4, grid=gc),
        n_buckets=1024, assigned=asg).count()
else:
    rows += detect_all(layer, EngineConfig(snap_tolerance=1e-5), res=res, n_buckets=1024).count()
    rows += resolve(layer, EngineConfig(snap_tolerance=1e-5, min_area_to_keep=1e-4),
                    res=res, n_buckets=1024).count()
r = Q._tile_range_exprs(7)
tiles = boxes.selectExpr(
    "bid",
    f"explode(flatten(transform(sequence({{r['ix0']}}, {{r['ix1']}}), "
    f"x -> transform(sequence({{r['iy0']}}, {{r['iy1']}}), y -> x * {{r['n']}} + y)))) as tile_id",
)
rows += tiles.groupBy("tile_id").agg(F.min("bid").alias("owner_id")).count()
rows += point_in_box_join(pts.select("point_id", "px", "py"), boxes, 7,
                          broadcast_boxes=True).count()
dt = time.monotonic() - t0
print(json.dumps({{"cpus": {cpus}, "sec": round(dt, 3), "out_rows": rows,
                   "n_polygons": N, "res": res, "grid": GRID}}))
spark.stop()
"""


def _wait_quiet(max_load: float, max_wait_s: int = 1500) -> None:
    """Gate each leg on ambient load: this sandbox has noisy-neighbor
    windows (load 5-19 with zero own processes) that degrade the
    all-cores leg 20-60% while leaving the small leg untouched, which
    corrupts the ratio. Set SCALING_LOAD_GATE=0 to disable."""
    import time as _t

    waited = 0
    while waited < max_wait_s:
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
        if load1 < max_load:
            return
        _t.sleep(15)
        waited += 15


def run_at(cpus: int, n: int) -> dict:
    gate = float(os.environ.get("SCALING_LOAD_GATE", "1.5"))
    if gate > 0:
        _wait_quiet(gate)
    code = RUN_SNIPPET.format(repo=str(REPO), cpus=cpus, n=n)
    p = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=3600,
        cwd=str(REPO),
    )
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(p.stderr[-3000:])
    return json.loads(lines[-1])


def main() -> None:
    n = int(os.environ.get("SCALING_N", "600000"))
    n_low = int(os.environ.get("SCALING_CPUS", "8"))
    n_hi = 4 * n_low
    lo = run_at(n_low, n)
    hi = run_at(n_hi, n)
    assert lo["out_rows"] == hi["out_rows"], "exact-match gate failed across parallelism"
    thr_lo = lo["out_rows"] / lo["sec"]
    thr_hi = hi["out_rows"] / hi["sec"]
    eff = (lo["sec"] / hi["sec"]) / 4.0
    grid = os.environ.get("SCALING_GRID", "fixed")
    print(json.dumps({
        "job": f"detect+resolve ({grid} grid) +tile_owner+pip over synthetic constant-density layer",
        "runs": [lo, hi],
        "throughput_rows_per_sec": {str(n_low): round(thr_lo, 1), str(n_hi): round(thr_hi, 1)},
        "scaling_efficiency_N_to_4N": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
