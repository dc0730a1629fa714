#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north rule): run the identical
headline job at two parallelism levels (default local[8] vs local[32]) on the
same input and report throughput at both plus efficiency = (T_N / T_4N) / 4.

Each run is a fresh subprocess (fresh JVM) so executor-thread counts are
honest. Results are printed as JSON and should be recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent

RUN_SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from resolve_overlap_and_gap_spark.session import get_spark
spark = get_spark(app_name="rog-scaling", parallelism={cpus})
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
qs = E.queries()
sf_dir = {sf_dir!r}
names = ["pip_join", "box_overlaps", "tile_assign", "tile_owner",
         "detect_polygons", "resolve_polygons"]
# steady-state measurement: full warmup pass (JVM JIT, python workers,
# parquet footers), then the timed pass — models a long-running job where
# startup is amortized
for n in names:
    qs[n](spark, sf_dir).count()
t0 = time.monotonic()
rows = 0
for n in names:
    rows += qs[n](spark, sf_dir).count()
dt = time.monotonic() - t0
print(json.dumps({{"cpus": {cpus}, "sec": round(dt, 3), "out_rows": rows}}))
spark.stop()
"""


def run_at(cpus: int, sf_dir: str) -> dict:
    code = RUN_SNIPPET.format(repo=str(REPO), cpus=cpus, sf_dir=sf_dir)
    p = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=3600,
        cwd=str(REPO),
    )
    line = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("SCALING_N", "8"))
    n4 = 4 * n
    lo = run_at(n, sf_dir)
    hi = run_at(n4, sf_dir)
    thr_lo = lo["out_rows"] / lo["sec"]
    thr_hi = hi["out_rows"] / hi["sec"]
    eff = (lo["sec"] / hi["sec"]) / 4.0
    print(json.dumps({
        "sf_dir": sf_dir,
        "runs": [lo, hi],
        "throughput_rows_per_sec": {str(n): round(thr_lo, 1), str(n4): round(thr_hi, 1)},
        "scaling_efficiency_N_to_4N": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
