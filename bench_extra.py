#!/usr/bin/env python
"""Isolated per-query benchmark + plan dumper (guide §1.4 / §1.5).

NOT the driver contract — bench.py stays the frozen measurement harness.
This tool times individual registry queries with the noop sink so the
computation is measured without sink/count effects, repeats each query and
reports min/median, and can dump .explain("formatted") to plans/r06/.

Usage:
  python bench_extra.py q1 q2 ...           # time queries (3 reps, noop sink)
  python bench_extra.py --reps 5 q1 ...
  python bench_extra.py --explain suffix q1 # dump plans/r06/<q>_<suffix>.txt
  python bench_extra.py --count q1          # time with .count() like bench.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    explain_suffix = None
    use_count = False
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--explain":
            explain_suffix = args[i + 1]; i += 2
        elif a == "--count":
            use_count = True; i += 1
        else:
            names.append(a); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from resolve_overlap_and_gap_spark.session import get_spark

    spark = get_spark(app_name="rog-bench-extra", parallelism=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    import __spark_entry__ as E

    qs = E.queries()
    # same warmup as bench.py
    spark.range(1 << 20).groupBy((F.col("id") % 16).alias("k")).count().count()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).count()

    out: dict[str, dict] = {}
    for name in names:
        if explain_suffix is not None:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            p = Path(__file__).parent / "plans" / "r06" / f"{name}_{explain_suffix}.txt"
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text(plan)
            print(f"wrote {p}", file=sys.stderr)
            continue
        samples = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            if use_count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {
            "min": min(samples),
            "median": statistics.median(samples),
            "samples": samples,
        }
        print(f"{name:24s} min={min(samples):7.3f} samples={samples}",
              file=sys.stderr)
    if out:
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
