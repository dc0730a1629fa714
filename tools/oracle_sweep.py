#!/usr/bin/env python
"""Full fresh-process oracle parity sweep over the ENTIRE query registry.

The external driver's CORRECTNESS sweep caps at ~50 queries per round; this
tool drives every `__spark_entry__.queries()` entry against its DuckDB
oracle (or records a rows-only execution for the genuinely non-SQL ones)
and writes the per-round artifact `ORACLE_SWEEP_r{N}.json` next to the
driver's files, so the round's verified state is on its face.

Usage:  python tools/oracle_sweep.py 5          # writes ORACLE_SWEEP_r5.json
Env:    SWEEP_SF_DIR (default /root/testdata/sf0.01)
        SWEEP_CPUS   (default 8)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    sf_dir = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
    cpus = int(os.environ.get("SWEEP_CPUS", "8"))

    import duckdb
    from pyspark.sql import SparkSession

    def fresh_spark():
        s = (
            SparkSession.builder.master(f"local[{cpus}]")
            .config("spark.sql.shuffle.partitions", str(cpus))
            .config("spark.driver.memory",
                    os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        s.sparkContext.setLogLevel("ERROR")
        return s

    spark = fresh_spark()

    import __spark_entry__ as E

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"create view {t} as select * from "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, osql = E.queries(), E.oracle_sql()
    out: dict[str, dict] = {}
    t_all = time.monotonic()
    for qi, name in enumerate(qs):
        if qi and qi % 25 == 0:
            # recycle the SparkContext: one long-lived local context
            # accumulates driver-heap state (codegen/plan caches) across
            # ~60 heavyweight plans and OOMs — same reason the pytest
            # parity suite runs in halves
            spark.stop()
            spark = fresh_spark()
        t0 = time.monotonic()
        rec: dict = {"rows_match": None, "schema_match": None,
                     "hash_match": None, "spark_rows": None,
                     "oracle_rows": None, "err": None}
        try:
            sdf = qs[name](spark, sf_dir)
            srows = sorted(map(tuple, sdf.collect()))
            rec["spark_rows"] = len(srows)
            if name in osql:
                orows = sorted(map(tuple, con.sql(osql[name]).fetchall()))
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(srows) == len(orows)
                rec["schema_match"] = (
                    len(srows) == 0 or len(orows) == 0
                    or len(srows[0]) == len(orows[0]))
                rec["hash_match"] = srows == orows
            else:
                rec["rows_match"] = True    # rows-only: executed
        except Exception as exc:            # noqa: BLE001 — record, not crash
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
        rec["sec"] = round(time.monotonic() - t0, 2)
        out[name] = rec
        status = ("ERR" if rec["err"] else
                  "exact" if rec["hash_match"] else
                  "rows-only" if rec["hash_match"] is None else "MISMATCH")
        print(f"{name}: {status} ({rec['sec']}s)", flush=True)

    n_exact = sum(1 for r in out.values() if r["hash_match"])
    n_bad = sum(1 for r in out.values()
                if r["err"] or r["hash_match"] is False)
    summary = {
        "round": rnd, "sf_dir": sf_dir, "cpus": cpus,
        "n_queries": len(out), "n_oracle_exact": n_exact,
        "n_rows_only": sum(1 for r in out.values()
                           if r["hash_match"] is None and not r["err"]),
        "n_bad": n_bad, "wall_sec": round(time.monotonic() - t_all, 1),
        "results": out,
    }
    dest = REPO / f"ORACLE_SWEEP_r{rnd}.json"
    dest.write_text(json.dumps(summary, indent=1))
    print(f"\nwrote {dest}: {n_exact} exact / {len(out)} queries, "
          f"{n_bad} bad", flush=True)
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
