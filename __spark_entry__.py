"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship pipeline on sf0.001; queries()/oracle_sql() expose
every implemented operator from SURVEY.md §2 with DuckDB oracles built from
the same dialect-parameterized formula builders (see
resolve_overlap_and_gap_spark/plans/queries.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from resolve_overlap_and_gap_spark.plans import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: overlap self-join + tile ownership over page footprints at
    sf0.001 (J2 + J8 — the core of find_overlap_and_gap detection on the
    derived-footprint layer)."""
    return Q.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
