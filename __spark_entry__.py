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

_SHIPPED: set[int] = set()


def _ensure_py_files(spark: SparkSession) -> None:
    """Ship the engine package to executors (the spark-submit --py-files
    deployment mode) so Arrow UDF kernels can import it regardless of the
    driver process's cwd. Idempotent per SparkContext."""
    sc = spark.sparkContext
    if id(sc) in _SHIPPED:
        return
    import shutil
    import tempfile

    pkg_dir = Path(__file__).resolve().parent / "resolve_overlap_and_gap_spark"
    zpath = Path(tempfile.gettempdir()) / "resolve_overlap_and_gap_spark_pkg"
    zfile = shutil.make_archive(str(zpath), "zip", root_dir=pkg_dir.parent,
                                base_dir="resolve_overlap_and_gap_spark")
    try:
        sc.addPyFile(zfile)
    except Exception:
        pass  # already added in this context
    _SHIPPED.add(id(sc))


def _wrap(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_py_files(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the real polygon detection engine — per-cell planar
    arrangement over derived n-gon footprints (find_overlap_and_gap
    semantics) at sf0.001."""
    _ensure_py_files(spark)
    layer = Q.derived_polygon_layer(spark, "/root/testdata/sf0.001", scale=2.0)
    from resolve_overlap_and_gap_spark.config import EngineConfig
    from resolve_overlap_and_gap_spark.operators.overlap_gap import detect_all

    return detect_all(layer, EngineConfig(snap_tolerance=1e-5), res=6).drop("geom")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in Q.queries().items()}


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
