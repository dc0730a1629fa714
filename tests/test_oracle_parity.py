"""Replicates the driver's correctness gate locally: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet tables
(sf0.01) and compare row count, column names, and order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.conftest import SF_ORACLE, TABLES


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.fixture(scope="module")
def qmod():
    import __spark_entry__ as e

    return e


@pytest.mark.spark
def test_all_queries_match_oracle(spark, qmod):
    con = _duck(SF_ORACLE)
    failures = []
    for name, fn in qmod.queries().items():
        sql = qmod.oracle_sql().get(name)
        sdf = fn(spark, SF_ORACLE)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if sql is None:
            assert len(srows) >= 0
            continue
        rel = con.sql(sql)
        dcols = rel.columns
        drows = rel.fetchall()
        if sorted(scols) != sorted(dcols):
            failures.append(f"{name}: columns {sorted(scols)} != {sorted(dcols)}")
            continue
        if len(srows) != len(drows):
            failures.append(f"{name}: rows {len(srows)} != {len(drows)}")
            continue
        a = _normalize(srows, scols)
        b = _normalize(drows, dcols)
        if a != b:
            diff_a = [r for r in a if r not in set(b)][:3]
            diff_b = [r for r in b if r not in set(a)][:3]
            failures.append(f"{name}: values differ; spark-only={diff_a} duck-only={diff_b}")
    assert not failures, "\n".join(failures)


@pytest.mark.spark
def test_entry_smoke(spark, qmod):
    df = qmod.entry(spark)
    rows = df.collect()
    assert isinstance(df.columns, list) and len(df.columns) > 0
    assert len(rows) >= 0
