"""Invariant tests for the as-of join, geodesic dwithin join, and simhash
near-dup blocking — each checked against a brute-force formulation on small
inputs, plus plan-shape assertions (the scale path must not degenerate into
a cartesian / broadcast-nested-loop join)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from resolve_overlap_and_gap_spark.operators.asof import asof_join
from resolve_overlap_and_gap_spark.operators.geodist import dwithin_geodesic_join


def _ts(h):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)


@pytest.mark.spark
def test_asof_join_matches_bruteforce(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(5)), (1, 101, _ts(0)), (2, 200, _ts(3)), (3, 300, _ts(9))],
        "k long, eid long, ts timestamp",
    )
    # user 1: orders at h1 (id 10), h5 (ids 11 and 12 — tie on ts)
    right = spark.createDataFrame(
        [(1, _ts(1), 10), (1, _ts(5), 11), (1, _ts(5), 12), (2, _ts(4), 20)],
        "k long, ots timestamp, oid long",
    )
    out = asof_join(left, right, key="k", left_ts="ts", right_ts="ots",
                    payload_cols=["oid"], tie_col="oid")
    got = {(r.eid, r.oid) for r in out.collect()}
    # eid 100 @h5: ties at h5 -> max oid = 12 (inclusive <=)
    # eid 101 @h0: no order before -> excluded
    # eid 200 @h3: order at h4 is later -> excluded
    # k=3 has no right rows -> excluded
    assert got == {(100, 12)}


@pytest.mark.spark
def test_asof_join_plan_no_cartesian(spark):
    left = spark.createDataFrame([(1, 1, _ts(1))], "k long, eid long, ts timestamp")
    right = spark.createDataFrame([(1, _ts(0), 9)], "k long, ots timestamp, oid long")
    plan = asof_join(left, right, "k", "ts", "ots", ["oid"], "oid")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.spark
def test_dwithin_geodesic_matches_bruteforce(spark):
    from resolve_overlap_and_gap_spark.operators.geodist import haversine_sql

    pts = spark.range(0, 400).selectExpr(
        "id as pid",
        "(-180.0 + (id * 37 % 360)) as px",
        "(-80.0 + (id * 53 % 160)) as py",
    )
    qs = spark.range(0, 30).selectExpr(
        "id as qid",
        "(-180.0 + (id * 91 % 360)) as qx",
        "(-80.0 + (id * 17 % 160)) as qy",
    )
    radius = 900.0
    got = {(r.qid, r.pid) for r in dwithin_geodesic_join(qs, pts, radius).collect()}
    d = haversine_sql("qy", "qx", "py", "px")
    brute = {
        (r.qid, r.pid)
        for r in qs.crossJoin(pts).where(F.expr(f"{d} <= {radius!r}")).collect()
    }
    assert got == brute
    assert len(brute) > 0


@pytest.mark.spark
def test_dwithin_geodesic_antimeridian_and_pole(spark):
    from resolve_overlap_and_gap_spark.operators.geodist import haversine_sql

    pts = spark.createDataFrame(
        [(1, 179.8, 10.0), (2, -179.9, 10.2), (3, 0.0, 89.8), (4, 180.0 - 1e-7, 89.7),
         (5, -90.0, 89.9), (6, 10.0, 10.0)],
        "pid long, px double, py double",
    )
    qs = spark.createDataFrame(
        [(100, -179.95, 10.1),   # antimeridian: must see pid 1 and 2
         (200, 90.0, 89.9)],     # polar: circle contains the pole -> all lons
        "qid long, qx double, qy double",
    )
    radius = 120.0
    got = {(r.qid, r.pid) for r in dwithin_geodesic_join(qs, pts, radius).collect()}
    d = haversine_sql("qy", "qx", "py", "px")
    brute = {
        (r.qid, r.pid)
        for r in qs.crossJoin(pts).where(F.expr(f"{d} <= {radius!r}")).collect()
    }
    assert got == brute
    assert (100, 1) in got and (100, 2) in got  # wrap works both directions
    assert any(q == 200 for q, _ in got)        # polar probe finds neighbors


@pytest.mark.spark
def test_simhash_neardup_matches_bruteforce(spark):
    from resolve_overlap_and_gap_spark.operators.dedup import (
        simhash,
        simhash_neardup_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta token{i % 7} word{i % 3}") for i in range(60)],
        "doc_id long, text string",
    )
    sh = simhash(docs, bits=16)
    got = {(r.id_a, r.id_b, r.hamming) for r in
           simhash_neardup_pairs(sh, bits=16, bands=4, max_hamming=3).collect()}
    a = sh.selectExpr("doc_id as id_a", "simhash as sa")
    b = sh.selectExpr("doc_id as id_b", "simhash as sb")
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in a.crossJoin(b)
        .where("id_a < id_b")
        .selectExpr("id_a", "id_b", "cast(bit_count(sa ^ sb) as long) as hamming")
        .where("hamming <= 3")
        .collect()
    }
    assert got == brute
    assert len(brute) > 0


@pytest.mark.spark
def test_asof_join_multi_payload_nulls_atomic(spark):
    """Payload columns from the matched right row must come from the SAME
    row even when some are null (regression: per-column last(ignorenulls)
    stitched values across rows)."""
    left = spark.createDataFrame([(1, 100, _ts(9))], "k long, eid long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(1), 10, "early"), (1, _ts(5), 11, None)],
        "k long, ots timestamp, oid long, note string",
    )
    out = asof_join(left, right, key="k", left_ts="ts", right_ts="ots",
                    payload_cols=["oid", "note"], tie_col="oid").collect()
    assert len(out) == 1
    # matched row is (oid=11, note=None) — NOT note='early' from the older row
    assert out[0].oid == 11 and out[0].note is None
