"""ANN scale paths: IVF and LSH candidates, exact re-rank; recall measured
against the brute-force oracle on the real embeddings table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from resolve_overlap_and_gap_spark.operators.similarity import (
    cosine_topk_bruteforce,
    ivf_ann_topk,
    lsh_ann_topk,
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