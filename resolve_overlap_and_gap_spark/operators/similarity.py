"""Similarity search over an embedding column (array<float>).

* ``cosine_topk_bruteforce`` — exact baseline: JVM-side dot products via
  zip_with/aggregate (no Python), window top-k.
* ``lsh_ann_topk`` — scale path: random-hyperplane LSH bucketing computed in
  a vectorized pandas UDF (one numpy matmul per Arrow batch — never per-row
  Python), candidates = same-bucket pairs, exact re-rank inside buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _dot(a: str, b: str) -> F.Column:
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)")


def _norm(a: str) -> F.Column:
    return F.sqrt(F.expr(f"aggregate(transform({a}, x -> x * x), cast(0.0 as double), (acc, v) -> acc + v)"))


def cosine_topk_bruteforce(emb: DataFrame, queries: DataFrame, k: int) -> DataFrame:
    """emb: (pid, vec array<double>); queries: (qid, qvec array<double>).
    Returns (qid, pid, rank, sim). Ties by pid; self-match excluded.
    The emb side is repartitioned first (small parquet = one input split;
    crossJoin would otherwise score the whole product in a single task)."""
    sc = emb.sparkSession.sparkContext
    emb = emb.repartition(sc.defaultParallelism * 2)
    j = emb.crossJoin(F.broadcast(queries)).where(F.col("pid") != F.col("qid"))
    scored = j.withColumn("sim", _dot("vec", "qvec") / (_norm("vec") * _norm("qvec")))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("pid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "pid", "rank", "sim")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def auto_planes(n_rows: int, target_bucket: int = 64,
                min_planes: int = 4, max_planes: int = 28) -> int:
    """Plane count scaled to the corpus (the knn.auto_res analog): the
    within-bucket join is quadratic per bucket, so the plane count must
    grow with log2(n) — p = ceil(log2(n / target_bucket)) puts the
    EXPECTED bucket occupancy n/2^p near target_bucket at any corpus
    size (a fixed 8 planes would leave ~n/256 vectors per bucket at
    100 TB).  Clamped: too many planes fragments true neighbors.
    Deterministic — no data-dependent randomness."""
    import math

    if n_rows <= target_bucket:
        return min_planes
    p = math.ceil(math.log2(n_rows / target_bucket))
    return max(min_planes, min(max_planes, p))


def with_lsh_bucket(emb: DataFrame, dim: int, n_planes: int | None = 12,
                    seed: int = 42, vec_col: str = "vec") -> DataFrame:
    """Sign-random-projection bucket id per vector — one numpy matmul per
    Arrow batch (vectorized pandas UDF; the mandated no-per-row-Python
    path).

    BEHAVIOR NOTE (since round 3): n_planes=None derives the plane count
    from the corpus size via auto_planes — that takes one count() action,
    so the input is localCheckpoint()ed first to avoid silently evaluating
    an expensive upstream plan twice; callers passing an explicit n_planes
    pay no extra action and keep round-2 bucket ids."""
    if n_planes is None:
        emb = emb.localCheckpoint()
        n_planes = auto_planes(emb.count())
    planes = _hyperplanes(dim, n_planes, seed)
    emb = emb.repartition(emb.sparkSession.sparkContext.defaultParallelism * 2)

    @F.pandas_udf(T.LongType())
    def bucket(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy())  # (batch, dim)
        signs = (m @ planes.T) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series(signs.astype(np.int64) @ weights)

    return emb.withColumn("bucket", bucket(F.col(vec_col)))


def auto_centroids(n_rows: int, min_c: int = 8, max_c: int = 65536) -> int:
    """sqrt-n inverted-list count (the standard IVF sizing rule): with
    ~sqrt(n) lists, expected list occupancy AND the probed-candidate count
    both grow as sqrt(n) instead of n — a fixed 16 would leave n/16
    vectors per list at 100 TB (i.e. brute force).  Clamped: 65536 lists
    x dim doubles is the centroid table the driver must broadcast to the
    assign kernel (~64 MB at dim=128 — the flat-centroid ceiling; beyond
    it you shard the coarse quantizer itself)."""
    import math

    return max(min_c, min(max_c, int(math.ceil(math.sqrt(max(n_rows, 1))))))


def _lloyd_stats(emb: DataFrame, cents: np.ndarray, vec_col: str) -> list:
    """One distributed Lloyd statistics pass with a BOUNDED driver
    transfer: each task assigns its Arrow batches to the nearest centroid
    and accumulates per-centroid (raw-vector sum, count) locally, so only
    the non-empty per-task partials (<= n_centroids rows per task) enter
    the shuffle; a higher-order zip_with fold then reduces them to ONE
    array row per centroid.  The driver collects O(n_centroids) rows —
    never n rows, never n_centroids x dim scalar rows.  Assignment
    normalizes vectors (cosine); sums are of the raw vectors, matching
    the mean/renormalize centroid update."""
    from typing import Iterator

    c, d = cents.shape

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sums = np.zeros((c, d))
        cnt = np.zeros(c, np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            a = np.argmax(mn @ cents.T, axis=1)
            np.add.at(sums, a, m)
            cnt += np.bincount(a, minlength=c)
            seen = True
        if seen:
            nz = np.nonzero(cnt)[0]
            yield pd.DataFrame({
                "centroid_id": nz.astype(np.int32),
                "ps": [sums[i].tolist() for i in nz],
                "n": cnt[nz]})

    part = emb.select(vec_col).mapInPandas(
        partials, "centroid_id int, ps array<double>, n long")
    agg = (part.groupBy("centroid_id")
           .agg(F.aggregate(
                    F.collect_list("ps"),
                    F.array_repeat(F.lit(0.0), d),
                    lambda acc, x: F.zip_with(acc, x, lambda p, q: p + q)
                ).alias("s"),
                F.sum("n").alias("n")))
    return agg.collect()


def ivf_build(emb: DataFrame, dim: int, n_centroids: int | None = None,
              lloyd_iters: int = 2, seed: int = 7,
              vec_col: str = "vec") -> tuple[DataFrame, np.ndarray]:
    """IVF coarse index: deterministic hash-seeded centroids refined by a
    fixed number of Lloyd iterations, then every vector assigned to its
    nearest centroid — the inverted-file partitioning used for
    billion-scale ANN. Returns (assigned_df with `centroid_id`, centroids).

    n_centroids=None auto-sizes to ~sqrt(n) lists (one count() action —
    the input is localCheckpoint()ed first so the count and the Lloyd
    passes don't re-evaluate an expensive upstream plan).  Each Lloyd
    iteration is one `_lloyd_stats` pass: assignment + per-centroid
    partial sums fused in a single mapInPandas task pass, reduced to one
    array row per centroid, so the shuffle carries <= tasks x n_centroids
    rows and the driver collects O(n_centroids) rows; the driver-side
    update is a single vectorized numpy scatter — no per-centroid Python
    loop, so 10^4-10^5 lists update in milliseconds."""
    if n_centroids is None:
        emb = emb.localCheckpoint()
        n_centroids = auto_centroids(emb.count())
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_centroids, dim)).astype(np.float64)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    # spread before the assign UDF: a small parquet is one input split and
    # every Lloyd iteration would otherwise run single-task
    emb = emb.repartition(emb.sparkSession.sparkContext.defaultParallelism * 2)

    def assign_udf(cents_arr: np.ndarray):
        @F.pandas_udf(T.IntegerType())
        def assign(v: pd.Series) -> pd.Series:
            m = np.stack(v.to_numpy()).astype(np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            return pd.Series(np.argmax(m @ cents_arr.T, axis=1).astype(np.int32))
        return assign

    for _ in range(lloyd_iters):
        rows = _lloyd_stats(emb, cents, vec_col)
        cid = np.fromiter((r.centroid_id for r in rows), np.int64, len(rows))
        sums = np.zeros((n_centroids, dim))
        cnt = np.zeros(n_centroids)
        if rows:
            sums[cid] = np.stack([np.asarray(r.s, np.float64) for r in rows])
            cnt[cid] = np.fromiter((r.n for r in rows), np.float64, len(rows))
        mean = sums / np.maximum(cnt, 1.0)[:, None]
        norm = np.linalg.norm(mean, axis=1)
        good = (cnt > 0) & (norm > 0)
        new = cents.copy()
        new[good] = mean[good] / norm[good][:, None]
        cents = new
    assigned = emb.withColumn("centroid_id", assign_udf(cents)(F.col(vec_col)))
    return assigned, cents


def ivf_ann_topk(emb: DataFrame, queries: DataFrame, k: int, dim: int,
                 n_centroids: int | None = None, nprobe: int | None = None,
                 seed: int = 7) -> DataFrame:
    """IVF search: queries probe their nprobe nearest centroid lists; the
    candidate join is an equi-join on centroid_id (one shuffle), exact
    cosine re-rank inside. Approximate: recall governed by nprobe.

    Defaults: n_centroids=None -> ~sqrt(n) lists (auto_centroids);
    nprobe=None -> max(4, n_centroids/4) — a recall-first setting sized
    for the ISOTROPIC worst case, where recall ~ the probed-list share
    (ann_invariants pins recall >= 40% on random embeddings).  Clustered
    real corpora concentrate neighbors in few lists; pass an explicit
    nprobe (~sqrt(n_centroids)) there for sqrt-n probe cost."""
    assigned, cents = ivf_build(emb, dim, n_centroids, seed=seed)
    n_centroids = cents.shape[0]
    if nprobe is None:
        nprobe = max(4, -(-n_centroids // 4))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probes(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        order = np.argsort(-(m @ cents.T), axis=1)[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    q = queries.withColumn("centroid_id", F.explode(probes(F.col("qvec"))))
    j = assigned.join(q, "centroid_id").where(F.col("pid") != F.col("qid"))
    scored = j.withColumn("sim", _dot("vec", "qvec") / (_norm("vec") * _norm("qvec")))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("pid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "pid", "rank", "sim")
    )


def lsh_ann_topk(emb: DataFrame, k: int, dim: int, n_planes: int | None = None,
                 seed: int = 42) -> DataFrame:
    """ANN all-pairs: candidates share an LSH bucket; exact cosine re-rank in
    the bucket. One equi-join on bucket (shuffle); skewed buckets handled by
    AQE skew-join.  n_planes defaults to auto_planes(corpus size) so the
    per-bucket quadratic stays bounded as the corpus grows.  The BUCKETED
    frame is checkpointed (not just the input): the self-join would
    otherwise run the projection matmul once per branch."""
    b = with_lsh_bucket(emb, dim, n_planes, seed).localCheckpoint()
    a = b.select(F.col("pid").alias("qid"), F.col("vec").alias("qvec"), "bucket")
    j = b.join(a, "bucket").where(F.col("pid") != F.col("qid"))
    scored = j.withColumn("sim", _dot("vec", "qvec") / (_norm("vec") * _norm("qvec")))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("pid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "pid", "rank", "sim")
    )


def quantize_embeddings(emb: DataFrame, vec_col: str = "vec",
                        id_col: str = "pid") -> DataFrame:
    """Symmetric per-dimension int8 scalar quantization — the embedding
    STORAGE step of a 100 TB ANN pipeline (4x smaller vectors before the
    IVF/LSH index): scale_d = max|x_d| over the corpus, q = floor(x *
    127 / scale_d + 0.5) clamped to [-127, 127].

    All JVM: one posexplode + groupBy(dim) aggregation for the scales
    (map-side combine -> the shuffle is O(partitions x dims), never
    O(rows x dims)), the d-row scale dim broadcast back, and the
    quantization itself a zip_with over the re-collected array.  The
    floor(+0.5) rounding spelling is used instead of round() because
    Spark and DuckDB disagree on round-half ties; floor(+0.5) is
    identical in both engines, so the quantized ints are oracle-exact.

    Returns (id, qvec array<int>, scales array<double>)."""
    spark = emb.sparkSession
    x = emb.select(
        F.col(id_col).alias("pid"),
        F.posexplode(vec_col).alias("i", "x"))
    # sort_array(collect_list(struct)) — NOT orderBy-then-collect_list,
    # whose order an aggregation does not contractually preserve
    scales = (x.groupBy("i").agg(F.max(F.abs(F.col("x"))).alias("mx"))
              .agg(F.expr("transform(sort_array(collect_list(struct(i, mx))),"
                          " s -> s.mx)").alias("scales")))
    return (emb.select(F.col(id_col).alias("pid"), F.col(vec_col).alias("v"))
            .crossJoin(F.broadcast(scales))
            .select(
                "pid",
                F.expr(
                    "zip_with(v, scales, (x, s) -> cast(case when s = 0.0 "
                    "then 0 else greatest(-127, least(127, "
                    "floor(x * 127.0 / s + 0.5))) end as int))"
                ).alias("qvec"),
                "scales",
            ))
