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
    Returns (qid, pid, rank, sim). Ties by pid; self-match excluded."""
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


def with_lsh_bucket(emb: DataFrame, dim: int, n_planes: int = 12, seed: int = 42,
                    vec_col: str = "vec") -> DataFrame:
    """Sign-random-projection bucket id per vector — one numpy matmul per
    Arrow batch (vectorized pandas UDF; the mandated no-per-row-Python path)."""
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(T.LongType())
    def bucket(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy())  # (batch, dim)
        signs = (m @ planes.T) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series(signs.astype(np.int64) @ weights)

    return emb.withColumn("bucket", bucket(F.col(vec_col)))


def lsh_ann_topk(emb: DataFrame, k: int, dim: int, n_planes: int = 8, seed: int = 42) -> DataFrame:
    """ANN all-pairs: candidates share an LSH bucket; exact cosine re-rank in
    the bucket. One equi-join on bucket (shuffle); skewed buckets handled by
    AQE skew-join."""
    b = with_lsh_bucket(emb, dim, n_planes, seed)
    a = b.select(F.col("pid").alias("qid"), F.col("vec").alias("qvec"), "bucket")
    j = b.join(a, "bucket").where(F.col("pid") != F.col("qid"))
    scored = j.withColumn("sim", _dot("vec", "qvec") / (_norm("vec") * _norm("qvec")))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("pid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "pid", "rank", "sim")
    )
