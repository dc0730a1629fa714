"""Sources: the Common-Crawl-style pages table.

BASELINE.json input_hint mandates the engine operate over
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).

Two constructors:
  * ``pages_from_documents`` — adapt the driver-provided ``documents``
    parquet (doc_id, text, lang, source, n_chars) into the pages shape. The
    ``text`` column is passed through untouched (byte-identity invariant,
    BASELINE.md correctness gate).
  * ``synthesize_pages`` — deterministic seeded generator for tests/bench at
    arbitrary row counts (no external data; FIXTURES.md F0).

Geometry is NOT stored — it is derived on the fly by derive.py formulas, so
any pages DataFrame gains (px, py[, footprint box]) via ``with_point`` /
``with_footprint`` without a Python UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from resolve_overlap_and_gap_spark import derive
from resolve_overlap_and_gap_spark.geom import wkb as _wkb


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return doc.select(
        F.concat(F.lit("http://"), F.col("source"), F.lit("/"), F.col("doc_id").cast("string")).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(F.col("text"), "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
    )


def synthesize_pages(spark: SparkSession, n: int, partitions: int = 32) -> DataFrame:
    """Seeded deterministic pages table of ``n`` rows, generated JVM-side
    (spark.range + built-ins; no Python, no external data)."""
    df = spark.range(0, n, 1, partitions)
    return df.select(
        F.concat(F.lit("http://site-"), (F.col("id") % 1000).cast("string"),
                 F.lit(".example/page/"), F.col("id").cast("string")).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(F.concat(F.lit("<html><body>doc "), F.col("id").cast("string"),
                          F.lit("</body></html>")), "UTF-8").alias("html"),
        F.concat(F.lit("synthetic document body number "), F.col("id").cast("string"),
                 F.lit(" with deterministic text payload")).alias("text"),
        F.when(F.col("id") % 5 == 0, "no").otherwise("en").alias("lang"),
        F.col("id").alias("doc_id"),
    )


def with_point(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Derive the page's lon/lat point (geo-parse stage) — JVM expressions."""
    return df.withColumn("px", F.expr(derive.lon_sql(key_col, derive.SPARK))).withColumn(
        "py", F.expr(derive.lat_sql(key_col, derive.SPARK))
    )


def with_ngon_footprint(df: DataFrame, scale: float = 1.0,
                        id_col: str = "pid") -> DataFrame:
    """Derive an irregular convex n-gon footprint (WKB Polygon) around each
    page point — the geo-parse stage for real-polygon operators. Built in an
    Arrow-batched pandas UDF with integer hash mixing (deterministic, no RNG
    state, no per-row Spark Python)."""
    @F.pandas_udf(T.BinaryType())
    def ngon(pid: pd.Series, px: pd.Series, py: pd.Series) -> pd.Series:
        ids = pid.to_numpy(dtype=np.int64)
        xs = px.to_numpy(dtype=np.float64)
        ys = py.to_numpy(dtype=np.float64)
        h = (ids * np.int64(2654435761)) & np.int64(0xFFFFFFFF)
        nv = 5 + (h % 4)                       # 5..8 vertices
        rad = (0.05 + (h % 5000) / 10000.0) * scale
        out = []
        for i in range(len(ids)):
            k = np.arange(nv[i])
            mix = ((ids[i] * np.int64(40503) + k * np.int64(2654435761))
                   & np.int64(0xFFFFFFFF)).astype(np.float64) / 4294967296.0
            ang = 2.0 * np.pi * (k + mix * 0.5) / nv[i]
            rr = rad[i] * (0.7 + 0.6 * mix)
            ring = np.stack([xs[i] + rr * np.cos(ang), ys[i] + rr * np.sin(ang)], axis=1)
            out.append(_wkb.dump_polygon([ring]))
        return pd.Series(out)

    return df.withColumn("geom", ngon(F.col(id_col), F.col("px"), F.col("py")))


def with_footprint(df: DataFrame, key_col: str = "doc_id", scale: float = 1.0) -> DataFrame:
    """Derive the page's footprint box (xmin/ymin/xmax/ymax)."""
    b = derive.box_sql(key_col, derive.SPARK, scale)
    out = df
    for k, v in b.items():
        out = out.withColumn(k, F.expr(v))
    return out


def with_regular_ngon(df: DataFrame, k: int = 8, scale: float = 1.0,
                      id_col: str = "pid") -> DataFrame:
    """Regular convex k-gon WKB footprint from the derive.regular_ngon
    formula — numpy mirror of the SQL so oracle vertices match exactly.
    Needs derived px/py columns (with_point / derive.point_select)."""
    @F.pandas_udf(T.BinaryType())
    def ngon(pid: pd.Series, px: pd.Series, py: pd.Series) -> pd.Series:
        import hashlib

        ids = pid.to_numpy(dtype=np.int64)
        xs = px.to_numpy(dtype=np.float64)
        ys = py.to_numpy(dtype=np.float64)
        # h32(key, salt) mirrors derive.h32 (md5 prefix of "<key><salt>")
        def h32(i: int, salt: str) -> int:
            return int(hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:8], 16)

        ang0 = 2.0 * np.pi * np.arange(k) / k
        out = []
        for j in range(len(ids)):
            r = (0.05 + (h32(ids[j], ":w") % 5000) / 10000.0) * scale
            ph = (h32(ids[j], ":rot") % 6283) / 1000.0
            a = ph + ang0
            ring = np.stack([xs[j] + r * np.cos(a), ys[j] + r * np.sin(a)], axis=1)
            out.append(_wkb.dump_polygon([ring]))
        return pd.Series(out)

    return df.withColumn("geom", ngon(F.col(id_col), F.col("px"), F.col("py")))


def with_box_wkb(df: DataFrame) -> DataFrame:
    """WKB Polygon rectangle from footprint box columns (xmin/ymin/xmax/
    ymax, e.g. derive.box_select). Axis-aligned boxes make the full overlay
    engine ORACLE-CHECKABLE: pairwise box intersection areas are plain SQL
    (greatest/least), so detect-over-boxes can be hash-compared against
    DuckDB while still exercising the real cell-partitioned arrangement."""
    @F.pandas_udf(T.BinaryType())
    def boxwkb(xmin: pd.Series, ymin: pd.Series, xmax: pd.Series,
               ymax: pd.Series) -> pd.Series:
        x0 = xmin.to_numpy(dtype=np.float64)
        y0 = ymin.to_numpy(dtype=np.float64)
        x1 = xmax.to_numpy(dtype=np.float64)
        y1 = ymax.to_numpy(dtype=np.float64)
        out = []
        for j in range(len(x0)):
            ring = np.array([[x0[j], y0[j]], [x1[j], y0[j]],
                             [x1[j], y1[j]], [x0[j], y1[j]]])
            out.append(_wkb.dump_polygon([ring]))
        return pd.Series(out)

    return df.withColumn(
        "geom", boxwkb(F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"))
    )
