"""Structured Streaming ingest of the pages feed.

The reference is batch-only (SURVEY.md §2.10); its incremental analog is the
job/done-list resume loop, which this engine covers with lineage.py. This
module adds the forward-looking streaming path the graft calls for: a pages
stream (url, warc_ts, text, lang) is geo-parsed and cell-assigned with the
SAME JVM expressions as the batch path, then aggregated per cell with a
watermark — so a backfill (batch) and a live feed (stream) produce identical
cell statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from resolve_overlap_and_gap_spark import derive, grid


def geo_parse_stream(pages: DataFrame, key_col: str = "doc_id", res: int = 6) -> DataFrame:
    """Same derivation as batch (derive.py formulas) — works on streaming
    DataFrames because everything is stateless JVM expressions."""
    return (
        pages.withColumn("px", F.expr(derive.lon_sql(key_col, derive.SPARK)))
        .withColumn("py", F.expr(derive.lat_sql(key_col, derive.SPARK)))
        .withColumn("cell_id", grid.cell_id_col(F.col("px"), F.col("py"), res))
    )


def cell_counts_stream(pages: DataFrame, key_col: str = "doc_id", res: int = 6,
                       watermark: str = "10 minutes",
                       window: str = "1 hour") -> DataFrame:
    """Watermarked per-cell/per-window page counts — the streaming A1
    (num_polygons analog). Late rows beyond the watermark are dropped by
    Spark's state store; counts are partial-aggregated map-side."""
    parsed = geo_parse_stream(pages, key_col, res)
    return (
        parsed.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("cell_id"))
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("window_start"), "cell_id", "n_pages")
    )
