"""Streaming exact deduplication of the pages feed — the streaming face of
operators/dedup.exact_dedup (hash-groupBy, min-id keep rule). Windowed on
event time with a watermark so state is bounded: duplicates are only
collapsed within a window (a live crawl dedups against the recent past; the
full-history pass stays batch, as in the reference's batch-only design,
SURVEY.md §2.10).

Deterministic by construction: min(doc_id) per (window, text_hash) — no
dependence on micro-batch arrival order (dropDuplicates would keep an
arrival-dependent row instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from resolve_overlap_and_gap_spark.derive import SPARK
from resolve_overlap_and_gap_spark.operators.dedup import normalize_sql


def dedup_stream(pages: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 ts_col: str = "warc_ts", watermark: str = "10 minutes",
                 window: str = "1 hour") -> DataFrame:
    """-> (window_start, text_hash, keep_id, n_dups) per event-time window."""
    hashed = pages.select(
        F.col(ts_col),
        F.expr(f"md5({normalize_sql(text_col, SPARK)})").alias("text_hash"),
        F.col(id_col).cast("long").alias("doc_id"),
    )
    return (
        hashed.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col("text_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_dups"))
        .select(F.col("w.start").alias("window_start"), "text_hash", "keep_id", "n_dups")
    )
