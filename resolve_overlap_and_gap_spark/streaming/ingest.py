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


def prepare_pages_stream(pages: DataFrame, res: int = 6) -> DataFrame:
    """The full document-prep stage of a crawl pipeline as ONE stateless
    streaming projection over the input_hint shape (url, warc_ts,
    html:binary, text, lang): html -> visible text, canonical URL + host
    (the dedup/blocking keys), n-gram language id, token count, and the
    geo cell assignment — every step a JVM expression shared with the
    batch operators (textstats/derive), so a live feed and a backfill
    produce byte-identical rows (tests assert stream == batch).  At
    100 TB this is the map-only stage: no state, no shuffle; it chains
    directly into the stateful operators (dedup_stream, neardup_stream,
    cell_counts_stream)."""
    from resolve_overlap_and_gap_spark.operators.textstats import (
        canonical_url_sql,
        html_to_text_sql,
        lang_id_sql,
        token_count_sql,
        url_host_sql,
    )

    S = derive.SPARK
    html_src = "decode(html, 'UTF-8')"
    out = pages.selectExpr(
        "url",
        "warc_ts",
        "doc_id",
        f"{canonical_url_sql('url', S)} as url_canon",
        f"{html_to_text_sql(html_src, S)} as text",
        "lang",
    ).selectExpr(
        "*",
        f"{url_host_sql('url_canon', S)} as host",
        f"{lang_id_sql('text')} as lang_pred",
        f"{token_count_sql('text', S)} as n_tokens",
    )
    return geo_parse_stream(out, "doc_id", res)


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


def warc_records_stream(files: DataFrame) -> DataFrame:
    """Streaming WARC ingestion: continuous crawl delivery lands shard
    payloads in a bronze table and this parses them incrementally.  The
    batch extractor is STATELESS (mapInPandas over independent shard
    files — the file is the unit of parallelism), so the same operator
    applies to a streaming DataFrame unchanged and stream == batch holds
    row for row across micro-batches."""
    from resolve_overlap_and_gap_spark.sources.warc import warc_extract

    return warc_extract(files)
