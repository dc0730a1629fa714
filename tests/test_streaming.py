"""Streaming ingest test: file-source stream with availableNow trigger must
produce the identical per-cell counts as the batch path on the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from resolve_overlap_and_gap_spark import grid
from resolve_overlap_and_gap_spark.streaming.ingest import cell_counts_stream, geo_parse_stream


@pytest.mark.spark
def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    from resolve_overlap_and_gap_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, 2000, partitions=4)
    pages.write.parquet(src)

    stream = spark.readStream.schema(pages.schema).parquet(src)
    agg = cell_counts_stream(stream, res=5)
    q = (
        agg.writeStream.format("memory").queryName("cellcounts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    got = {
        (r.cell_id, r.n_pages)
        for r in spark.sql("select cell_id, n_pages from cellcounts").collect()
    }
    want = {
        (r.cell_id, r.n_pages)
        for r in geo_parse_stream(spark.read.parquet(src), res=5)
        .groupBy("cell_id").agg(F.count("*").alias("n_pages")).collect()
    }
    assert got == want and len(got) > 100
