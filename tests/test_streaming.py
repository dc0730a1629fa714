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


@pytest.mark.spark
def test_prepare_pages_stream_matches_batch(spark, tmp_path):
    """The full document-prep projection (html->text, canonical url/host,
    lang id, token count, cell assign) is stateless, so running it as a
    stream must produce byte-identical rows to the batch run."""
    from resolve_overlap_and_gap_spark.sources.pages import synthesize_pages
    from resolve_overlap_and_gap_spark.streaming.ingest import (
        prepare_pages_stream,
    )

    src = str(tmp_path / "prep_src")
    synthesize_pages(spark, 300, partitions=4).write.parquet(src)
    batch_in = spark.read.parquet(src)

    cols = ["doc_id", "url", "url_canon", "host", "text", "lang",
            "lang_pred", "n_tokens", "cell_id"]
    want = sorted(tuple(r) for r in
                  prepare_pages_stream(batch_in).select(cols).collect())

    stream = spark.readStream.schema(batch_in.schema).parquet(src)
    q = (
        prepare_pages_stream(stream).select(cols)
        .writeStream.format("memory").queryName("prep")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.sql("select * from prep").collect())
    assert got == want and len(got) == 300
    # extraction really ran: html wrapper stripped, text non-empty
    assert all(t and "<" not in t for t in {r[4] for r in got})


@pytest.mark.spark
def test_warc_records_stream_matches_batch(spark, tmp_path):
    """Streaming WARC shard ingestion == batch extraction, across
    multiple micro-batches (maxFilesPerTrigger=1)."""
    from resolve_overlap_and_gap_spark.sources.warc import (
        synthesize_warc,
        warc_extract,
    )
    from resolve_overlap_and_gap_spark.streaming.ingest import (
        warc_records_stream,
    )

    src = str(tmp_path / "warc_src")
    synthesize_warc(spark, 12, recs_per_file=4, partitions=3).write.parquet(src)
    batch_in = spark.read.parquet(src)
    want = sorted(tuple(r) for r in warc_extract(batch_in).collect())

    stream = (spark.readStream.schema(batch_in.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (
        warc_records_stream(stream)
        .writeStream.format("memory").queryName("warcrecs")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.sql("select * from warcrecs").collect())
    assert got == want and len(got) == 48
