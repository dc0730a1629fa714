"""Streaming dedup == batch dedup on the same data (single window), and the
pages adapter keeps extracted text byte-identical per url (the BASELINE.md
per-row invariant: ingest must be a pass-through on `text`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


@pytest.mark.spark
def test_stream_dedup_matches_batch(spark, tmp_path):
    from resolve_overlap_and_gap_spark.operators.dedup import exact_dedup
    from resolve_overlap_and_gap_spark.sources.pages import synthesize_pages
    from resolve_overlap_and_gap_spark.streaming.dedup import dedup_stream

    src = str(tmp_path / "src")
    pages = synthesize_pages(spark, 500, partitions=4).withColumn(
        "text", F.expr("concat('dup-', cast(doc_id % 50 as string))")
    )
    pages.write.parquet(src)

    stream = spark.readStream.schema(pages.schema).parquet(src)
    q = (
        dedup_stream(stream).writeStream.format("memory").queryName("sdedup")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r.text_hash, r.keep_id, r.n_dups)
        for r in spark.sql("select * from sdedup").collect()
    }
    want = {
        (r.text_hash, r.keep_id, r.n_dups)
        for r in exact_dedup(spark.read.parquet(src)).collect()
    }
    assert got == want and len(got) == 50


@pytest.mark.spark
def test_pages_text_byte_identical(spark):
    from resolve_overlap_and_gap_spark.sources.pages import pages_from_documents

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", F.col("text").alias("orig")
    )
    pages = pages_from_documents(spark, SF_ORACLE)
    j = pages.join(docs, "doc_id")
    bad = j.where(
        (F.col("text") != F.col("orig"))
        | (F.decode(F.col("html"), "UTF-8") != F.col("orig"))
    ).count()
    assert bad == 0
    assert j.count() == docs.count()
