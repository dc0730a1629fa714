"""Streaming MinHash-LSH near-dup == batch minhash_lsh_pairs on the same
data (set compare: pairs repeat across bands in the stream; the batch
query's .distinct() collapses them)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
def test_stream_neardup_matches_batch(spark, tmp_path):
    from resolve_overlap_and_gap_spark.operators import dedup
    from resolve_overlap_and_gap_spark.sources.pages import synthesize_pages
    from resolve_overlap_and_gap_spark.streaming.neardup import neardup_stream

    src = str(tmp_path / "src")
    # 300 docs in 30 near-dup families sharing a long common body
    pages = synthesize_pages(spark, 300, partitions=4).withColumn(
        "text",
        F.expr("concat('shared body of words repeated across family ', "
               "cast(doc_id % 30 as string), ' tail')"),
    )
    pages.write.parquet(src)

    stream = spark.readStream.schema(pages.schema).parquet(src)
    q = (
        neardup_stream(stream).writeStream.format("memory")
        .queryName("sneardup").outputMode("update")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {(r.id_a, r.id_b)
           for r in spark.sql("select * from sneardup").collect()}

    docs = spark.read.parquet(src)
    sig = dedup.minhash_signatures(dedup.shingles(docs, k=3), n_hashes=8)
    want = {(r.id_a, r.id_b)
            for r in dedup.minhash_lsh_pairs(sig, bands=4, rows_per_band=2).collect()}
    assert want  # families actually collide
    assert got == want
