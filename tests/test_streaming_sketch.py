"""Streaming KMV == batch KMV on the same data, including across multiple
micro-batches (maxFilesPerTrigger=1 forces one batch per source file, so
the bounded keyed state must merge correctly batch over batch)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
def test_stream_kmv_matches_batch(spark, tmp_path):
    from resolve_overlap_and_gap_spark.operators.sketch import kmv_distinct
    from resolve_overlap_and_gap_spark.sources.pages import synthesize_pages
    from resolve_overlap_and_gap_spark.streaming.sketch import kmv_stream

    src = str(tmp_path / "src")
    pages = synthesize_pages(spark, 600, partitions=1).withColumn(
        "grp", F.expr("cast(doc_id % 3 as string)"))
    # three source files -> three micro-batches
    for part in range(3):
        pages.where(F.col("doc_id") % 3 == part).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(spark.read.parquet(src).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (kmv_stream(stream, "text", k=32, group_expr="grp")
         .writeStream.format("memory").queryName("skmv")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = spark.sql("select * from skmv").collect()
    assert rows, "no streaming output"
    final = {}
    for r in rows:
        if r.grp not in final or r.n_updates > final[r.grp].n_updates:
            final[r.grp] = r
    got = {(g, r.n_seen, r.kmv_est) for g, r in final.items()}

    want = {(r.grp, r.n_seen, r.kmv_est)
            for r in kmv_distinct(spark.read.parquet(src), "text", k=32,
                                  group_col="grp").collect()}
    assert got == want
    # the state is a real sketch: estimating, not counting
    assert any(n == 32 for (_, n, _) in got)


@pytest.mark.spark
def test_stream_kmv_exact_below_k(spark, tmp_path):
    from resolve_overlap_and_gap_spark.streaming.sketch import kmv_stream

    src = str(tmp_path / "src2")
    df = spark.createDataFrame(
        [(i, f"v{i % 10}") for i in range(100)], "doc_id long, text string")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (kmv_stream(stream, "text", k=32)
         .writeStream.format("memory").queryName("skmv2")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    (r,) = spark.sql("select * from skmv2").collect()
    assert (r.grp, r.n_seen, r.kmv_est) == ("all", 10, 10)
