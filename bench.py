#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline spatial-join + tiling suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit": "sec",
"queries": {name: sec}, "sf", plus throughput extras}.

Use bench_scaling.py for the N-vs-4N parallelism scaling evidence
(BASELINE.md §2).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BENCH_QUERIES = [
    # JVM-side relational/spatial core
    "cell_count",
    "pip_join",
    "pip_polygon",
    "box_overlaps",
    "tile_assign",
    "tile_owner",
    "border_owner",
    "knn_ring",
    "cells_outside_in",
    # crawl ingestion (gzip'd WARC shards -> records) + geoparse
    "warc_extract",
    "geoparse_cells",
    # text / dedup / similarity
    "dedup_exact",
    "quality_stats",
    "lang_id",
    "fingerprints",
    "minhash_sig",
    "simhash",
    "jaccard_pairs",
    "substring_spans",
    "seq_pack",
    "mixture_sample",
    "line_dedup",
    "c4_filters",
    "ngram_stats",
    "kmv_distinct",
    "bloom_filter",
    "cms_counts",
    "quantiles",
    "pagerank",
    "host_block",
    "cosine_topk",
    "lsh_pairs",
    "simhash_neardup",
    "simhash_clusters",    # pair-explosion guard: one row/doc via CC
    "semantic_clusters",   # SemDeDup: cosine pairs -> CC -> cluster labels
    "top_terms",
    "bpe_tokens",
    "bpe_merges",
    "url_canon",
    "url_latest",
    "mojibake",
    "chunk_docs",
    "pii_scrub",
    "corpus_select",
    # ANN scale paths + multimodal plumbing (rows-only in CORRECTNESS, but
    # they are the 100TB-path operators — bench them)
    "ann_lsh",
    "ann_ivf",
    "embed_quantize",
    "multimodal_features",
    "thumbnail_invariants",
    "image_dhash",
    "audio_fingerprint",
    "image_dedup",
    # relational / semi-structured
    "star_join",
    "json_props",
    # temporal / geodesic joins, reprojection
    "asof_join",
    "interval_count",
    "dwithin_geo",
    "knn_geo",
    "knn_geo_ring",
    "mercator",
    "tiles_to_vector",
    # geometry engine (Arrow-batched arrangement kernels) — the balanced
    # (adaptive-resolution) grid is the benched default: it avoids the
    # global res-flip cliff (BASELINE.md, N=800k) while matching fixed-res
    # output (tests/test_resolve_balanced.py); fixed-res variants stay
    # available as detect_polygons / resolve_polygons in queries()
    "detect_balanced",
    "resolve_balanced",
    "dissolve_polygons",
    "resolve_healed",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    from resolve_overlap_and_gap_spark.session import get_spark

    spark = get_spark(app_name="rog-bench", parallelism=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    import __spark_entry__ as E

    qs = E.queries()
    # JVM/codegen/scan warmup OUTSIDE the timed window (one trivial
    # shuffle + one parquet footer read per table): rounds 1-3 paid ~5-8 s
    # of first-action warmup inside the first query's time (BASELINE.md §6
    # "cell_count 9.2 s vs 1.3 s warm"), which measured the sandbox JVM,
    # not the engine.  Recorded in BASELINE.md §6 so cross-round suite
    # walls stay comparable.
    spark.range(1 << 20).groupBy((F.col("id") % 16).alias("k")).count().count()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).count()
    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    t_all = time.monotonic()
    for name in BENCH_QUERIES:
        t0 = time.monotonic()
        rows[name] = qs[name](spark, sf_dir).count()
        times[name] = round(time.monotonic() - t0, 3)
    total = round(time.monotonic() - t_all, 3)

    # input-rows throughput of the headline join+tiling group
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    n_part = spark.read.parquet(f"{sf_dir}/part.parquet").count()
    join_tiling = ["cell_count", "pip_join", "box_overlaps", "tile_assign",
                   "tile_owner", "border_owner"]
    jt_sec = sum(times[q] for q in join_tiling)
    jt_rows = len(join_tiling) * (n_orders + n_part)
    out = {
        "metric": "suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": cpus,
        "output_rows": rows,
        "join_tiling_rows_per_sec": round(jt_rows / jt_sec, 1) if jt_sec else None,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
