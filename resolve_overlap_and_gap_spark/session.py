"""SparkSession factory with scale-oriented defaults.

The engine is designed for multi-executor clusters (spark-submit --py-files);
locally we run local[N]. AQE is on so skewed cell joins re-plan at runtime
(the Spark replacement for the reference's per-cell job_list scheduling,
function_resolve_overlap_gap_run.sql:333-443).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "resolve-overlap-and-gap-spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # 8 tasks/core smooths stragglers in the CPU-bound Arrow kernel
        # stages (r5 A/B at 32 cores: 2x -> 4x cut detect+resolve 107s ->
        # 89s; r6 A/B: 4x -> 8x cut the balanced detect kernel stage
        # 10.6 -> 6.4 s at sf0.1; re-A/B'd against 4x under the batched
        # overlay kernels, where halving partitions halves kernel-stage
        # parallelism: detect_balanced 4.5 -> 8.2 s).  AQE coalesces back
        # down for byte-light JVM stages.  Stays proportional to the core
        # count, never a constant.
        shuffle_partitions = 8 * parallelism
    b = (
        SparkSession.builder.master(f"local[{parallelism}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # kernel cost is per-row CPU, not bytes: a 64MB advisory target
        # would coalesce the Arrow stages onto a few cores
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
