"""Iceberg-mode lineage: the SAME Lineage API against an Iceberg catalog
(north-rule storage). The sandbox ships no iceberg-spark-runtime jar, so
this module self-detects: with the jar on the classpath it runs the full
resume round-trip; without it, it SKIPS with the precise reason — the
config diff needed to activate it is in README "Iceberg mode".
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


@pytest.mark.spark
def test_lineage_iceberg_roundtrip(spark, tmp_path):
    if not _iceberg_available(spark):
        pytest.skip(
            "iceberg-spark-runtime jar not on classpath (sandbox has no "
            "network); activate with the spark-submit config in README "
            "'Iceberg mode' and this test runs the full resume round-trip"
        )
    from resolve_overlap_and_gap_spark.lineage import Lineage, run_stage_checkpointed

    spark.conf.set("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.local.type", "hadoop")
    spark.conf.set("spark.sql.catalog.local.warehouse", str(tmp_path / "wh"))
    spark.sql("create namespace if not exists local.rog")
    lin = Lineage(spark, "local.rog", table_format="iceberg")

    cells = spark.createDataFrame([(1, 10), (2, 20)], "cell_id long, v long")
    out1 = run_stage_checkpointed(
        lin, "s1", cells, lambda df: df.withColumn("v2", F.col("v") * 2), "t1"
    )
    assert out1.count() == 2
    assert sorted(r.cell_id for r in lin.done_cells("s1").collect()) == [1, 2]
    # resume: nothing recomputes, previous rows read back from the table
    out2 = run_stage_checkpointed(
        lin, "s1", cells, lambda df: (_ for _ in ()).throw(AssertionError("recomputed")),
        "t1",
    )
    assert sorted((r.cell_id, r.v2) for r in out2.collect()) == [(1, 20), (2, 40)]
