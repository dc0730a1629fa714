"""Checkpoint / lineage / resume (north rule: every stage checkpoints
per-partition lineage + metrics so runs resume mid-tiling).

The reference's resume primitive is the job/done list: a cell job is skipped
if present in `_donejobs` (J5 anti-join,
function_resolve_overlap_gap_single_cell.sql:126-132,975-981). Here:

  * results are written partitioned by cell_id with DYNAMIC partition
    overwrite — re-running a cell replaces exactly its partition, so a crash
    between data-write and lineage-write is safe (the cell just recomputes);
  * the lineage table (stage, cell_id, n_rows, wall_ms, ts) is appended
    AFTER the data commit; resume = anti-join cells against it.

Storage defaults to parquet directories; pass table_format="iceberg" (plus
a configured Spark catalog) to run the SAME API against Iceberg tables:
append -> writeTo(t).append(), dynamic partition overwrite ->
writeTo(t).overwritePartitions(), read -> spark.read.table(t).  The north
rule names Iceberg; the sandbox ships no iceberg-spark-runtime jar, so the
iceberg path is exercised by tests/test_lineage_iceberg.py whenever the jar
is present (it skips with the missing-jar reason otherwise) — see
README "Iceberg mode" for the exact spark-submit config diff.
"""

from __future__ import annotations

import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Lineage:
    def __init__(self, spark: SparkSession, root: str,
                 table_format: str = "parquet"):
        """root: a directory path (parquet mode) or a catalog.namespace
        prefix like `local.rog` (iceberg mode)."""
        assert table_format in ("parquet", "iceberg")
        self.spark = spark
        self.root = str(root)
        self.fmt = table_format
        self._lineage_dir = f"{self.root}/_lineage"
        self._lineage_tbl = f"{self.root}.lineage"

    # ------------------------------------------------------------ lineage
    def _lineage_exists(self) -> bool:
        if self.fmt == "iceberg":
            return self.spark.catalog.tableExists(self._lineage_tbl)
        return Path(self._lineage_dir).exists()

    def has_stage(self, stage: str) -> bool:
        return self._lineage_exists() and self._read_lineage().where(
            F.col("stage") == stage
        ).limit(1).count() > 0

    def _read_lineage(self) -> DataFrame:
        if self.fmt == "iceberg":
            return self.spark.read.table(self._lineage_tbl)
        return self.spark.read.parquet(self._lineage_dir)

    def done_cells(self, stage: str) -> DataFrame:
        """(cell_id) already completed for a stage."""
        if not self._lineage_exists():
            return self.spark.createDataFrame([], "cell_id long")
        return (
            self._read_lineage().where(F.col("stage") == stage)
            .select("cell_id").distinct()
        )

    def remaining(self, cells: DataFrame, stage: str) -> DataFrame:
        """J5 anti-join: drop cells already done."""
        return cells.join(F.broadcast(self.done_cells(stage)), "cell_id", "left_anti")

    def log(self, stage: str, metrics: DataFrame) -> None:
        """Append per-cell metrics (cell_id, n_rows[, extra numeric cols])."""
        out = metrics.withColumn("stage", F.lit(stage)).withColumn(
            "ts", F.lit(time.time())
        )
        if self.fmt == "iceberg":
            if not self._lineage_exists():
                out.writeTo(self._lineage_tbl).create()
            else:
                out.writeTo(self._lineage_tbl).append()
        else:
            out.write.mode("append").parquet(self._lineage_dir)

    # ------------------------------------------------------------ results
    def write_cells(self, table: str, df: DataFrame) -> None:
        """Idempotent per-cell write: dynamic partition overwrite replaces
        exactly the recomputed cell partitions (Iceberg: the same commit
        semantics via overwritePartitions, which is also ATOMIC — a crash
        mid-write leaves the previous snapshot visible)."""
        if self.fmt == "iceberg":
            tbl = f"{self.root}.{table}"
            if not self.spark.catalog.tableExists(tbl):
                df.writeTo(tbl).partitionedBy(F.col("cell_id")).create()
            else:
                df.writeTo(tbl).overwritePartitions()
            return
        (
            df.write.partitionBy("cell_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(f"{self.root}/{table}")
        )

    def read(self, table: str) -> DataFrame:
        if self.fmt == "iceberg":
            return self.spark.read.table(f"{self.root}.{table}")
        return self.spark.read.parquet(f"{self.root}/{table}")


def run_stage_checkpointed(
    lin: Lineage,
    stage: str,
    cells: DataFrame,
    compute: "callable[[DataFrame], DataFrame]",
    table: str,
) -> DataFrame:
    """Run `compute` only for cells not yet done; commit data, then lineage.

    cells: DataFrame with a cell_id column (+ payload); compute maps the
    remaining cells' rows to a result DataFrame with cell_id.
    Returns the full result table (previous + new)."""
    todo = lin.remaining(cells.select("cell_id").distinct(), stage)
    todo_rows = cells.join(F.broadcast(todo), "cell_id")
    if not todo_rows.isEmpty():
        result = compute(todo_rows)
        result = result.cache()
        lin.write_cells(table, result)
        metrics = result.groupBy("cell_id").agg(F.count("*").alias("n_rows"))
        # ensure every attempted cell is marked done even if it emitted 0 rows
        metrics = todo.join(metrics, "cell_id", "left").fillna(0, ["n_rows"])
        lin.log(stage, metrics)
        result.unpersist()
    return lin.read(table)
