"""Per-stage checkpoint + per-partition lineage.

Generalizes the reference's run metadata (`aspect_extractions.status` /
`retry_count`, db/manager.py:172-190) and its model-file existence checks
(run.sh:47-53): every stage writes its output table plus lineage rows
(stage, partition_id, output_rows, checkpoint_ts, status); a re-run skips
stages whose lineage is complete — resume-from-checkpoint mid-pipeline.

All table writes and reads go through one chokepoint pair (`_write_table` /
`_read_table`) selected by `table_format`:

- "parquet" (default): plain directories under work_dir — works everywhere.
- "iceberg": `df.writeTo(<catalog_table>).using("iceberg")` v2 writes into
  a namespace derived from work_dir, giving snapshot isolation + time
  travel on a cluster with an Iceberg catalog (SURVEY §1.4). When no
  catalog is configured (this sandbox), the store falls back to parquet at
  construction time with a warning, so pipelines are portable unchanged.
"""

from __future__ import annotations

import json
import os
import re
import time
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "stage string, partition_id int, output_rows long, checkpoint_ts double, "
    "status string, duration_sec double"
)


class StageStore:
    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        table_format: str = "parquet",
        catalog: str = "spark_catalog",
        bucket_spec: dict[str, tuple[str, int]] | None = None,
    ):
        """`bucket_spec` maps a stage name to (key, n_buckets): that stage's
        checkpoint is written hash-bucketed (and sorted) on the key, so every
        downstream join/aggregate on it plans without an Exchange — one
        shuffle at write time buys shuffle-free repeated consumption
        (plans/bucketing.py holds the rationale). Parquet format only; the
        bucket layout lives in the session catalog and is re-registered from
        the on-disk files on resume in a fresh session."""
        self.spark = spark
        self.work_dir = work_dir
        self.catalog = catalog
        self.bucket_spec = dict(bucket_spec or {})
        os.makedirs(work_dir, exist_ok=True)
        if table_format == "iceberg" and not self._iceberg_usable():
            warnings.warn(
                "table_format='iceberg' requested but no Iceberg catalog is "
                "configured on this session; falling back to parquet",
                stacklevel=2,
            )
            table_format = "parquet"
        self.table_format = table_format

    # -- iceberg -------------------------------------------------------------
    def _namespace(self) -> str:
        # one namespace per work_dir so concurrent runs don't collide
        return "kg_" + re.sub(r"[^A-Za-z0-9_]", "_", self.work_dir).strip("_")

    def _table_ident(self, stage: str) -> str:
        return f"{self.catalog}.{self._namespace()}.{stage}"

    def _iceberg_usable(self) -> bool:
        """True iff the session's catalog accepts Iceberg v2 writes (an
        Iceberg SparkCatalog / SparkSessionCatalog is configured)."""
        impl = self.spark.conf.get(f"spark.sql.catalog.{self.catalog}", None)
        if not impl or "iceberg" not in impl.lower():
            return False
        try:
            self.spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.catalog}.{self._namespace()}")
            return True
        except Exception:
            return False

    # -- format chokepoints ---------------------------------------------------
    def _bucket_table_name(self, stage: str) -> str:
        return f"{self._namespace()}_{stage}"

    def _write_table(self, df: DataFrame, stage: str, kind: str = "table") -> None:
        if self.table_format == "iceberg":
            df.writeTo(self._table_ident(f"{kind}_{stage}")).using("iceberg").createOrReplace()
            return
        path = self._table_path(stage) if kind == "table" else self._lineage_path(stage)
        if kind == "table" and stage in self.bucket_spec:
            key, n_buckets = self.bucket_spec[stage]
            name = self._bucket_table_name(stage)
            self.spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                df.write.mode("overwrite")
                .option("path", path)
                .bucketBy(n_buckets, key)
                .sortBy(key)
                .saveAsTable(name)
            )
            return
        df.write.mode("overwrite").parquet(path)

    def _read_table(self, stage: str, kind: str = "table") -> DataFrame:
        if self.table_format == "iceberg":
            return self.spark.table(self._table_ident(f"{kind}_{stage}"))
        path = self._table_path(stage) if kind == "table" else self._lineage_path(stage)
        if kind == "table" and stage in self.bucket_spec:
            name = self._bucket_table_name(stage)
            if not self.spark.catalog.tableExists(name):
                # resume in a fresh session: the files on disk carry the
                # bucket layout in their names; re-register the external
                # table so Catalyst recovers outputPartitioning
                key, n_buckets = self.bucket_spec[stage]
                schema_ddl = self.spark.read.parquet(path).schema.toDDL()
                self.spark.sql(
                    f"CREATE TABLE {name} ({schema_ddl}) USING PARQUET "
                    f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {n_buckets} BUCKETS "
                    f"LOCATION '{path}'"
                )
            return self.spark.table(name)
        return self.spark.read.parquet(path)

    # -- paths ---------------------------------------------------------------
    def _table_path(self, stage: str) -> str:
        return os.path.join(self.work_dir, stage)

    def _lineage_path(self, stage: str) -> str:
        return os.path.join(self.work_dir, "_lineage", stage)

    def _artifact_path(self, stage: str) -> str:
        return os.path.join(self.work_dir, "_artifacts", f"{stage}.json")

    # -- status ---------------------------------------------------------------
    def is_complete(self, stage: str) -> bool:
        # short-circuit the common first-run miss: spark.read.parquet on a
        # missing dir logs a WARN + stack trace before the except fires,
        # which buries real warnings in operator logs
        if self.table_format == "parquet" and not os.path.isdir(self._lineage_path(stage)):
            return False
        try:
            rows = self._read_table(stage, kind="lineage").filter(F.col("status") == "complete").count()
            return rows > 0
        except Exception:
            return False

    def _write_lineage(self, stage: str, df_on_disk: DataFrame, duration_sec: float) -> None:
        # Partition identity = the writer task's output file (part-NNNNN),
        # via the hidden `_metadata` column — NOT spark_partition_id() of the
        # read-back scan, which bin-packs small files and would report the
        # reader's coalesced layout instead of the layout the stage produced.
        if self.table_format == "parquet":
            pid = F.regexp_extract(F.col("_metadata.file_name"), r"part-(\d+)", 1).cast("int")
        else:
            pid = F.spark_partition_id()
        counts = (
            df_on_disk.groupBy(pid.alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("output_rows"))
            .withColumn("stage", F.lit(stage))
            .withColumn("checkpoint_ts", F.lit(time.time()))
            .withColumn("status", F.lit("complete"))
            .withColumn("duration_sec", F.lit(float(duration_sec)))
            .select(
                "stage", "partition_id", "output_rows", "checkpoint_ts", "status", "duration_sec"
            )
        )
        if counts.rdd.isEmpty():
            counts = self.spark.createDataFrame(
                [(stage, -1, 0, time.time(), "complete", float(duration_sec))], LINEAGE_SCHEMA
            )
        self._write_table(counts, stage, kind="lineage")

    # -- DataFrame stages ------------------------------------------------------
    def run_table(self, stage: str, fn, resume: bool = True) -> DataFrame:
        if resume and self.is_complete(stage):
            return self._read_table(stage)
        t0 = time.time()
        df = fn()
        self._write_table(df, stage)
        on_disk = self._read_table(stage)
        self._write_lineage(stage, on_disk, duration_sec=time.time() - t0)
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
        if self.table_format == "iceberg":
            ns = f"{self.catalog}.{self._namespace()}"
            names = [
                r["tableName"]
                for r in self.spark.sql(f"SHOW TABLES IN {ns}").collect()
                if r["tableName"].startswith("lineage_")
            ]
            out = None
            for n in names:
                t = self._coerce_lineage_schema(self.spark.table(f"{ns}.{n}"))
                out = t if out is None else out.unionByName(t)
            if out is not None:
                return out
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        # explicit schema, not inference: work_dirs written before the
        # schema gained duration_sec hold mixed-schema parquet, and the
        # reader fills columns missing from a file with null instead of
        # failing the rollup on whichever file inference sampled
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(
            os.path.join(self.work_dir, "_lineage", "*")
        )

    @staticmethod
    def _coerce_lineage_schema(df: DataFrame) -> DataFrame:
        """Back-compat for lineage tables written before duration_sec."""
        if "duration_sec" not in df.columns:
            df = df.withColumn("duration_sec", F.lit(None).cast("double"))
        return df.select(
            "stage", "partition_id", "output_rows", "checkpoint_ts", "status", "duration_sec"
        )

    def metrics(self) -> DataFrame:
        """Per-stage run metrics rolled up from the per-partition lineage:
        (stage, n_partitions, output_rows, duration_sec, rows_per_sec,
        partition_skew) where partition_skew = max partition rows / mean
        partition rows — the number an operator watches to decide whether a
        stage needs salting before the next 100x scale-up. Stage wall time
        covers compute + checkpoint write (what actually gates a resumable
        run)."""
        lin = self.lineage()
        return (
            lin.groupBy("stage")
            .agg(
                F.count(F.lit(1)).alias("n_partitions"),
                F.sum("output_rows").alias("output_rows"),
                F.max("duration_sec").alias("duration_sec"),
                F.max("output_rows").alias("_max_part"),
                F.avg("output_rows").alias("_avg_part"),
            )
            .select(
                "stage",
                "n_partitions",
                "output_rows",
                F.round("duration_sec", 3).alias("duration_sec"),
                F.round(
                    F.col("output_rows") / F.greatest(F.col("duration_sec"), F.lit(1e-9)), 2
                ).alias("rows_per_sec"),
                F.round(
                    F.col("_max_part") / F.greatest(F.col("_avg_part"), F.lit(1e-9)), 3
                ).alias("partition_skew"),
            )
        )


def skew_advice(metrics_df: DataFrame, threshold: float = 4.0) -> list[dict]:
    """Turn the per-stage `partition_skew` metric into an action: stages
    whose max-partition/mean-partition row ratio exceeds `threshold` get a
    flagged row naming the remediation entry point (operators/skew.py
    salted_agg — two-stage salted pre-aggregation — or an explicit
    repartition before the hot stage). Single-partition stages can't be
    skewed by definition and tiny stages aren't worth salting, so both are
    exempt. Returned as plain dicts so the CLI report can embed it."""
    rows = metrics_df.filter(
        (F.col("partition_skew") >= threshold)
        & (F.col("n_partitions") > 1)
        & (F.col("output_rows") >= 1000)
    ).collect()
    return [
        {
            "stage": r["stage"],
            "partition_skew": r["partition_skew"],
            "n_partitions": r["n_partitions"],
            "output_rows": r["output_rows"],
            "advice": (
                "partition skew exceeds "
                f"{threshold}x: pre-aggregate with a salted key "
                "(llm_review_aggregation_spark.operators.skew.salted_agg) or "
                "repartition on a finer key before this stage"
            ),
        }
        for r in rows
    ]


class EphemeralStore:
    """No work_dir: stages run in memory (no resume)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def run_table(self, stage: str, fn, resume: bool = True) -> DataFrame:
        return fn()

    def run_artifact(self, stage: str, fn, resume: bool = True):
        return fn()
