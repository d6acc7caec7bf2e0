"""Operational surfaces: per-stage metrics + per-partition lineage
(SURVEY O1-O2; north rule "per-partition lineage and metrics tables").

MetricsCollector gathers driver-side scalars (wall time per stage, row
counts) cheaply — small aggregations only, never a collect of data
rows. Lineage snapshots record rows-per-partition and source files per
stage so a superstep can be audited after the fact.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import TableIO


class MetricsCollector:
    def __init__(self, spark: SparkSession, run_id: str = "run"):
        self.spark = spark
        self.run_id = run_id
        self._stage_rows: list[tuple] = []   # (run, stage, wall_s)
        self._count_rows: list[tuple] = []   # (run, name, rows)
        self._lineage: list[DataFrame] = []

    @contextmanager
    def stage(self, name: str):
        t0 = time.time()
        yield
        self._stage_rows.append((self.run_id, name, time.time() - t0))

    def rows(self, name: str, df: DataFrame) -> int:
        n = df.count()
        self._count_rows.append((self.run_id, name, n))
        return n

    def lineage_snapshot(self, name: str, df: DataFrame,
                         with_files: bool = False) -> DataFrame:
        """O1: rows per partition (skew visibility) + optional input
        files, as a small DataFrame appended to the lineage table."""
        cols = [F.spark_partition_id().alias("partition_id")]
        if with_files:
            cols.append(F.input_file_name().alias("input_file"))
        snap = (df.select(*cols)
                .groupBy(*[c for c in ["partition_id", "input_file"][:1 + with_files]])
                .agg(F.count("*").alias("rows"))
                .withColumn("step", F.lit(name))
                .withColumn("run_id", F.lit(self.run_id)))
        self._lineage.append(snap)
        return snap

    def skew_report(self, df: DataFrame) -> dict:
        """O2: max/mean partition row counts — the salting feedback loop."""
        parts = (df.select(F.spark_partition_id().alias("p"))
                 .groupBy("p").agg(F.count("*").alias("rows")))
        r = parts.agg(F.max("rows").alias("mx"), F.avg("rows").alias("mean"),
                      F.count("*").alias("parts")).first()
        return {"max_partition_rows": r.mx, "mean_partition_rows": r.mean,
                "partitions": r.parts,
                "skew_ratio": (r.mx / r.mean) if r.mean else 0.0}

    def to_dataframes(self) -> dict[str, DataFrame]:
        out = {
            "metrics_stages": self.spark.createDataFrame(
                self._stage_rows or [(self.run_id, "none", 0.0)],
                "run_id string, stage string, wall_s double"),
            "metrics_counts": self.spark.createDataFrame(
                self._count_rows or [(self.run_id, "none", 0)],
                "run_id string, name string, rows long"),
        }
        if self._lineage:
            lin = self._lineage[0]
            for extra in self._lineage[1:]:
                lin = lin.unionByName(extra, allowMissingColumns=True)
            out["lineage"] = lin
        return out

    def write(self, io: TableIO) -> None:
        for name, df in self.to_dataframes().items():
            io.write(df, name)
