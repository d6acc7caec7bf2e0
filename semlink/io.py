"""Table IO abstraction (SURVEY S1/S4/S5, §7.3 item 5).

The design target is Iceberg tables (`BASELINE.json` north rule); the
sandbox has no iceberg-spark-runtime jar, so ``fmt="parquet"`` is the
tested path and ``fmt="iceberg"`` is a config flip. On a real cluster:

    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.1_2.13:<ver> \
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.lake.type=hadoop \
      --conf spark.sql.catalog.lake.warehouse=<path> job.py

and pass ``TableIO(fmt="iceberg", root="lake.db")``.

Checkpoint writes (clustering supersteps) ALWAYS write-then-read-back a
materialized table — a hard lineage cut, required for iterative CC
(SURVEY §4.2) and for resume-from-checkpoint (north rule).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class TableIO:
    fmt: str = "parquet"     # "parquet" | "iceberg"
    root: str = ""           # dir for parquet, catalog.namespace for iceberg

    def _loc(self, name: str) -> str:
        if self.fmt == "iceberg":
            return f"{self.root}.{name}"
        return os.path.join(self.root, f"{name}.parquet")

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        if self.fmt == "iceberg":
            return spark.read.format("iceberg").load(self._loc(name))
        return spark.read.parquet(self._loc(name))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        if self.fmt == "iceberg":
            w.format("iceberg").saveAsTable(self._loc(name))
        else:
            w.parquet(self._loc(name))

    def exists(self, spark: SparkSession, name: str) -> bool:
        if self.fmt == "iceberg":
            return spark.catalog.tableExists(self._loc(name))
        loc = self._loc(name)
        return os.path.exists(os.path.join(loc, "_SUCCESS"))

    def checkpoint(self, df: DataFrame, name: str) -> DataFrame:
        """Materialize + read back: hard lineage truncation.

        Parquet's ``_SUCCESS`` marker (resp. Iceberg's atomic snapshot
        commit) is the atomicity gate: a killed write leaves no marker,
        so resume logic treats the step as absent (SURVEY C5).
        """
        spark = df.sparkSession
        self.write(df, name)
        return self.read(spark, name)


def read_transcripts(spark: SparkSession, path_or_table: str,
                     fmt: str = "parquet") -> DataFrame:
    """Load the north-rule input table
    (conv_id, turn_idx, role, text, tool, ts) — BASELINE.json input_hint."""
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path_or_table)
    return spark.read.parquet(path_or_table)
