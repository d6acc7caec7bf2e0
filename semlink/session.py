"""SparkSession builder with the engine's scale-hygiene defaults.

Every entry point (tests, bench, spark-submit job, driver contract) goes
through :func:`get_spark` so AQE / Arrow / shuffle sizing are uniform.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "semlink",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    """Build (or reuse) the local SparkSession.

    On a real cluster this builder is bypassed by ``spark-submit`` confs;
    everything set here is safe to override externally.
    """
    if cores is not None:
        master = f"local[{cores}]"
    else:
        master = os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # deterministic timestamps vs the DuckDB oracle
        .config("spark.sql.session.timeZone", "UTC")
        # scale hygiene: AQE coalesces post-shuffle partitions and splits
        # skewed join partitions at runtime (SURVEY §4.2)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transport for the two pandas-UDF kernels (SURVEY §2.7)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # keep the driver lean; we never collect anything big
        .config("spark.driver.memory", os.environ.get("SEMLINK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
