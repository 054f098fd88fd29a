"""SparkSession factory with the engine's required configs.

Centralizes the settings every entry point needs:

- ``spark.sql.legacy.parquet.nanosAsLong=true`` — the driver's
  ``events.ts`` is parquet ``timestamp[ns]``, which Spark 4 otherwise
  rejects (``PARQUET_TYPE_ILLEGAL``); with the flag it reads as bigint
  epoch-ns, exactly our canonical unit.
- AQE on (runtime coalescing + skew-join splitting) — on a real cluster
  this is what rescues skewed interval distributions.
- shuffle partitions sized to the local core count rather than the 200
  default; on a cluster this would be tuned to ~2-3x total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "dataframeintervals_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # explicit (it is the default) because the engine RELIES on it:
        # the binned interval join and the LSH bucket joins produce
        # skewed keys on real data; AQE splits oversized partitions at
        # runtime, which is the engine's skew answer instead of manual
        # salting (SURVEY.md §4.3)
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_session_configs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable configs to an externally provided session.

    The driver passes us its own SparkSession; ``nanosAsLong`` is a
    runtime-settable SQL conf, so we can still flip it here before any
    parquet read.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
