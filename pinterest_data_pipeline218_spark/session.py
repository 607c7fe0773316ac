"""SparkSession factory.

One place to encode the execution-model decisions that matter at scale:

- **AQE on** (`spark.sql.adaptive.*`): runtime coalescing of shuffle
  partitions, skew-join splitting, and dynamic join-strategy switching are the
  mechanism by which a plan written at sf0.001 keeps working at 100 TB.
- **Shuffle partitions sized to cores locally**; on a real cluster this is
  deliberately left to AQE's coalescing from a high initial number.
- **UTC session timezone** so timestamp semantics are engine-independent
  (the DuckDB correctness oracle uses naive/UTC timestamps).
- **Arrow enabled** for the few Pandas-UDF paths (multimodal decode), so
  Python exchange is columnar-batched, never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        return max(1, int(cpus))
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "pinterest_data_pipeline218_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession."""
    par = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{par}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or par))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Parquet TIMESTAMP(NANOS) (the events table) is not a legal Spark
        # type; read as raw int64 nanos and convert at the scan (data.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
