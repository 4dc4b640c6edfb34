"""SparkSession factory with scale-appropriate defaults.

Design notes (100 TB target, tested on local[N]):
- AQE on: runtime partition coalescing, skew-join splitting, dynamic
  broadcast decisions survive a 100x scale-up without re-tuning.
- `spark.sql.shuffle.partitions` defaults to the local core count; on a
  real cluster AQE's coalescing makes the initial number mostly a ceiling.
- Session timezone pinned to UTC so results are comparable with external
  engines (DuckDB oracle) and stable across deploy regions.
- Arrow enabled for any pandas interchange (vectorized UDF paths).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_cores() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 4


def get_spark(
    app_name: str = "data-ingestion-lambda-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster pass ``None`` via spark-submit and the cluster manager wins.
    """
    cores = _local_cores()
    if master is None:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = cores

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        # local mode = driver-only JVM; give it real headroom (the host has
        # 128 GiB) or long sessions degrade into GC thrash.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        # Long sessions compile thousands of whole-stage-codegen classes;
        # the JVM's default 240 MiB code cache fills, the JIT shuts off, and
        # every later query runs interpreted (observed 20-30x slowdowns
        # after ~40 queries in one session). 2 GiB + flushing keeps the JIT
        # alive for the life of the session.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=2048m -XX:+UseCodeCacheFlushing",
        )
        # Files: pack small files, split big ones; 128 MiB is the sweet spot
        # for parquet row-group granularity at scale.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Parquet TIMESTAMP(NANOS) (events.ts) is unreadable natively; read
        # as epoch-nanos long, converted to µs timestamp in the catalog.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
