"""SparkSession factory with scale-appropriate defaults.

Local mode is for correctness testing; the config here is chosen so the
same code runs unchanged on a 1000-executor cluster: AQE on (runtime
re-planning, skew-join splitting, partition coalescing), UTC session time
zone (oracle comparability), Arrow enabled for the pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kafka_firehose_nozzle_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``shuffle_partitions`` defaults to $SPARK_GRAFT_CPUS or CPU count —
    right for local mode; on a real cluster leave AQE's coalescing to pick
    the effective number at runtime.
    """
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)
        )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        # local mode = driver does everything; the 1g default heap OOMs
        # under 32 threads. 32g ~= 600 MB execution memory per task at
        # 32 threads — still conservative next to a real executor's
        # 1-2 GB/core (the r7 sf10 audit OOM'd two dense-graph
        # aggregations at 16g = ~300 MB/task, a ceiling no production
        # cluster has). Applied at JVM launch (no-op on reuse).
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # the driver's testdata parquet uses TIMESTAMP(NANOS); read as
        # int64 nanos (the engine's native time representation, §1.3) and
        # derive TimestampType where queries need it
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
