"""Shared on-disk store access for the incremental foreachBatch
handlers (incremental_lsh, incremental_spans).

``read_store`` goes through the Spark reader, NOT driver-local
``os.path`` checks: a store on HDFS/S3 (the 100 TB deployment shape)
is invisible to the driver's local filesystem, and an os.path-guarded
read would silently return an empty history — admitting every
duplicate with no error raised. An absent path is detected by catching
the reader's error instead, which works on every Hadoop-compatible
filesystem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException


def read_store(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """The store's rows, or an empty frame with the same schema when the
    path does not exist yet (first batch ever).

    ONLY path-not-found maps to empty: any other analysis failure
    (misconfigured datasource, unreadable location) re-raises — treating
    it as an empty history would silently admit every duplicate, the
    exact failure mode this module exists to eliminate."""
    try:
        df = spark.read.schema(schema).parquet(path)
        df.schema  # force path resolution now, inside the try
        return df
    except AnalysisException as e:
        klass = getattr(e, "getErrorClass", lambda: None)() or ""
        if "PATH_NOT_FOUND" in klass or "PATH_NOT_FOUND" in str(e):
            return spark.createDataFrame([], schema)
        raise
