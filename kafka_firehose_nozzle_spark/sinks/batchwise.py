"""foreachBatch sink: idempotent per-micro-batch writes.

Structured Streaming replays a micro-batch after failure with the SAME
batch id; a sink that partitions its output by batch id and overwrites
that partition is therefore effectively-once — replays rewrite the same
directory instead of duplicating rows. This is the standard pattern for
sinks without transactional support (plain parquet lakes), and the
engine-side upgrade of the reference's lossy retry buffer
(kafka.go:230-275): instead of dropping on sustained failure, the batch
replays until the write lands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_stream_parquet_idempotent(
    routed: DataFrame,
    path: str,
    checkpoint: str,
):
    """Append-only parquet lake with exactly-once-per-batch semantics via
    dynamic partition overwrite on the batch id."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", _lit_long(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(path)
        )

    return (
        routed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def _lit_long(v: int):
    from pyspark.sql import functions as F

    return F.lit(v).cast("long")
