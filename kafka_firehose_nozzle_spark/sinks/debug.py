"""Debug sinks (K6; reference LogProducer, producer.go:30-78) and the
memory sink used by tests."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_stream_console(routed: DataFrame, checkpoint: str):
    """-debug mode: JSON rows to the console instead of Kafka
    (cli.go:224-227)."""
    return (
        routed.writeStream.format("console")
        .option("truncate", "false")
        .option("checkpointLocation", checkpoint)
        .start()
    )


def write_stream_memory(routed: DataFrame, name: str, checkpoint: str):
    """Test sink: in-memory table queryable as ``SELECT * FROM <name>``."""
    return (
        routed.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint)
        .start()
    )
