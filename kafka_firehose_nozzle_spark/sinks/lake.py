"""Partitioned lake writes with DYNAMIC partition overwrite.

The reference's only sink is Kafka (kafka.go); a lake-backed analytics
engine additionally needs the idempotent-batch-write primitive: rewrite
exactly the date/key partitions present in this batch and leave every
other partition untouched.  Static ``mode("overwrite")`` on a
partitioned table deletes the WHOLE table first — the classic
incremental-job footgun that turns a one-day backfill into a full-table
wipe.  Spark's ``spark.sql.sources.partitionOverwriteMode=dynamic``
scopes the overwrite to partitions the written frame actually contains;
this module pins that semantics behind one function and restores the
session setting afterward (it is session-global, and leaving it flipped
changes OTHER jobs' overwrite behavior).

At 100 TB: the write is one shuffle-free pass (each task appends to the
partitions of its rows); re-running a failed day is naturally
idempotent because the day's partitions are replaced wholesale, which
is exactly the at-least-once + idempotent-rewrite delivery contract the
batchwise Kafka sink documents (sinks/batchwise.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
) -> None:
    """Write ``df`` under ``path`` partitioned by ``partition_cols``,
    replacing ONLY the partitions present in ``df``.

    Deterministically idempotent: writing the same frame twice leaves
    the same files' contents; writing a corrected frame for one
    partition replaces just that partition directory.
    """
    # per-WRITER option, not the session conf: flipping the session
    # global and restoring it in a finally races concurrent writers on
    # a shared session — thread B's restore can land between thread A's
    # set and A's write, demoting A to STATIC mode, which deletes every
    # partition under `path` not present in A's frame (the full-table
    # wipe the module docstring warns about). The DataFrameWriter-level
    # option scopes the mode to this one write.
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
