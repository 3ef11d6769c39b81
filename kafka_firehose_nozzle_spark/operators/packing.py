"""Sequential context-window packing: global running sums without a
single-task window.

An unpartitioned ``Window.orderBy(...)`` is the textbook trap for global
cumulative sums — Spark plans it as ONE task holding the whole corpus
(it even warns "No Partition Defined for Window operation"). The
scale-correct shape is the classic two-pass prefix sum:

1. range-partition by the order key and sort within partitions;
2. aggregate one subtotal per partition (driver-scale: one row per
   partition) and turn them into per-partition prefix OFFSETS;
3. broadcast-join the offsets back and run the cumulative window
   PARTITIONED by the range-partition id — every partition works
   independently.

Range boundaries come from sampling and are not deterministic, but the
global prefix sum is boundary-independent, so results are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_running_sum(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """df + ``out_col`` = sum of ``weight_col`` over all rows with
    ``order_col`` <= this row's (inclusive), computed with the two-pass
    prefix-sum pattern above. ``order_col`` values must be unique.

    ``checkpoint=False`` skips pinning the staged partitioning (used by
    the plan-shape test to see the full lineage; production keeps the
    checkpoint so the subtotal pass and the window pass share one
    materialization AND one partition layout — spark_partition_id must
    observe identical partitioning in both reads)."""
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    staged = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    if checkpoint:
        staged = staged.localCheckpoint(eager=False)
    subtotals = (
        staged.groupBy("_pid")
        .agg(F.sum(F.col(weight_col)).alias("_sub"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_sub").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    # subtotals has one row per partition — driver/broadcast scale by
    # construction, so its own global window is a non-issue
    within = Window.partitionBy("_pid").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        staged.join(F.broadcast(subtotals), "_pid")
        .withColumn(
            out_col, F.col("_offset") + F.sum(F.col(weight_col)).over(within)
        )
        .drop("_pid", "_offset")
    )


def pack_assignments(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    pack_size: int,
    pack_col: str = "pack_id",
) -> DataFrame:
    """Assign each row the pack its FIRST unit lands in when rows are
    concatenated in ``order_col`` order and cut every ``pack_size``
    units — LLM-training sample packing. Adds ``pack_col``."""
    cum = with_global_running_sum(df, order_col, weight_col, "_cum")
    return cum.withColumn(
        pack_col,
        ((F.col("_cum") - F.col(weight_col)) / F.lit(pack_size)).cast(
            "bigint"
        ),
    ).drop("_cum")


def with_global_running_max(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "running_max",
    num_partitions: int | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """df + ``out_col`` = max of ``value_col`` over all rows with
    ``order_col`` <= this row's (inclusive) — the prefix-MAX twin of
    :func:`with_global_running_sum` (same two-pass shape; max is
    associative, so per-partition maxima prefix-combine exactly like
    subtotals).  The watermark-lateness profile is the motivating
    consumer: "max event time seen so far" in arrival order, without a
    single-task window.  ``order_col`` values must be unique."""
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    staged = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    if checkpoint:
        staged = staged.localCheckpoint(eager=False)
    submax = (
        staged.groupBy("_pid")
        .agg(F.max(F.col(value_col)).alias("_sub"))
        .withColumn(
            "_prev_max",
            F.max("_sub").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .select("_pid", "_prev_max")
    )
    within = Window.partitionBy("_pid").orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        staged.join(F.broadcast(submax), "_pid")
        .withColumn(
            out_col,
            # greatest() ignores NULLs, so a NULL _prev_max (first
            # partition) falls through to the within-partition max
            F.greatest(
                F.col("_prev_max"),
                F.max(F.col(value_col)).over(within),
            ),
        )
        .drop("_pid", "_prev_max")
    )
