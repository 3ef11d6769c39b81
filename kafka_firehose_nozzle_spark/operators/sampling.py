"""Deterministic sampling operators for training-data pipelines.

Random sampling is non-reproducible across engines and cluster layouts;
these operators rank rows by a content hash instead, so the same rows are
chosen on any engine at any parallelism — a property the DuckDB oracle
checks directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_rank(id_col: Column) -> Column:
    """Stable pseudo-random rank: md5 of the id rendered as text. Identical
    in any engine with md5 (hex compare == deterministic total order)."""
    return F.md5(id_col.cast("string"))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Top-k rows per stratum by hash rank — deterministic stratified
    sampling. One shuffle on the stratum key; the window never sees more
    than a stratum per partition, and skewed strata are bounded by k
    output rows each."""
    w = Window.partitionBy(strata_col).orderBy(
        hash_rank(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list[Column],
    cap: int,
) -> DataFrame:
    """Frequency capping: keep at most ``cap`` rows per group, best
    first by ``order_cols`` — the corpus-curation guard against a few
    giant domains dominating a training mix.  One shuffle on the group
    key; because the filter is rank <= cap, a skewed group contributes
    at most cap output rows no matter how hot the key is (the window
    itself streams per key — sort cost, not memory, scales with the
    hot key).  Deterministic whenever order_cols end in a unique
    tiebreak."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )


def hash_fraction_sample(df: DataFrame, id_col: str, percent: int) -> DataFrame:
    """Deterministic ~percent% sample: keep rows whose md5(id) falls below
    the percent threshold in hex order. No shuffle at all — a pure filter
    that pushes into the scan's batch evaluation."""
    bucket = F.conv(F.substring(hash_rank(F.col(id_col)), 1, 4), 16, 10).cast("long")
    return df.filter(bucket * 100 < 65536 * percent)
