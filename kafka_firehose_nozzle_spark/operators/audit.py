"""Data-quality constraint auditing.

A training-data lake needs the same invariant checks a warehouse load
does — referential integrity, value ranges, key uniqueness, temporal
ordering — but expressed as *counting* queries (a 100 TB ingest never
fails fast on one bad row; it quantifies damage and quarantines).

Each check is a declarative (name, violating-rows DataFrame) pair;
``audit_report`` folds them into one small result of
[check_name, violations, checked] rows. Scale shape: every check is a
single scan + aggregate (or one anti-join for FK checks, where the
parent key side is dimension-scale and broadcastable); the union glues
together 1-row aggregates, so the combined plan reads each fact table
once per check with full predicate pushdown and no wide shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fk_orphans(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Child rows whose FK has no matching parent row (NULLs excluded —
    SQL FK semantics). Anti-join; broadcast the parent key side when it
    is dimension-scale."""
    keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return child.filter(F.col(child_key).isNotNull()).join(
        keys, child_key, "left_anti"
    )


def duplicate_keys(df: DataFrame, key: str) -> DataFrame:
    """Rows beyond the first for each key value: count(*) - count(distinct)
    violations, computed as one hash aggregate."""
    return (
        df.groupBy(key)
        .agg((F.count(F.lit(1)) - F.lit(1)).alias("_extra"))
        .filter(F.col("_extra") > 0)
    )


def check(df: DataFrame, predicate: Column) -> DataFrame:
    """Rows violating ``predicate`` (the invariant, not the violation)."""
    return df.filter(~predicate | predicate.isNull())


def audit_report(
    checks: list[tuple[str, DataFrame, DataFrame]],
) -> DataFrame:
    """[(name, violating_rows, checked_rows)] -> one DataFrame of
    [check_name, violations, checked], ordered by check_name.

    ``duplicate_keys`` results count extras via sum(_extra); everything
    else counts rows. Each branch is an independent 1-row aggregate; the
    union is driver-free and stays one Spark job."""
    parts = []
    for name, bad, base in checks:
        viol = (
            F.coalesce(F.sum("_extra"), F.lit(0))
            if "_extra" in bad.columns
            else F.count(F.lit(1))
        )
        parts.append(
            bad.agg(viol.cast("long").alias("violations")).crossJoin(
                base.agg(F.count(F.lit(1)).alias("checked"))
            ).select(
                F.lit(name).alias("check_name"), "violations", "checked"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("check_name")
