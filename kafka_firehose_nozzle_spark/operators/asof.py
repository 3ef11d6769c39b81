"""As-of join: for each left row, the most recent right row at-or-before
its timestamp, per key (plus forward and nearest directions).

Spark has no native as-of join. Two implementations live here:

- :func:`asof_join` — the JVM-NATIVE path (the default): union both
  sides into one frame, one hash shuffle on the key, one sort per
  direction, and ``last(value_struct, ignoreNulls=True)`` over a
  running window picks each left row's match. Everything stays inside
  whole-stage codegen — no Python evaluator anywhere in the plan. At
  100 TB this is one shuffle of (key, on, payload) rows and a
  per-partition sort, the same cost class as a window aggregate.
- :func:`asof_join_pandas` — the original cogrouped
  ``pd.merge_asof``-per-key strategy. Correct and linear per group, but
  it ships BOTH sides through Arrow and pays a Python/pandas call per
  key: at sf10 (1.5 M keys, 25 M rows) the three registry as-of queries
  spent 5-7 MINUTES each here vs seconds on the window path (round-7
  sf10 audit). Kept as the semantic reference — a property test pins
  the two paths equal on random inputs.

Tie rules (pinned by the three oracle queries and pd.merge_asof):
backward takes the LAST right row in ascending (on, values...) order
among rows at-or-before; forward takes the FIRST at-or-after; nearest
prefers the backward candidate on equidistant ties.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _on_numeric(col: Column, dtype: T.DataType) -> Column:
    """Order-preserving integer view of the `on` column, for exact
    distance/tolerance arithmetic (micros for timestamps, days for
    dates, the value itself for numerics — no doubles anywhere)."""
    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(col)
    if isinstance(dtype, T.TimestampNTZType):
        # unix_micros only takes TIMESTAMP; the session tz is pinned to
        # UTC (session.py), so NTZ -> TZ is an order-preserving bijection
        return F.unix_micros(col.cast("timestamp"))
    if isinstance(dtype, T.DateType):
        return F.unix_date(col).cast("long")
    if isinstance(
        dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ) or (isinstance(dtype, T.DecimalType) and dtype.scale == 0):
        return col.cast("long")
    # float/double/scaled-decimal `on` would TRUNCATE here while the
    # pandas reference path (asof_join_pandas) uses exact values — the
    # two property-pinned paths must not be able to disagree silently
    # (ADVICE r7). Callers with fractional keys should scale to a
    # fixed-point integer column first.
    raise TypeError(
        f"asof_join `on` must be timestamp/date/integral, got {dtype};"
        " scale fractional keys to fixed-point integers first"
    )


def _tolerance_units(tolerance: str | int | float, dtype: T.DataType) -> int:
    """`tolerance` in the units of :func:`_on_numeric` for this dtype."""
    if isinstance(tolerance, (int, float)):
        if tolerance != int(tolerance):
            # int() would silently shrink the inclusive bound (ADVICE r7)
            raise ValueError(
                f"numeric tolerance must be integral, got {tolerance!r}"
            )
        return int(tolerance)
    nanos = pd.Timedelta(tolerance).value
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return nanos // 1_000
    if isinstance(dtype, T.DateType):
        return nanos // 86_400_000_000_000
    raise ValueError(
        "string tolerance requires a timestamp/date `on` column"
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_value_cols: list[str],
    tolerance: str | int | float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """left columns + the matched right value columns (None if no match).
    ``on``: timestamp column name in both sides; ``by``: equi-key.
    ``direction``: "backward" (most recent right row at-or-before, the
    default), "forward" (earliest at-or-after), or "nearest". Matches
    beyond ``tolerance`` (inclusive bound) become None.

    Plan shape: the union frame shuffles ONCE on ``by``; each direction
    is one sort + running ``last(..., ignoreNulls)`` window (nearest
    runs both directions over the same exchange). Left rows come back
    out with their match attached — no join node, no Python stage.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction}")
    left_on_dtype = next(
        f.dataType for f in left.schema.fields if f.name == on
    )
    right_on_dtype = next(
        f.dataType for f in right.schema.fields if f.name == on
    )
    left_cols = [f.name for f in left.schema.fields]
    # the matched `on` travels inside the value struct as its EXACT
    # integer view, computed from each side's own dtype at construction
    # time — the two sides may disagree on TIMESTAMP vs TIMESTAMP_NTZ
    # (union coercion normalizes the sort column, but a struct field
    # keeps its type), and distance/tolerance math must not depend on
    # which one won the coercion
    val_struct = T.StructType(
        [T.StructField("_asof_on_num", T.LongType(), True)]
        + [
            T.StructField(f.name, f.dataType, True)
            for f in right.schema.fields
            if f.name in right_value_cols
        ]
    )
    l2 = left.select(
        F.col(by).alias("_asof_by"),
        F.col(on).alias("_asof_ts"),
        _on_numeric(F.col(on), left_on_dtype).alias("_asof_ts_num"),
        F.lit(1).alias("_asof_tag"),
        F.lit(None).cast(val_struct).alias("_asof_val"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_asof_lrow"),
    )
    r2 = right.select(
        F.col(by).alias("_asof_by"),
        F.col(on).alias("_asof_ts"),
        _on_numeric(F.col(on), right_on_dtype).alias("_asof_ts_num"),
        F.lit(0).alias("_asof_tag"),
        F.struct(
            _on_numeric(F.col(on), right_on_dtype).alias("_asof_on_num"),
            *[F.col(c) for c in right_value_cols],
        ).alias("_asof_val"),
        F.lit(None).cast(
            T.StructType([f for f in left.schema.fields])
        ).alias("_asof_lrow"),
    )
    u = l2.unionByName(r2)

    # backward: among rows ordered (on ASC, right-before-left, values
    # ASC), the running last non-null value struct at a left row is the
    # LARGEST (on, values...) tuple at-or-before it — pd.merge_asof's
    # backward tie rule. forward mirrors it in descending order.
    w_back = (
        Window.partitionBy("_asof_by")
        .orderBy(
            F.col("_asof_ts_num").asc(),
            F.col("_asof_tag").asc(),
            F.col("_asof_val").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("_asof_by")
        .orderBy(
            F.col("_asof_ts_num").desc(),
            F.col("_asof_tag").asc(),
            F.col("_asof_val").desc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        u = u.withColumn(
            "_asof_match", F.last("_asof_val", ignorenulls=True).over(w)
        )
    else:
        u = u.withColumn(
            "_asof_b", F.last("_asof_val", ignorenulls=True).over(w_back)
        ).withColumn(
            "_asof_f", F.last("_asof_val", ignorenulls=True).over(w_fwd)
        )

    out = u.filter(F.col("_asof_tag") == 1)
    ts_num = F.col("_asof_ts_num")

    def dist(match: Column) -> Column:
        return F.abs(ts_num - match.getField("_asof_on_num"))

    def within(match: Column) -> Column:
        if tolerance is None:
            return match
        tol = _tolerance_units(tolerance, left_on_dtype)
        return F.when(dist(match) <= F.lit(tol), match)

    if direction in ("backward", "forward"):
        chosen = within(F.col("_asof_match"))
    else:
        b = within(F.col("_asof_b"))
        fw = within(F.col("_asof_f"))
        # prefer backward on equidistant ties (pd.merge_asof nearest)
        chosen = (
            F.when(b.isNull(), fw)
            .when(fw.isNull(), b)
            .when(dist(b) <= dist(fw), b)
            .otherwise(fw)
        )
    return out.select(
        *[F.col("_asof_lrow").getField(c).alias(c) for c in left_cols],
        *[chosen.getField(c).alias(c) for c in right_value_cols],
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_value_cols: list[str],
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """The cogrouped ``pd.merge_asof`` strategy — the semantic reference
    asof_join is property-tested against. One shuffle of each side on
    the key, then a linear-time pandas merge per group; correct at any
    scale but pays a Python call per key (see module docstring for the
    sf10 numbers)."""
    out_fields = list(left.schema.fields)
    right_schema = {f.name: f for f in right.schema.fields}
    for c in right_value_cols:
        f = right_schema[c]
        out_fields.append(T.StructField(f.name, f.dataType, True))
    out_schema = T.StructType(out_fields)

    left_cols = [f.name for f in left.schema.fields]
    tol = pd.Timedelta(tolerance) if tolerance else None

    def merge_groups(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        if ldf.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        lsorted = ldf.sort_values(on, kind="mergesort")
        if rdf.empty:
            out = lsorted.copy()
            for c in right_value_cols:
                out[c] = None
            return out
        # na_position="first" pins the (on)-tie rule when value columns
        # hold NULLs: Spark's struct ordering sorts null fields FIRST,
        # pandas defaults NaN LAST — without the pin the two paths pick
        # different rows on tied timestamps (ADVICE r7)
        rsorted = rdf.sort_values(
            [on, *right_value_cols], kind="mergesort", na_position="first"
        )
        merged = pd.merge_asof(
            lsorted,
            rsorted[[on, *right_value_cols]],
            on=on,
            direction=direction,
            tolerance=tol,
            suffixes=("", "_r"),
        )
        return merged[[*left_cols, *right_value_cols]]

    def cogroup_fn(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        return merge_groups(ldf, rdf)

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(cogroup_fn, schema=out_schema)
    )
