"""As-of join: for each left row, the most recent right row at-or-before
its timestamp, per key.

Spark has no native as-of join (guide: bucketize or merge_asof per
group). This implements the ``applyInPandas`` strategy: co-group left and
right by key, ``pd.merge_asof`` within each group — one shuffle of each
side on the key, then linear-time merge per group. At 100 TB both sides
hash-partition on the key; skewed keys are handled by AQE or a secondary
time-bucket salt.

The alternative composition (join + window argmax) shuffles the full
join product; merge_asof avoids materializing it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_value_cols: list[str],
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """left columns + the matched right value columns (None if no match).
    ``on``: timestamp column name in both sides; ``by``: equi-key.
    ``direction``: "backward" (most recent right row at-or-before, the
    default), "forward" (earliest at-or-after), or "nearest" — the
    pd.merge_asof directions. Ties on ``on`` resolve deterministically:
    the right side is mergesorted by (on, value_cols...), and merge_asof
    takes the last such row for backward, the first for forward.
    """
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
        rsorted = rdf.sort_values([on, *right_value_cols], kind="mergesort")
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
