"""Skew-mitigation operators.

AQE's skew-join splitting handles skewed *joins* at runtime, but a grand
aggregation onto a handful of hot keys (e.g. per-topic counts, where one
topic carries most of the stream) still funnels every row of a hot key
through one reducer in the final stage. The classic fix is two-stage
salted aggregation: pre-aggregate on (key, salt) so the hot key's rows
combine across `n_salts` reducers, then sum the partials per key. The
second shuffle moves only `keys x n_salts` rows — negligible.

Results are identical to the direct aggregation (the oracle checks this);
only the shuffle layout changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(cols: list[Column], n_salts: int) -> Column:
    """Stable per-row salt in [0, n_salts): hash of row attributes, not
    RNG — reruns and retries land rows on the same salt (idempotent
    under task retry, unlike rand())."""
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts))


def salted_counts(
    df: DataFrame,
    key_col: str,
    salt_from: list[str],
    n_salts: int = 32,
) -> DataFrame:
    """COUNT(*) per key via salted two-stage aggregation.

    Stage 1 groups on (key, salt): map-side combine plus n_salts-way
    fan-out of each hot key. Stage 2 sums the at-most n_salts partial
    rows per key.
    """
    salt = deterministic_salt([F.col(c) for c in salt_from], n_salts)
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key_col, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key_col).agg(F.sum("_partial").alias("n"))


def cap_group_size(df: DataFrame, keys: list[str], max_n: int) -> DataFrame:
    """Drop every row belonging to a group (by ``keys``) whose size
    exceeds ``max_n`` — the shared "stop-valve" behind
    ``lsh_candidate_pairs(max_bucket=)`` and
    ``benchmark_decontam(max_bench_doc_freq=)``.

    Semantics pinned here so the call sites cannot drift:

    - group size counts ROWS (``count(1)``), including null-keyed rows —
      a group is kept or dropped atomically, never truncated to its
      first ``max_n`` rows (truncation would make results order- and
      partitioning-dependent);
    - NULL key values form their own group (Spark window partitioning
      groups nulls together), same as the groupBy the count mirrors;
    - comparison is ``<=``: a group of exactly ``max_n`` survives.

    Plan shape: one hash shuffle on ``keys`` plus a sort-based window
    count — the same shuffle the downstream bucket join / broadcast
    probe needs anyway, so the valve adds no extra exchange in practice.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys)
    return (
        df.withColumn("_group_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_group_n") <= max_n)
        .drop("_group_n")
    )
