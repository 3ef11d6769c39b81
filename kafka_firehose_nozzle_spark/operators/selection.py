"""Exact order statistics at scale: k-th smallest without a global sort.

A 100 TB exact median cannot ``ORDER BY x LIMIT 1 OFFSET n/2`` — the
sort serializes the corpus through one task (Spark warns exactly that
for unpartitioned windows).  ``exact_kth`` finds the EXACT k-th value
with iterative histogram narrowing instead: each round partitions the
current value interval into ``n_buckets`` equal ranges, aggregates one
bounded (<= n_buckets rows) count histogram, and descends into the
bucket containing the target rank.  Every round is a full predicate-
pushed scan + a tiny aggregation — no shuffle ever carries data rows —
and the interval shrinks by ~n_buckets x per round, so doubles
converge in <= ~10 rounds (64-bit range / 1024-way split); the loop
also exits early when the candidate set fits one bounded sort.

The driver sees only histogram rows and scalar bounds — never data.
This is the selection analog of the curriculum/histogram-quantile
staging used elsewhere in the repo (value-histogram factoring instead
of global ranks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_kth(
    df: DataFrame,
    col: str,
    k: int,
    n_buckets: int = 1024,
    tail_rows: int = 100_000,
    max_rounds: int = 20,
) -> float:
    """Return the exact k-th smallest value (1-based) of ``df[col]``.

    NULLs are excluded (rank over non-null values, matching SQL
    ``ORDER BY x LIMIT 1 OFFSET k-1`` on a NOT NULL filter).  When the
    remaining candidates number <= ``tail_rows`` the selection
    finishes with one bounded sort-limit — the same documented
    bounded-tail idiom as dup_components' union-find finish.
    """
    vals = df.select(F.col(col).cast("double").alias("x")).filter(
        F.col("x").isNotNull()
    )
    row = vals.agg(
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).head()
    lo, hi, n = row["lo"], row["hi"], row["n"]
    if n == 0:
        raise ValueError("exact_kth on an empty column")
    if not 1 <= k <= n:
        raise ValueError(f"k={k} out of range 1..{n}")
    # rank of the target within the current [lo, hi] candidate interval
    rank = k
    for _ in range(max_rounds):
        if lo == hi:
            return float(lo)
        cand = vals.filter((F.col("x") >= lo) & (F.col("x") <= hi))
        remaining = cand.count()
        if remaining <= tail_rows:
            got = (
                cand.orderBy("x").limit(rank).orderBy(F.desc("x")).head()
            )
            return float(got["x"])
        width = (hi - lo) / n_buckets
        if width <= 0.0:  # denormal-range underflow: bounded finish
            got = cand.orderBy("x").limit(rank).orderBy(F.desc("x")).head()
            return float(got["x"])
        bkt = F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col("x") - F.lit(lo)) / F.lit(width)).cast("int"),
        )
        hist = {
            r["b"]: r["c"]
            for r in cand.groupBy(bkt.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        running = 0
        for b in range(n_buckets):
            c = hist.get(b, 0)
            if running + c >= rank:
                rank -= running
                new_lo = lo + b * width
                new_hi = lo + (b + 1) * width if b < n_buckets - 1 else hi
                # guard float no-progress on pathological ranges
                if new_lo == lo and new_hi == hi:
                    got = (
                        cand.orderBy("x")
                        .limit(rank)
                        .orderBy(F.desc("x"))
                        .head()
                    )
                    return float(got["x"])
                lo, hi = new_lo, new_hi
                break
            running += c
    # interval stopped shrinking within max_rounds: bounded-sort finish
    got = (
        vals.filter((F.col("x") >= lo) & (F.col("x") <= hi))
        .orderBy("x")
        .limit(rank)
        .orderBy(F.desc("x"))
        .head()
    )
    return float(got["x"])
