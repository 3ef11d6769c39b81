"""Exact order statistics at scale: k-th smallest without a global sort.

A 100 TB exact median cannot ``ORDER BY x LIMIT 1 OFFSET n/2`` — the
sort serializes the corpus through one task (Spark warns exactly that
for unpartitioned windows).  ``exact_kth`` finds the EXACT k-th value
with iterative histogram narrowing instead: each round partitions the
current candidate set into ``n_buckets`` ranges, aggregates one bounded
(<= n_buckets rows) count histogram, and descends into the bucket
containing the target rank.  Every round is ONE full predicate-pushed
scan (the histogram is also the remaining-count, so no separate
count() pass) — no shuffle ever carries data rows — and the interval
shrinks ~n_buckets x per round, so doubles converge in <= ~7 rounds
(1024^7 > the full double exponent range); the loop exits early when
the candidates fit one bounded TakeOrdered.

Candidate narrowing filters on the SAME clamped bucket expression the
histogram counted with — never on recomputed float bounds, which can
disagree with ``floor((x - lo) / width)`` by one ulp at bucket edges
and silently shift the result a rank (found by brute-force boundary
search in review; the shared-expression form is immune by
construction).

The driver sees only histogram rows and scalar bounds — never data.
This is the selection analog of the curriculum/histogram-quantile
staging used elsewhere in the repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _kth_smallest(cand: DataFrame, rank: int) -> float:
    # bounded TakeOrdered finish: limit(rank) caps the driver merge
    got = cand.orderBy("x").limit(rank).orderBy(F.desc("x")).head()
    return float(got["x"])


def _kth_by_value_histogram(cand: DataFrame, rank: int) -> float:
    """Rank walk over an exact-VALUE count histogram — the finish for
    zero-width intervals, where the caller has proven the distinct
    values remaining are bounded (~n_buckets) even though the ROW count
    may not be (a single value duplicated billions of times).  The
    driver sees one (value, count) row per distinct value, never data
    rows, regardless of duplication."""
    rows = sorted(
        cand.groupBy("x").agg(F.count(F.lit(1)).alias("c")).collect(),
        key=lambda r: r["x"],
    )
    running = 0
    for r in rows:
        running += r["c"]
        if running >= rank:
            return float(r["x"])
    # unreachable: rank <= remaining row count by construction
    return float(rows[-1]["x"])


def exact_median(
    df: DataFrame,
    col: str,
    n_buckets: int = 1024,
    tail_rows: int = 100_000,
    max_rounds: int = 20,
) -> tuple[int, int, float]:
    """Exact lower median: returns ``(n, k, value)`` with
    k = (n + 1) // 2.  The rank derives from the SAME initial aggregate
    the narrowing uses, so no separate count() scan precedes the
    selection (a caller computing n itself would pay one extra full
    pass just to choose k)."""
    return exact_kth(
        df,
        col,
        lambda n: (n + 1) // 2,
        n_buckets=n_buckets,
        tail_rows=tail_rows,
        max_rounds=max_rounds,
        _report=True,
    )


def exact_kth(
    df: DataFrame,
    col: str,
    k,
    n_buckets: int = 1024,
    tail_rows: int = 100_000,
    max_rounds: int = 20,
    _report: bool = False,
):
    """Return the exact k-th smallest value (1-based) of ``df[col]``
    over its non-null FINITE values.

    ``k`` may be an int rank or a callable ``n -> rank`` (evaluated
    against the finite-value count from the initial aggregate — how
    exact_median avoids a separate counting pass).  With ``_report``
    the return is ``(n, k, value)`` instead of the bare value.

    NULLs are excluded (rank over non-null values, matching SQL
    ``ORDER BY x LIMIT 1 OFFSET k-1`` on a NOT NULL filter); NaN or
    +/-Infinity raise — a NaN would poison the max() bound and return
    NaN for EVERY rank, and an Infinity makes the bucket width
    meaningless, so the operator refuses rather than silently
    answering wrong (the finiteness count rides the same initial
    aggregate, costing no extra scan).  When the remaining candidates
    number <= ``tail_rows`` the selection finishes with one bounded
    sort-limit — the same documented bounded-tail idiom as
    dup_components' union-find finish.
    """
    vals = df.select(F.col(col).cast("double").alias("x")).filter(
        F.col("x").isNotNull()
    )
    nonfinite = F.isnan(F.col("x")) | (F.abs(F.col("x")) == float("inf"))
    row = vals.agg(
        F.min(F.when(~nonfinite, F.col("x"))).alias("lo"),
        F.max(F.when(~nonfinite, F.col("x"))).alias("hi"),
        F.count(F.when(~nonfinite, F.lit(1))).alias("n"),
        F.count_if(nonfinite).alias("bad"),
    ).head()
    lo, hi, n, bad = row["lo"], row["hi"], row["n"], row["bad"]
    if bad:
        raise ValueError(
            f"exact_kth: column {col!r} contains {bad} NaN/Infinity "
            "value(s) — rank over them is ill-defined; filter first"
        )
    if n == 0:
        raise ValueError("exact_kth on an empty column")
    if callable(k):
        k = int(k(n))
    if not 1 <= k <= n:
        raise ValueError(f"k={k} out of range 1..{n}")

    def done(value: float):
        return (n, k, value) if _report else value

    cand, remaining, rank = vals, n, k
    for _ in range(max_rounds):
        if remaining <= tail_rows:
            return done(_kth_smallest(cand, rank))
        width = (hi - lo) / n_buckets
        if width <= 0.0:
            # interval exhausted: either hi == lo (every candidate
            # equals the bound) or denormal-range underflow, where
            # hi - lo spans at most ~n_buckets representable doubles.
            # Either way the DISTINCT values remaining are bounded by
            # ~n_buckets, so an exact-value histogram is itself the
            # bounded finish — unlike a TakeOrdered(rank), whose
            # driver merge grows with the duplicate count of a single
            # value (round-5 ADVICE: a value duplicated beyond
            # tail_rows broke the documented histograms-only bound).
            return done(_kth_by_value_histogram(cand, rank))
        # clamped bucket expression — BOTH the histogram and the next
        # round's candidate filter use this exact expression, so edge
        # rounding can never count a value in one set and filter it
        # from the other
        bkt = F.greatest(
            F.lit(0),
            F.least(
                F.lit(n_buckets - 1),
                F.floor((F.col("x") - F.lit(lo)) / F.lit(width)).cast(
                    "int"
                ),
            ),
        )
        hist = {
            r["b"]: r["c"]
            for r in cand.groupBy(bkt.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        running, chosen = 0, n_buckets - 1
        for b in range(n_buckets):
            c = hist.get(b, 0)
            if running + c >= rank:
                chosen = b
                rank -= running
                remaining = c
                break
            running += c
        cand = cand.filter(bkt == F.lit(chosen))
        new_lo = max(lo, lo + chosen * width)
        new_hi = min(hi, lo + (chosen + 1) * width)
        if new_lo == lo and new_hi == hi:  # no float progress
            return done(_kth_smallest(cand, rank))
        lo, hi = new_lo, new_hi
    # interval stopped shrinking within max_rounds: bounded finish over
    # whatever candidates remain (geometric shrink makes this
    # unreachable for finite doubles; kept as a safety net)
    return done(_kth_smallest(cand, rank))
