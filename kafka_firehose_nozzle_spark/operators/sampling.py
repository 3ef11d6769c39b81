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


def dsir_log_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    salt: str = "#dsir",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per raw document, the
    hashed-unigram log importance weight

        log w(d) = sum_tok [ ln p_target(b(tok)) - ln p_raw(b(tok)) ]

    where b() hashes tokens into ``n_buckets`` features and both
    distributions are Laplace-smoothed ((c+1) / (N+B)).  High-weight
    documents 'look like' the target corpus; resampling raw data by
    these weights is the standard recipe for tilting a 100 TB crawl
    toward a quality target without training a classifier.

    Scale shape: two token-cardinality partial aggregations build the
    two B-row bucket tables (B is a constant — 1024 rows — regardless
    of corpus size), the per-token log-ratio joins via BROADCAST, and
    one per-doc partial agg emits the weight.  No shuffle ever carries
    more than token-cardinality rows, and the only sort anywhere is
    Spark's partial-agg hashing.  Cross-engine determinism: each ln()
    term quantizes to DECIMAL(20,6) BEFORE the per-doc sum (the repo's
    libm-ulps idiom), totals are exact int64 scalars.

    Returns (id_col, n_toks, log_weight) for every raw document.
    """
    from kafka_firehose_nozzle_spark.functions import detmath as DET
    from kafka_firehose_nozzle_spark.operators import text as TX

    def bucket(tok: Column) -> Column:
        return F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(tok, F.lit(salt))), 1, 15),
                16,
                10,
            ).cast("long"),
            F.lit(n_buckets),
        )

    def toks_of(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode(
                TX.tokens(TX.normalize_text(F.col(text_col)))
            ).alias("tok"),
        ).withColumn("b", bucket(F.col("tok")))

    raw_toks = toks_of(docs)
    tgt_toks = toks_of(target)
    # aggregate each side ONCE to its <=B-row bucket table and collect
    # it (a bounded collect, like the LSH planes and IVF centroids) —
    # totals derive from the collected counts rather than separate
    # count() actions, which would each re-tokenize the whole corpus
    # (two redundant 100 TB passes).  Raw side is scanned twice total
    # (bucket agg + final per-doc join), target once; no cached frames
    # are left behind.
    spark = docs.sparkSession
    raw_counts = {
        r["b"]: r["cr"]
        for r in raw_toks.groupBy("b")
        .agg(F.count(F.lit(1)).alias("cr"))
        .collect()
    }
    tgt_counts = {
        r["b"]: r["ct"]
        for r in tgt_toks.groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
        .collect()
    }
    n_raw = sum(raw_counts.values())
    n_tgt = sum(tgt_counts.values())
    buckets = sorted(set(raw_counts) | set(tgt_counts))
    pairs = spark.createDataFrame(
        [(b, raw_counts.get(b, 0), tgt_counts.get(b, 0)) for b in buckets],
        "b long, cr long, ct long",
    )
    # B-row broadcast table of per-bucket log ratios; ln stays
    # IN-ENGINE (the cross-engine libm argument the oracle relies on)
    ratios = pairs.select(
        "b",
        (
            F.log(
                (F.col("ct") + F.lit(1)).cast("double")
                / F.lit(float(n_tgt + n_buckets))
            )
            - F.log(
                (F.col("cr") + F.lit(1)).cast("double")
                / F.lit(float(n_raw + n_buckets))
            )
        )
        .cast("decimal(20,6)")
        .alias("term"),
    )
    return (
        raw_toks.join(F.broadcast(ratios), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            DET.det_round(F.sum("term").cast("double"), 4).alias(
                "log_weight"
            ),
        )
    )


def span_corruption_plan(
    docs: DataFrame,
    span_len: int = 3,
    stride: int = 5,
    keep_mod: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """T5-style span-corruption masking PLAN (Raffel et al. 2020 §3.1.4,
    public paper): for each document, deterministically choose the token
    spans a denoising objective would mask — span starts sit on a
    ``stride``-token grid and are kept when an md5 hash of
    (doc_id, position) lands in ``1/keep_mod`` of hash space, each
    masking ``span_len`` tokens (clamped at the document tail).  With
    ``stride > span_len`` spans can never overlap, so the plan needs no
    sequential conflict resolution — what makes it a pure column
    expression on BOTH engines.  Expected mask rate is
    span_len / (stride * keep_mod) = 15% at the defaults, the T5 ratio.

    Deterministic-by-hash rather than seeded-RNG for the same reason as
    every sampler in this module: the identical spans are chosen on any
    engine at any parallelism, which the DuckDB oracle checks directly.

    Emits (doc_id, n_tokens, n_spans, n_masked, mask_ppm) — exact
    integers.

    Scale shape: zero shuffles and zero joins — the grid, the hash
    gate, and the mask accounting are array HOFs fused into the scan
    stage; work is linear in document length.  The downstream consumer
    joins this plan back to the token stream by (doc_id, pos range) —
    an equi-join prefix, never a scan of text.
    """
    from kafka_firehose_nozzle_spark.operators.text import (
        normalize_text,
        tokens,
    )

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(normalize_text(F.col(text_col))).alias("toks"),
    ).select(
        "doc_id", F.size("toks").alias("n_tokens")
    ).filter(
        F.col("n_tokens") >= 1
    )
    grid = F.sequence(
        F.lit(0), F.col("n_tokens") - 1, F.lit(stride)
    )
    gate = lambda p: (  # noqa: E731 - hash gate shared by the filter
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        p.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % keep_mod
        == 0
    )
    sel = F.filter(grid, gate)
    n_masked = F.aggregate(
        sel,
        F.lit(0).cast("bigint"),
        lambda acc, p: acc
        + F.least(F.lit(span_len), F.col("n_tokens") - p).cast("bigint"),
    )
    return base.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.size(sel).cast("bigint").alias("n_spans"),
        n_masked.alias("n_masked"),
    ).withColumn("mask_ppm", F.expr("n_masked * 1000000 div n_tokens"))
