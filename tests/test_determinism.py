"""Partitioning-invariance guards: a result must be a pure function of
the DATA, not of how Spark happened to split it.

Every "exact decimal sum", "integer micro-unit", and "fixed fold order"
claim in the operator docstrings reduces to this observable: rerun the
query with a different shuffle-partition count and a repartitioned
input, and every emitted cell must be IDENTICAL (not merely close).
This is the property that makes results stable across cluster sizes —
the 32-core local run and the 1000-executor run must agree bit-for-bit,
or oracle checks and incremental reruns are meaningless.

Representatives cover each determinism mechanism once:
decimal-sum emission (q1), ppm integer outputs (dup_window_stats),
driver-side iterative training (pca), rounded-double emission
(embedding_dup_pairs), libm-bearing scores (bm25), windowed ranking
(dedup_keep_best).
"""

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.01"

REPRESENTATIVES = [
    "q1_pricing_summary",
    "dup_window_stats",
    "pca_top_component",
    "embedding_dup_pairs",
    "bm25_scores",
    "dedup_keep_best",
    # wave 4g/4h mechanisms: micro-unit span fractions, sketch register
    # combine + libm-bearing linear counting, distinct-entity blocking,
    # trimmed ranking cut, sparse DECIMAL cosine with top-k tie-break
    "substring_dup_spans",
    "daily_distinct_estimates",
    "part_name_matches",
    "trimmed_event_stats",
    "user_activity_similarity",
    # xor-combine signature must be partitioning-invariant by design
    "corpus_manifest",
    # wave-5 mechanisms: DECIMAL-quantized ln sums over a broadcast
    # ratio table (DSIR), rank-window integer medians (robust MAD),
    # smoothed-ln drift terms (PSI), exact integer ppm rank
    # normalization with ties
    "dsir_log_weights",
    "robust_outlier_events",
    "psi_value_drift",
    "quality_percentile_by_source",
]


def _cells(df) -> list[tuple]:
    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        # repr round-trips doubles exactly; NaN-safe via str
        pdf[c] = pdf[c].map(repr)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return [tuple(r) for r in pdf.itertuples(index=False)]


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_result_is_partitioning_invariant(spark, name):
    baseline = _cells(entry.queries()[name](spark, SF))
    assert baseline, name
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = _cells(entry.queries()[name](spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert baseline == again, (
        f"{name}: result depends on partitioning — "
        f"first diff: {next((a, b) for a, b in zip(baseline, again) if a != b)}"
    )
