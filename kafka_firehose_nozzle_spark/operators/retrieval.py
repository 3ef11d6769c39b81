"""Retrieval post-processing: rank fusion and diversified reranking.

The two operators a RAG / hybrid-search stack runs AFTER its per-modality
retrievers (dense ANN, BM25, ...):

- ``rrf_fuse``: reciprocal-rank fusion of N rankings (Cormack et al.) —
  pure integer arithmetic, so fused scores are engine-exact.
- ``mmr_rerank``: maximal-marginal-relevance diversified top-k (Carbonell
  & Goldstein) over an ANN candidate pool.

Scale framing: both operate on CANDIDATE SETS (the top-k' of upstream
retrievers), which are scalar-scale objects — the distributed work is
producing the pools (ANN scan, posting scan); fusion/reranking then
touches O(pool) rows. mmr_rerank does its greedy selection driver-side
over the collected pool exactly like kmeans collects C centroids: the
pool is bounded by construction (default 20 rows), never corpus-scale.
All similarity/rank math is done in exact integer ppm/points so a SQL
oracle replays every pick bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_firehose_nozzle_spark.operators.similarity import (
    cosine_prenormed,
    l2_norm,
)


def ranked(
    df: DataFrame, score_col: str, id_col: str, limit: int
) -> DataFrame:
    """[id, rank] for the top ``limit`` rows by (score desc, id).

    TakeOrdered prunes to ``limit`` rows FIRST (tree-reduced, no global
    sort); the row_number window then runs on that bounded set, so the
    single-partition window the plan contains is O(limit), never
    corpus-scale."""
    from pyspark.sql import Window

    top = df.orderBy(F.desc(score_col), F.col(id_col)).limit(limit)
    w = Window.orderBy(F.desc(score_col), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        F.col(id_col), "rank"
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "id",
    k: int = 60,
    scale: int = 10**9,
) -> DataFrame:
    """Reciprocal-rank fusion: score(d) = sum over rankings of
    scale // (k + rank_i(d)), as exact integers (the float 1/(k+r) form
    would hash differently across engines; at scale=1e9 the floor-div
    preserves every distinction between ranks below ~30k).

    Each input: [id_col, rank]. Output: [id_col, rrf_score, n_lists],
    one partial-aggregated shuffle over the unioned candidate lists."""
    pts = F.expr(f"cast({scale} as bigint) div ({k} + rank)")
    scored = [r.select(F.col(id_col), pts.alias("pts")) for r in rankings]
    u = scored[0]
    for s in scored[1:]:
        u = u.unionAll(s)
    return u.groupBy(id_col).agg(
        F.sum("pts").alias("rrf_score"),
        F.count(F.lit(1)).alias("n_lists"),
    )


def mmr_rerank(
    df: DataFrame,
    query: DataFrame,
    k: int = 5,
    pool: int = 20,
    lam_pct: int = 70,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance top-k over the ``pool`` most relevant
    candidates: greedily pick argmax of
    ``lam_pct * rel_ppm - (100 - lam_pct) * max_sim_to_selected_ppm``
    (ties: lowest id), where rel/sim are cosine similarities in exact
    integer ppm (floor(sim * 1e6 + 0.5)).

    Distributed stages: (1) relevance scan -> top-``pool`` candidates
    (TakeOrdered), (2) pool x pool pairwise similarities (bounded:
    pool^2 rows). The greedy loop then runs driver-side on the collected
    scalar-scale pool — the same pattern as collecting C k-means
    centroids; no corpus row ever reaches the driver. Output:
    [mmr_rank, vec_id, rel_ppm].
    """
    q = F.broadcast(
        query.withColumn(
            "_qnorm", l2_norm(F.col("query_vec").cast("array<double>"))
        )
    )
    v = F.col(vec_col).cast("array<double>")
    sim = cosine_prenormed(
        v, F.col("query_vec").cast("array<double>"), l2_norm(v), F.col("_qnorm")
    )
    ppm = F.floor(sim * 1000000.0 + F.lit(0.5)).cast("long")
    # localCheckpoint: the pool feeds three consumers (pair sims twice,
    # the rel collect once) — without it the corpus relevance scan
    # re-executes per consumer.
    cand = (
        df.crossJoin(q)
        .filter(F.col(id_col) != F.col("query_id"))
        .select(F.col(id_col), ppm.alias("rel_ppm"), v.alias("_v"))
        .orderBy(F.desc("rel_ppm"), F.col(id_col))
        .limit(pool)
        .localCheckpoint(eager=False)
    )
    cv = cand.select(
        F.col(id_col).alias("id"), F.col("_v").alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    a = cv.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = cv.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    psim = cosine_prenormed(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    pairs = (
        a.join(b, F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.floor(psim * 1000000.0 + F.lit(0.5)).cast("long").alias("sim_ppm"),
        )
        .collect()
    )
    rel = {
        int(r[id_col]): int(r["rel_ppm"])
        for r in cand.select(id_col, "rel_ppm").collect()
    }
    sim_of = {(int(r["id_a"]), int(r["id_b"])): int(r["sim_ppm"]) for r in pairs}
    selected: list[int] = []
    out: list[tuple[int, int, int]] = []
    while len(selected) < k and len(selected) < len(rel):
        best_id, best_score = None, None
        for cid, rppm in rel.items():
            if cid in selected:
                continue
            if selected:
                max_sim = max(sim_of[(cid, s)] for s in selected)
                score = lam_pct * rppm - (100 - lam_pct) * max_sim
            else:
                score = lam_pct * rppm
            if (
                best_score is None
                or score > best_score
                or (score == best_score and cid < best_id)
            ):
                best_id, best_score = cid, score
        selected.append(best_id)
        out.append((len(selected), best_id, rel[best_id]))
    return df.sparkSession.createDataFrame(
        out, f"mmr_rank int, {id_col} bigint, rel_ppm bigint"
    )
