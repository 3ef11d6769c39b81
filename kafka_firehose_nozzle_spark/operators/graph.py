"""Iterative graph algorithms beyond connected components (which lives
with the dedup pipeline in operators/dedup.py): PageRank in exact
integer arithmetic.

Floating-point PageRank is NOT reproducible across engines or even
partitionings — the per-vertex sum of neighbor contributions is a
fold whose order the shuffle decides.  Here every quantity is BIGINT
"rank micro-units" (total mass 10^15) and every division is a floor
division, so the result is a pure function of the graph: bit-identical
run-to-run, across engines, and replayable by an unrolled-CTE SQL
oracle — the same exactness contract the trained-IVF and PQ operators
follow.

Scale shape per iteration (the standard Pregel decomposition):
  1. contrib = ranks JOIN degrees (vertex-count rows, co-keyed — one
     hash join on vertex id),
  2. flow = edges JOIN contrib ON src (the only edge-scale operation;
     shuffle partitions by src, reusable across iterations since the
     edge side's partitioning is loop-invariant),
  3. new rank = groupBy dst SUM — partial-aggregated, ≤ vertex-count
     groups.
The driver never materializes vertex or edge rows; iteration count is
fixed (a hyperparameter, like the k-means loop), so the lineage stays
bounded and there is nothing to checkpoint at small iteration counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOTAL_MASS = 1_000_000_000_000_000  # 10^15 rank micro-units


def pagerank_int(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    edge_storage_level=None,
) -> DataFrame:
    """Integer PageRank over a directed edge list (every vertex must
    have out-degree >= 1 — union reversed edges first if the graph has
    sinks; callers with true dangling nodes add self-loops).

    r0(v) = TOTAL_MASS div N for all v;
    r_{t+1}(v) = (15 * (TOTAL_MASS div N)) div 100
               + (85 * sum_{u->v} (r_t(u) div outdeg(u))) div 100.

    Floor divisions leak a few units of mass per iteration — that is
    the price of exactness, is identical everywhere, and is irrelevant
    to ranking.  Returns [vertex, rank] with rank BIGINT."""
    # materialize the edge list ONCE: it appears in every iteration's
    # flow join, and without truncating lineage the (possibly expensive)
    # edge-derivation subtree would re-execute per iteration.  At
    # cluster scale this is a persist-to-lake of the edge table,
    # pre-partitioned by src so the per-iteration join reuses the
    # layout; localCheckpoint is the local-mode equivalent.
    # ``edge_storage_level`` defaults to DISK_ONLY, NOT the
    # MEMORY_AND_DISK default: the edge table is the one input that can
    # exceed executor memory (sf100's trade graph is ~1.2B edges;
    # deserialized on-heap block building across 32 threads blew a
    # 32 GB heap), and each iteration streams it once, so serialized
    # disk blocks cost one decode pass while keeping memory bounded at
    # ANY graph size — the standard level for iterative jobs whose edge
    # set outgrows aggregate memory.  Callers that can bound the edge
    # volume (session.checkpoint_storage_level over the source tables)
    # pass the gated level and skip the decode pass at small SF.
    from pyspark.storagelevel import StorageLevel

    if edge_storage_level is None:
        edge_storage_level = StorageLevel.DISK_ONLY
    e = edges.select(
        F.col(src_col).cast("bigint").alias("src"),
        F.col(dst_col).cast("bigint").alias("dst"),
    ).localCheckpoint(storageLevel=edge_storage_level)
    verts = (
        e.select(F.col("src").alias("vertex"))
        .union(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).localCheckpoint()
    n = verts.count()  # one scalar to the driver — sizes the base term
    base = TOTAL_MASS // n
    teleport = (100 - damping_pct) * base // 100

    ranks = verts.select("vertex", F.lit(base).cast("bigint").alias("rank"))
    for _ in range(iterations):
        # ranks/deg/verts all trace their lineage back to the same edge
        # scan, so every join below is a self-join to Spark — qualified
        # DataFrame aliases keep the attribute references unambiguous.
        # `div` (not `/` + cast): double division is only floor-exact
        # below 2^53 and these operands reach 10^15 * damping — the SQL
        # integer division both engines define identically is mandatory
        contrib = (
            ranks.alias("R")
            .join(deg.alias("D"), F.col("R.vertex") == F.col("D.src"), "inner")
            .select(
                F.col("D.src").alias("cv"),
                F.expr("R.rank div D.outdeg").alias("contrib"),
            )
        )
        incoming = (
            e.alias("E")
            .join(contrib.alias("C"), F.col("E.src") == F.col("C.cv"), "inner")
            .groupBy(F.col("E.dst").alias("dst"))
            .agg(F.sum(F.col("C.contrib")).alias("inflow"))
        )
        ranks = (
            verts.alias("V")
            .join(
                incoming.alias("I"),
                F.col("V.vertex") == F.col("I.dst"),
                "left",
            )
            .select(
                F.col("V.vertex").alias("vertex"),
                F.expr(
                    f"{teleport}L + (({damping_pct}L * coalesce(I.inflow, 0L)) div 100)"
                ).alias("rank"),
            )
        )
    return ranks


def undirected_edges_min_support(
    pairs: DataFrame,
    group_col: str,
    node_col: str,
    min_support: int = 3,
    keep_support: bool = False,
) -> DataFrame:
    """Co-occurrence edges: nodes sharing >= min_support groups.

    The self-join explodes per-group (C(k,2) pairs for a group with k
    nodes) — the classic quadratic corner.  The guards that keep it
    scale-safe: the join key is the group (so pair work shards by
    group, never a global product), the a < b orientation halves the
    output, and min_support prunes the long tail in the partial-agg
    combine.  Groups with pathological k (a customer buying from every
    supplier) are the skew case — cap or salt upstream; here k is
    bounded by the schema (suppliers per customer)."""
    a = pairs.select(
        F.col(group_col).alias("g"), F.col(node_col).alias("a")
    )
    b = pairs.select(
        F.col(group_col).alias("g"), F.col(node_col).alias("b")
    )
    out = (
        a.join(b, "g")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    # keep_support: co-occurrence weight for similarity/CF consumers
    # (item_item_cosine); plain graph consumers keep the slim 2-col shape
    return out if keep_support else out.select("a", "b")


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count over an undirected edge list (a < b rows).

    Degree-ordered orientation — each edge directed from its lower-
    (degree, id) endpoint — bounds every vertex's out-degree by
    O(sqrt(edges)), which is what keeps the wedge join (the only
    edge x edge operation) from exploding on high-degree hubs; the
    orientation-by-id shortcut would put a hub's full neighborhood on
    one side.  Plan: degrees (one agg), orient (broadcast-join degrees
    twice), wedges = oriented |x| oriented on the middle vertex,
    AGGREGATED to (endpoint-pair, middle-count) in the same stage, then
    one small join against oriented edges sums the counts.  Returns one
    row [n_triangles].

    Aggregate-before-close, deliberately: a triangle (u,y,z) is one
    wedge endpoint-pair (u,z) with >= 1 middle, so
    n_triangles = sum over oriented edges (u,z) of wedge_count(u,z).
    The wedge STREAM (sum of C(out_deg, 2), 1.7 B rows on the sf1
    complete-graph fixture) is consumed by a partial hash aggregation
    inside the join stage and never shuffled; only the distinct
    endpoint-pair table (bounded by the pair space, 5 M rows there)
    crosses the wire.  The earlier semi-join shape shuffled the full
    wedge stream to close it — 50 GB of spill at sf1, and the DuckDB
    oracle died the same way (hash-building the wedge side)."""
    deg = (
        edges.select(F.col("a").alias("v"))
        .union(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        edges.alias("E")
        .join(deg.alias("DA"), F.col("E.a") == F.col("DA.v"))
        .join(deg.alias("DB"), F.col("E.b") == F.col("DB.v"))
        .select(
            F.when(
                (F.col("DA.d") < F.col("DB.d"))
                | ((F.col("DA.d") == F.col("DB.d")) & (F.col("E.a") < F.col("E.b"))),
                F.struct(F.col("E.a").alias("u"), F.col("E.b").alias("w")),
            )
            .otherwise(
                F.struct(F.col("E.b").alias("u"), F.col("E.a").alias("w"))
            )
            .alias("o")
        )
        .select(F.col("o.u").alias("u"), F.col("o.w").alias("w"))
        .localCheckpoint()
    )
    wedge_counts = (
        e.alias("E1")
        .join(e.alias("E2"), F.col("E1.w") == F.col("E2.u"))
        .groupBy(
            F.col("E1.u").alias("x"),
            F.col("E2.w").alias("z"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    closed = wedge_counts.join(
        e.alias("E3"),
        (F.col("x") == F.col("E3.u")) & (F.col("z") == F.col("E3.w")),
    )
    return closed.agg(
        F.coalesce(F.sum("c"), F.lit(0).cast("long")).alias("n_triangles")
    )


def hits_int(
    edges: DataFrame,
    iterations: int = 2,
    hub_col: str = "src",
    auth_col: str = "dst",
) -> tuple[DataFrame, DataFrame]:
    """HITS hubs/authorities in exact integer arithmetic — the
    bipartite companion to pagerank_int (same contract: bit-identical
    across engines/partitionings, unrolled-CTE replayable).

    Float HITS normalizes by an L2 norm each iteration — a cross-
    partition float fold, unreproducible.  Here scores live in ppm of
    the iteration max: raw(a) = SUM over incident hubs of hs (exact
    DECIMAL(38,0) — bounded by 1e6 * max degree, inside DECIMAL(38)
    past 1e12-degree hubs), then score = raw * 1e6 div max(raw).
    Max-normalization preserves HITS's ranking fixed point (any
    positive rescale does) while keeping every value an integer.

    Scale shape per half-iteration: one vertex-cardinality hash join
    (scores onto edges), one partial-combined SUM to the other side's
    vertex cardinality, one 1-row max broadcast back.  Iteration count
    fixed and small, lineage bounded — the pagerank_int shape."""
    dec = "DECIMAL(38,0)"
    e = edges.select(
        F.col(hub_col).alias("h"), F.col(auth_col).alias("a")
    ).distinct()
    hubs = (
        e.select("h")
        .distinct()
        .select("h", F.lit(1000000).cast("long").alias("hs"))
    )
    auths = None
    for _ in range(iterations):
        araw = (
            e.join(hubs, "h")
            .groupBy("a")
            .agg(F.expr(f"SUM(CAST(hs AS {dec}))").alias("raw"))
        )
        amax = araw.agg(F.max("raw").alias("mx"))
        auths = araw.crossJoin(F.broadcast(amax)).select(
            "a",
            F.expr("CAST(raw * 1000000 div mx AS BIGINT)").alias("sc"),
        )
        hraw = (
            e.join(auths, "a")
            .groupBy("h")
            .agg(F.expr(f"SUM(CAST(sc AS {dec}))").alias("raw"))
        )
        hmax = hraw.agg(F.max("raw").alias("mx"))
        hubs = hraw.crossJoin(F.broadcast(hmax)).select(
            "h",
            F.expr("CAST(raw * 1000000 div mx AS BIGINT)").alias("hs"),
        )
    return hubs, auths
