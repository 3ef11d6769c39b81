"""Answer-verify supplier_pagerank at sf100 via an independent
DuckDB-edges + pure-numpy integer PageRank oracle.

The registry oracle (ORACLE_PAGERANK) replays the 3 iterations as
unrolled MATERIALIZED CTEs; at sf100 the stacked materializations
(1.2B-edge table + per-iteration flow-join spills) exceed this box's
free disk — the sweep journal records two reproducible oracle-side
disk-full deaths at ~19 GB free while the SPARK side completed both
times. Same adjudication as the sf10 components family: when the
registry oracle is single-node-infeasible, verify through an
independent implementation on both axes (tools/sf10_oracle_check.py's
DSU pattern):

- the EDGE DERIVATION comes from DuckDB SQL (orders |x| lineitem
  DISTINCT pair projection, spilled to parquet via COPY) — not Spark;
- the RANK ARITHMETIC is a dense-array numpy replay of the exact
  integer recurrence (rank div outdeg contributions, bincount
  scatter-adds) — not a SQL flow join in either engine.

Exactness: TOTAL_MASS = 1e15, so every contrib, partial inflow, and
rank is an integer < 8.5e16; the bincount weights path is float64 but
each addend and every partial sum stays far below 2^53, so the float
accumulation is exact; per-chunk partials are folded into int64.

Run AFTER the main sweep (never concurrently — shared disk).

Usage: python tools/sf100_pagerank_check.py [SF_DIR]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import __spark_entry__ as entrymod
from tools.compare_oracle import oracle_connection

from kafka_firehose_nozzle_spark.operators.graph import TOTAL_MASS
from kafka_firehose_nozzle_spark.session import get_spark

ITERATIONS = 3
DAMPING_PCT = 85
CHUNK = 50_000_000  # edge rows per scatter-add chunk (~1.2 GB temps)


def numpy_pagerank(cv: np.ndarray, sv: np.ndarray) -> tuple:
    """Exact-integer PageRank over the undirected bipartite pair list
    (each pair is an edge in BOTH directions, like the query's union).
    Returns (ranks int64 dense array, active bool mask)."""
    size = int(max(cv.max(), sv.max())) + 1
    outdeg = np.bincount(cv, minlength=size).astype(np.int64)
    outdeg += np.bincount(sv, minlength=size)
    active = outdeg > 0
    n = int(active.sum())
    base = TOTAL_MASS // n
    teleport = (100 - DAMPING_PCT) * base // 100

    ranks = np.zeros(size, dtype=np.int64)
    ranks[active] = base
    for _ in range(ITERATIONS):
        contrib = np.zeros(size, dtype=np.int64)
        contrib[active] = ranks[active] // outdeg[active]
        inflow = np.zeros(size, dtype=np.int64)
        for lo in range(0, len(cv), CHUNK):
            hi = lo + CHUNK
            # cv -> sv direction and sv -> cv direction; float64 bincount
            # is exact here (every addend/partial < 2^53)
            inflow += np.bincount(
                sv[lo:hi], weights=contrib[cv[lo:hi]], minlength=size
            ).astype(np.int64)
            inflow += np.bincount(
                cv[lo:hi], weights=contrib[sv[lo:hi]], minlength=size
            ).astype(np.int64)
        ranks = np.zeros(size, dtype=np.int64)
        ranks[active] = teleport + (DAMPING_PCT * inflow[active]) // 100
    return ranks, active


def top20(ranks: np.ndarray, active: np.ndarray):
    """(node_type, key, rank) rows ordered by rank desc, vertex asc —
    the query's ORDER BY + LIMIT 20."""
    verts = np.nonzero(active)[0]
    r = ranks[verts]
    order = np.lexsort((verts, -r))[:20]
    out = []
    for i in order:
        v, rk = int(verts[i]), int(r[i])
        out.append(("cust" if v % 2 == 0 else "supp", v // 2, rk))
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
    tmpdir = tempfile.mkdtemp(prefix="pr_check_")
    pairs_pq = f"{tmpdir}/pairs.parquet"

    # 1. independent edge derivation: DuckDB join + DISTINCT, external
    #    (spilled) COPY — the only DuckDB step, sized to fit solo
    t0 = time.time()
    con = oracle_connection(sf_dir)
    con.execute("SET memory_limit='48GB'")
    con.execute(f"SET temp_directory='{tmpdir}/spill'")
    con.execute("SET preserve_insertion_order=false")
    con.execute(
        f"""COPY (SELECT DISTINCT o.o_custkey * 2 AS cv,
                         l.l_suppkey * 2 + 1 AS sv
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
            TO '{pairs_pq}' (FORMAT PARQUET)"""
    )
    con.close()
    t_edges = time.time() - t0
    print(f"duckdb distinct pairs -> parquet in {t_edges:.1f}s", flush=True)

    # 2. numpy exact-integer rank replay
    t1 = time.time()
    import pyarrow.parquet as pq

    tbl = pq.read_table(pairs_pq, columns=["cv", "sv"])
    cv = tbl["cv"].to_numpy().astype(np.int64, copy=False)
    sv = tbl["sv"].to_numpy().astype(np.int64, copy=False)
    n_pairs = len(cv)
    ranks, active = numpy_pagerank(cv, sv)
    want = top20(ranks, active)
    t_numpy = time.time() - t1
    print(f"numpy pagerank over {n_pairs} pairs in {t_numpy:.1f}s", flush=True)

    # 3. Spark side: the registry query itself
    t2 = time.time()
    spark = get_spark(
        "sf100-pagerank-check",
        extra_conf={
            "spark.sql.ansi.enabled": "true",
            "spark.sql.shuffle.partitions": "256",
        },
    )
    got_rows = (
        entrymod.queries()["supplier_pagerank"](spark, sf_dir)
        .collect()
    )
    got = [(r["node_type"], int(r["key"]), int(r["rank"])) for r in got_rows]
    t_spark = time.time() - t2
    print(f"spark supplier_pagerank in {t_spark:.1f}s", flush=True)

    ok = got == want
    if not ok:
        for g, w in zip(got, want):
            if g != w:
                print(f"  MISMATCH spark={g} numpy={w}", flush=True)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_pairs": n_pairs,
                "n_vertices": int(active.sum()),
                "rows_compared": len(want),
                "edges_sec": round(t_edges, 1),
                "numpy_sec": round(t_numpy, 1),
                "spark_sec": round(t_spark, 1),
                "verdict": "PASS" if ok else "FAIL",
            }
        ),
        flush=True,
    )
    shutil.rmtree(tmpdir, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
