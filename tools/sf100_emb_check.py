"""Answer-verify embedding_dup_pairs at sf100 via the gemm scale path.

The registry's expr impl (oracle-replayable JVM fold cosine) joins both
256-dim vectors onto ~320M sign-LSH candidate slots at sf100 — a
~400 GB shuffle intermediate that is ordinary aggregate volume on a
cluster but exceeds this box's free disk (twice reproduced disk-full,
journaled as a documented SKIP in SWEEP_sf100_r9.jsonl). The full
registry DuckDB oracle hits the same wall from the other side (its
candidate-join pipeline spilled past 49 GB free). The gemm impl is the
engine's documented single-node/scale path (vectors cross the shuffle
ONCE per band; operators/dedup.py::_lsh_pairs_gemm), and this tool
verifies its sf100 answers with the same two-axis-independence pattern
as the sf10 DSU components oracle (tools/sf10_oracle_check.py):

- the BUCKETS come from DuckDB SQL — the registry oracle's own bucket
  CTE text (sign bits against the first 2k corpus vectors), exported
  to parquet (4M rows, disk-trivial);
- the PAIR GENERATION + COSINE SCORING are dense numpy — per-bucket
  pair expansion, chunked gather + einsum dot products, float64
  half-up rounding identical to det_round.

Comparison against Spark's parquet output:
- matched pairs must agree within 2e-6 (documented last-ulp gemm/fold
  difference at the 1e-6 rounding = two quanta);
- a ONE-SIDED pair is tolerated only if its numpy cosine is within
  2e-6 of the 0.2 threshold (a boundary pair that one summation order
  rounds across the cut); anything else fails.

Run AFTER the main sweep (never concurrently — shared disk).

Usage: python tools/sf100_emb_check.py [SF_DIR]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from tools.compare_oracle import oracle_connection

from kafka_firehose_nozzle_spark.session import get_spark

THRESHOLD = 0.2
TOL = 2e-6
PAIR_CHUNK = 2_000_000  # pairs per scoring chunk (~8 GB gather temps)

# the registry oracle's own bucket derivation (ORACLE_EMB_DUPS text,
# truncated before the pairwise cand join)
BUCKET_SQL = """
WITH e AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
params AS (SELECT GREATEST(4, CAST(CEIL(LOG2(COUNT(*) / 100.0)) AS INT))
               AS k FROM e),
pl AS (SELECT p.vec_id // params.k AS band, p.vec_id % params.k AS j, p.v
       FROM e p, params WHERE p.vec_id < 2 * params.k),
b AS (SELECT e.vec_id, pl.band,
             SUM(CASE WHEN list_sum(list_transform(range(len(e.v)),
                          i -> e.v[i + 1] * pl.v[i + 1])) >= 0
                 THEN CAST(POWER(2, pl.j) AS BIGINT) ELSE 0 END) AS bucket
      FROM e CROSS JOIN pl GROUP BY 1, 2)
SELECT vec_id, band, bucket FROM b
"""


def bucket_pairs(vec_id: np.ndarray, band: np.ndarray, bucket: np.ndarray):
    """Distinct (id_a < id_b) intra-bucket pairs over both bands —
    vectorized per-group expansion, then np.unique dedup across bands."""
    key = (band.astype(np.uint64) << np.uint64(48)) | bucket.astype(np.uint64)
    order = np.lexsort((vec_id, key))
    key, vid = key[order], vec_id[order]
    # group boundaries
    starts = np.nonzero(np.r_[True, key[1:] != key[:-1]])[0]
    sizes = np.diff(np.r_[starts, len(key)])
    out = []
    # expand groups in size classes to keep it vectorized
    for s in np.unique(sizes):
        if s < 2:
            continue
        g = starts[sizes == s]  # group start offsets, shape (m,)
        idx = g[:, None] + np.arange(s)[None, :]  # (m, s) member rows
        iu, ju = np.triu_indices(s, k=1)
        a = vid[idx[:, iu]].ravel()
        b = vid[idx[:, ju]].ravel()
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        out.append((lo.astype(np.uint64) << np.uint64(32)) | hi.astype(np.uint64))
    allp = np.unique(np.concatenate(out))
    return (allp >> np.uint64(32)).astype(np.int64), (
        allp & np.uint64(0xFFFFFFFF)
    ).astype(np.int64)


def score(E: np.ndarray, nrm: np.ndarray, ia: np.ndarray, ib: np.ndarray):
    """det_round(cos, 6) per pair, chunked."""
    out = np.empty(len(ia), dtype=np.float64)
    for lo in range(0, len(ia), PAIR_CHUNK):
        hi = lo + PAIR_CHUNK
        va, vb = E[ia[lo:hi]], E[ib[lo:hi]]
        c = np.einsum("ij,ij->i", va, vb) / (nrm[ia[lo:hi]] * nrm[ib[lo:hi]])
        out[lo:hi] = np.floor(c * 1e6 + 0.5) / 1e6
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
    tmpdir = tempfile.mkdtemp(prefix="emb_check_")
    spark_pq = f"{tmpdir}/spark_pairs.parquet"
    bucket_pq = f"{tmpdir}/buckets.parquet"

    # 1. Spark gemm path -> parquet (never collected)
    spark = get_spark(
        "sf100-emb-check",
        extra_conf={
            "spark.sql.ansi.enabled": "true",
            "spark.sql.shuffle.partitions": "256",
        },
    )
    t0 = time.time()

    from kafka_firehose_nozzle_spark.operators import dedup as D

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    D.embedding_lsh_dup_pairs(
        emb, threshold=THRESHOLD, n=n, impl="gemm"
    ).write.mode("overwrite").parquet(spark_pq)
    t_spark = time.time() - t0
    print(f"spark gemm pairs -> parquet in {t_spark:.1f}s", flush=True)

    # 2. DuckDB bucket axis (registry oracle's own CTE text)
    t1 = time.time()
    con = oracle_connection(sf_dir)
    con.execute("SET memory_limit='40GB'")
    con.execute(f"SET temp_directory='{tmpdir}/spill'")
    con.execute("SET preserve_insertion_order=false")
    con.execute(f"COPY ({BUCKET_SQL}) TO '{bucket_pq}' (FORMAT PARQUET)")
    con.close()
    t_buckets = time.time() - t1
    print(f"duckdb buckets -> parquet in {t_buckets:.1f}s", flush=True)

    # 3. numpy pair expansion + scoring
    t2 = time.time()
    import pyarrow.parquet as pq

    bt = pq.read_table(bucket_pq)
    ia, ib = bucket_pairs(
        bt["vec_id"].to_numpy().astype(np.int64),
        bt["band"].to_numpy().astype(np.int64),
        bt["bucket"].to_numpy().astype(np.int64),
    )
    et = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_by("vec_id")
    col = et["embedding"].combine_chunks()
    # zero-copy path: the list values buffer reshaped (dim constant) —
    # to_pylist() on 512M floats would cost minutes and tens of GB
    flat = np.asarray(col.values, dtype=np.float64)
    dim = len(flat) // len(col)
    E = flat.reshape(len(col), dim)
    nrm = np.sqrt(np.einsum("ij,ij->i", E, E))
    cos = score(E, nrm, ia, ib)
    keep = cos >= THRESHOLD
    want_key = (ia[keep].astype(np.uint64) << np.uint64(32)) | ib[keep].astype(
        np.uint64
    )
    want_cos = cos[keep]
    t_numpy = time.time() - t2
    print(
        f"numpy scored {len(ia)} candidates -> {keep.sum()} pairs "
        f"in {t_numpy:.1f}s",
        flush=True,
    )

    # 4. compare with Spark's parquet output
    sp = pq.read_table(spark_pq)
    s_ia = sp["id_a"].to_numpy().astype(np.uint64)
    s_ib = sp["id_b"].to_numpy().astype(np.uint64)
    s_cos = sp["cos_sim"].to_numpy().astype(np.float64)
    got_key = (s_ia << np.uint64(32)) | s_ib
    o1 = np.argsort(got_key)
    got_key, s_cos = got_key[o1], s_cos[o1]
    o2 = np.argsort(want_key)
    want_key, want_cos = want_key[o2], want_cos[o2]

    common, gi, wi = np.intersect1d(
        got_key, want_key, assume_unique=True, return_indices=True
    )
    max_dev = float(np.abs(s_cos[gi] - want_cos[wi]).max()) if len(common) else 0.0
    only_spark = np.setdiff1d(got_key, want_key, assume_unique=True)
    only_numpy = np.setdiff1d(want_key, got_key, assume_unique=True)

    def boundary_ok(keys: np.ndarray) -> bool:
        if not len(keys):
            return True
        ka = (keys >> np.uint64(32)).astype(np.int64)
        kb = (keys & np.uint64(0xFFFFFFFF)).astype(np.int64)
        c = score(E, nrm, ka, kb)
        return bool(np.all(np.abs(c - THRESHOLD) <= TOL))

    ok = (
        max_dev <= TOL
        and boundary_ok(only_spark)
        and boundary_ok(only_numpy)
    )
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_vectors": n,
                "candidates": len(ia),
                "spark_pairs": int(len(got_key)),
                "numpy_pairs": int(len(want_key)),
                "pairs_only_spark": int(len(only_spark)),
                "pairs_only_numpy": int(len(only_numpy)),
                "max_cos_dev_on_common": max_dev,
                "tol": TOL,
                "spark_sec": round(t_spark, 1),
                "bucket_sec": round(t_buckets, 1),
                "numpy_sec": round(t_numpy, 1),
                "verdict": "PASS" if ok else "FAIL",
            }
        ),
        flush=True,
    )
    shutil.rmtree(tmpdir, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
