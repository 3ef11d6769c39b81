"""Answer-verify embedding_dup_pairs at sf100 via the gemm scale path.

The registry's expr impl (oracle-replayable JVM fold cosine) joins both
256-dim vectors onto ~200M sign-LSH candidate pairs at sf100 — a
~400 GB shuffle intermediate that is ordinary aggregate volume on a
cluster but exceeds this box's free disk (twice reproduced disk-full,
journaled as a documented SKIP in SWEEP_sf100_r9.jsonl). The gemm impl
is the engine's documented single-node/scale path for exactly this
shape: vectors cross the shuffle ONCE per band into (band, bucket)
groups and each group's pairwise cosines come from one NumPy gram
product (operators/dedup.py::_lsh_pairs_gemm).

This tool runs the gemm path at sf100 and compares it against the SAME
registry DuckDB oracle the strict sweep would use (ORACLE_EMB_DUPS).
The pair set at sf100 is tens of millions of rows — far past
spark.driver.maxResultSize — so nothing is collected: Spark writes its
pairs to parquet and DuckDB performs the comparison as a full outer
join, reporting

- pair SET equality (id_a, id_b) — exact, both directions;
- cos_sim agreement within 2e-6 per matched pair (gemm pairwise
  summation is documented to differ from the oracle's left fold only
  in the last ulp of the 1e-6 rounding, so a half-ulp boundary pair
  may round one step apart; the tolerance is two quanta).

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

import __spark_entry__ as entrymod
from tools.compare_oracle import oracle_connection

from kafka_firehose_nozzle_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
    tmpdir = tempfile.mkdtemp(prefix="emb_check_")
    spark_pq = f"{tmpdir}/spark_pairs.parquet"
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
        emb, threshold=0.2, n=n, impl="gemm"
    ).write.mode("overwrite").parquet(spark_pq)
    t_spark = time.time() - t0
    print(f"spark gemm pairs -> parquet in {t_spark:.1f}s", flush=True)

    t1 = time.time()
    con = oracle_connection(sf_dir)
    con.execute("SET memory_limit='48GB'")
    con.execute(f"SET temp_directory='{tmpdir}/spill'")
    con.execute("SET preserve_insertion_order=false")
    con.execute(
        "CREATE TEMP TABLE oracle_pairs AS "
        + entrymod.oracle_sql()["embedding_dup_pairs"]
    )
    con.execute(
        f"""CREATE TEMP TABLE cmp AS
            SELECT coalesce(s.id_a, o.id_a) AS id_a,
                   coalesce(s.id_b, o.id_b) AS id_b,
                   s.cos_sim AS cs, o.cos_sim AS co
            FROM read_parquet('{spark_pq}/*.parquet') s
            FULL OUTER JOIN oracle_pairs o
              ON s.id_a = o.id_a AND s.id_b = o.id_b"""
    )
    stats = con.execute(
        """SELECT count(*) AS total,
                  count(*) FILTER (co IS NULL) AS only_spark,
                  count(*) FILTER (cs IS NULL) AS only_oracle,
                  max(abs(cs - co)) FILTER (cs IS NOT NULL AND co IS NOT NULL)
                      AS max_dev
           FROM cmp"""
    ).fetchone()
    n_spark, n_oracle = con.execute(
        f"""SELECT (SELECT count(*) FROM read_parquet('{spark_pq}/*.parquet')),
                   (SELECT count(*) FROM oracle_pairs)"""
    ).fetchone()
    con.close()
    t_oracle = time.time() - t1
    total, only_spark, only_oracle, max_dev = stats
    max_dev = float(max_dev or 0.0)
    ok = only_spark == 0 and only_oracle == 0 and max_dev <= 2e-6
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_vectors": n,
                "spark_pairs": int(n_spark),
                "oracle_pairs": int(n_oracle),
                "pairs_only_spark": int(only_spark),
                "pairs_only_oracle": int(only_oracle),
                "max_cos_dev": max_dev,
                "tol": 2e-6,
                "spark_sec": round(t_spark, 1),
                "oracle_sec": round(t_oracle, 1),
                "verdict": "PASS" if ok else "FAIL",
            }
        ),
        flush=True,
    )
    shutil.rmtree(tmpdir, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
