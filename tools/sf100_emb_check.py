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
registry DuckDB oracle the strict sweep would use (ORACLE_EMB_DUPS):

- pair SET equality (id_a, id_b) — exact, both directions;
- cos_sim agreement within 2e-6 per pair (gemm pairwise summation is
  documented to differ from the oracle's left fold only in the last
  ulp of the 1e-6 rounding, so a half-ulp boundary pair may round one
  step apart; the tolerance is two quanta).

Run AFTER the main sweep (never concurrently — shared disk).

Usage: python tools/sf100_emb_check.py [SF_DIR]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from tools.compare_oracle import oracle_connection

from kafka_firehose_nozzle_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
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
    spark_pdf = (
        D.embedding_lsh_dup_pairs(emb, threshold=0.2, n=n, impl="gemm")
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    t_spark = time.time() - t0
    print(f"spark gemm pairs: {len(spark_pdf)} rows in {t_spark:.1f}s", flush=True)

    t1 = time.time()
    con = oracle_connection(sf_dir)
    con.execute("SET memory_limit='48GB'")
    import tempfile

    spill = tempfile.mkdtemp(prefix="duckdb_spill_")
    con.execute(f"SET temp_directory='{spill}'")
    oracle_pdf = (
        con.execute(entrymod.oracle_sql()["embedding_dup_pairs"])
        .df()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    t_oracle = time.time() - t1
    print(f"duckdb oracle pairs: {len(oracle_pdf)} rows in {t_oracle:.1f}s", flush=True)

    import pandas as pd

    merged = spark_pdf.merge(
        oracle_pdf, on=["id_a", "id_b"], how="outer",
        suffixes=("_spark", "_oracle"), indicator=True,
    )
    only_spark = int((merged["_merge"] == "left_only").sum())
    only_oracle = int((merged["_merge"] == "right_only").sum())
    both = merged[merged["_merge"] == "both"]
    # threshold-edge pairs (one engine's rounding lands a hair under
    # 0.2) would show up as one-sided rows; report their sims if any
    max_dev = float(
        (both["cos_sim_spark"] - both["cos_sim_oracle"]).abs().max()
    ) if len(both) else 0.0
    ok = only_spark == 0 and only_oracle == 0 and max_dev <= 2e-6
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_vectors": n,
                "spark_pairs": len(spark_pdf),
                "oracle_pairs": len(oracle_pdf),
                "pairs_only_spark": only_spark,
                "pairs_only_oracle": only_oracle,
                "max_cos_dev": max_dev,
                "tol": 2e-6,
                "spark_sec": round(t_spark, 1),
                "oracle_sec": round(t_oracle, 1),
                "verdict": "PASS" if ok else "FAIL",
            }
        ),
        flush=True,
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
