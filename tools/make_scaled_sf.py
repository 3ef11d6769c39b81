"""Build a 10x-scaled copy of an sf directory for scale benching
(VERDICT r1 item 8: validate the scale story beyond sf0.1).

The driver testdata stops at sf0.1, so this synthesizes sf1 by key-shifted
replication — NOT naive row duplication, which would corrupt join
selectivity (duplicated keys fan joins out quadratically). Each replica i
shifts every primary/foreign key family by i * stride (stride = max key + 1)
so per-key group sizes, join fan-outs, and planted-duplicate structure all
stay at their sf0.1 shape while table cardinality grows 10x — the same way
TPC-H scales facts while dimensions (region/nation, doc langs, embedding
labels) stay fixed.

Document text gets a per-replica suffix so near-dup structure (LSH/simhash)
stays per-replica instead of turning every doc into a 10-way exact clone.

Usage: python tools/make_scaled_sf.py [src_sf_dir] [dst_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb


def _ts_expr(con, src: str) -> str:
    t = con.execute(
        f"SELECT typeof(ts) FROM '{src}/events.parquet' LIMIT 1"
    ).fetchone()[0]
    return "ts" if t == "BIGINT" else "epoch_ns(ts)"


def build(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW r AS SELECT i FROM range({factor}) t(i)")

    def stride(table: str, key: str) -> int:
        return (
            con.execute(
                f"SELECT MAX({key}) + 1 FROM '{src}/{table}.parquet'"
            ).fetchone()[0]
        )

    c_s = stride("customer", "c_custkey")
    s_s = stride("supplier", "s_suppkey")
    p_s = stride("part", "p_partkey")
    o_s = stride("orders", "o_orderkey")
    e_s = stride("events", "event_id")
    u_s = stride("events", "user_id")
    d_s = stride("documents", "doc_id")
    v_s = stride("embeddings", "vec_id")

    plans = {
        # dimensions: fixed cardinality at every SF
        "region": "SELECT * FROM '{src}/region.parquet'",
        "nation": "SELECT * FROM '{src}/nation.parquet'",
        "customer": f"""
            SELECT c_custkey + i * {c_s} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM '{{src}}/customer.parquet' CROSS JOIN r""",
        "supplier": f"""
            SELECT s_suppkey + i * {s_s} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM '{{src}}/supplier.parquet' CROSS JOIN r""",
        "part": f"""
            SELECT p_partkey + i * {p_s} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM '{{src}}/part.parquet' CROSS JOIN r""",
        "orders": f"""
            SELECT o_orderkey + i * {o_s} AS o_orderkey,
                   o_custkey + i * {c_s} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{{src}}/orders.parquet' CROSS JOIN r""",
        "lineitem": f"""
            SELECT l_orderkey + i * {o_s} AS l_orderkey,
                   l_partkey + i * {p_s} AS l_partkey,
                   l_suppkey + i * {s_s} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{{src}}/lineitem.parquet' CROSS JOIN r""",
        # ts in the source is INT64 nanos (Spark reads it as bigint under
        # spark.sql.legacy.parquet.nanosAsLong); DuckDB surfaces it as a
        # timestamp, so write it back as epoch-nanos BIGINT to preserve
        # the exact physical type the engine's loaders expect
        # driver testdata stores ts as INT96/INT64 nanos that DuckDB
        # surfaces as TIMESTAMP (needs epoch_ns); a dir this tool itself
        # produced already has BIGINT nanos — pass those through so the
        # tool can scale its own output (sf1 -> sf10)
        "events": f"""
            SELECT event_id + i * {e_s} AS event_id, {_ts_expr(con, src)} AS ts,
                   user_id + i * {u_s} AS user_id, event_type, value, props
            FROM '{{src}}/events.parquet' CROSS JOIN r""",
        "documents": f"""
            SELECT doc_id + i * {d_s} AS doc_id,
                   CASE WHEN i = 0 THEN text ELSE text || ' r' || i END AS text,
                   lang, source, n_chars
            FROM '{{src}}/documents.parquet' CROSS JOIN r""",
        # circular-shift each replica's vectors (preserves all intra-replica
        # dot products and the marginal distribution, decorrelates replicas
        # so no fake cross-replica cos=1.0 duplicates appear) and give each
        # replica fresh cluster labels: blocking-key cardinality grows with
        # corpus size, which is the contract embedding-near-dup blocking
        # assumes at scale (bounded block sizes)
        "embeddings": f"""
            SELECT vec_id + i * {v_s} AS vec_id,
                   embedding[(i * 7) % 64 + 1:] || embedding[1:(i * 7) % 64]
                       AS embedding,
                   label + i * 10 AS label
            FROM '{{src}}/embeddings.parquet' CROSS JOIN r""",
    }
    for table, sql in plans.items():
        q = sql.format(src=src)
        con.execute(f"COPY ({q}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    build(src, dst, factor)
