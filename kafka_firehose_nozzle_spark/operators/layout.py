"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

At 100 TB a single sort key only prunes scans on ONE predicate column;
queries filtering on a second dimension read everything.  Interleaving
the bits of two (or more) rank-normalized columns gives a space-filling
curve: sorting the corpus by the interleaved key co-locates rows that
are close in EVERY dimension, so parquet row-group min/max stats stay
narrow per dimension and data skipping works for filters on any of the
interleaved columns (the Z-ORDER layout Delta/Iceberg expose, built
here from first principles as pure integer expressions).

Deployment shape: ``df.repartitionByRange(zkey).sortWithinPartitions
(zkey).write.parquet(...)`` — one range shuffle at write time buys
multi-dimensional skipping on every subsequent read.  Everything below
is BIGINT shifts/masks inside whole-stage codegen: no UDF, no shuffle,
and bit-for-bit replayable by an ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def minmax_scale(c: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Scale a value with known [lo, hi] bounds to [0, 2^bits) — integer
    arithmetic only: (v - lo) * (2^bits - 1) DIV max(hi - lo, 1).  The
    bounds come from a separate aggregate (or table stats); passing them
    as columns keeps the scaling a pure projection."""
    span = F.greatest(hi - lo, F.lit(1)).cast("bigint")
    return ((c - lo).cast("bigint") * F.lit((1 << bits) - 1)) / span


def _floor_div(num: Column, den: Column) -> Column:
    # inputs are non-negative here, so CAST-truncation == floor in both
    # engines; spelled once so the oracle fragment mirrors it exactly
    return (num / den).cast("bigint")


def zorder_key2(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative BIGINTs:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.
    Expanded as a flat OR-chain of shift/mask terms — constant-folded,
    codegen'd, zero shuffle."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_key2_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB twin of zorder_key2 (same shift/mask OR-chain)."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({a} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({b} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def scaled_zorder2(
    a: Column,
    a_lo: Column,
    a_hi: Column,
    b: Column,
    b_lo: Column,
    b_hi: Column,
    bits: int = 16,
) -> Column:
    """minmax-scale both dimensions then interleave.  The scale step's
    division truncates (non-negative operands), matching the SQL
    oracle's ``//``."""
    sa = _floor_div(
        (a - a_lo).cast("bigint") * F.lit((1 << bits) - 1),
        F.greatest(a_hi - a_lo, F.lit(1)).cast("bigint"),
    )
    sb = _floor_div(
        (b - b_lo).cast("bigint") * F.lit((1 << bits) - 1),
        F.greatest(b_hi - b_lo, F.lit(1)).cast("bigint"),
    )
    return zorder_key2(sa, sb, bits)


def compact_small_files(
    spark,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
) -> int:
    """Small-file compaction — the housekeeping pass every long-lived
    lake table needs (streaming ingest and per-partition writers leave
    thousands of KB-scale files; at 100 TB the scan's task-scheduling
    and footer-read overhead comes to dominate actual IO).

    Sizing reads ONLY filesystem metadata (total on-disk bytes), never
    data: target file count = ceil(total / target_bytes). The rewrite
    is one job — ``repartition(n)`` (round-robin, even output sizes)
    or, with ``sort_col``, ``repartitionByRange + sortWithinPartitions``
    so compaction simultaneously restores clustering (and with it
    min/max data skipping) instead of destroying it.

    Metadata listing goes through the Hadoop FileSystem API, so the
    helper sizes correctly on ANY supported scheme (file://, hdfs://,
    s3a://...), not just the driver's local disk — a driver-local
    ``os.walk`` would silently report total=0 on a remote store and
    collapse the whole table into one partition.

    Returns the output file count. Correctness (row preservation) and
    the file-count/size invariants are pinned by
    tests/test_operators.py::test_compact_small_files."""
    import math

    def _parquet_bytes_and_count(path_str: str) -> tuple[int, int]:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path_str)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        total, count = 0, 0
        it = fs.listFiles(jpath, True)  # recursive remote iterator
        while it.hasNext():
            st = it.next()
            if st.getPath().getName().endswith(".parquet"):
                total += st.getLen()
                count += 1
        return total, count

    total, _ = _parquet_bytes_and_count(src)
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src)
    if sort_col is not None:
        out = df.repartitionByRange(n_out, F.col(sort_col)).sortWithinPartitions(
            sort_col
        )
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dst)
    return _parquet_bytes_and_count(dst)[1]
