"""UUID {low, high} <-> canonical string, as native Spark expressions.

The reference stores a 128-bit id as two *little-endian* uint64s and renders
``%x-%x-%x-%x-%x`` over the 16-byte LE concatenation (uuid2str, reference
kafka.go:214-219; inverse str2uuid in helper_test.go:17-24). Golden vector
(kafka_test.go:542-555):

    {low: 0x7243cc580bc17af4, high: 0x79d4c3b2020e67a5}
        <-> "f47ac10b-58cc-4372-a567-0e02b2c3d479"

Implemented as pure JVM codegen, no UDF: an arithmetic byteswap (7
shift/mask/or steps) turns the little-endian u64 into the big-endian value
whose ``hex()`` rendering IS the byte sequence the reference prints — one
``hex`` call per long instead of 16 substring slices, keeping the routing
projection's generated code small enough for JIT.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _byteswap64(col: Column) -> Column:
    """Reverse the byte order of a LongType column (two's-complement safe)."""
    c = col.cast("long")
    return (
        F.shiftleft(c.bitwiseAND(F.lit(0xFF)), 56)
        .bitwiseOR(F.shiftleft(c.bitwiseAND(F.lit(0xFF00)), 40))
        .bitwiseOR(F.shiftleft(c.bitwiseAND(F.lit(0xFF0000)), 24))
        .bitwiseOR(F.shiftleft(c.bitwiseAND(F.lit(0xFF000000)), 8))
        .bitwiseOR(F.shiftrightunsigned(c, 8).bitwiseAND(F.lit(0xFF000000)))
        .bitwiseOR(F.shiftrightunsigned(c, 24).bitwiseAND(F.lit(0xFF0000)))
        .bitwiseOR(F.shiftrightunsigned(c, 40).bitwiseAND(F.lit(0xFF00)))
        .bitwiseOR(F.shiftrightunsigned(c, 56).bitwiseAND(F.lit(0xFF)))
    )


def _le_hex(col: Column) -> Column:
    """16-hex-digit little-endian rendering of a LongType column."""
    return F.lpad(F.lower(F.hex(_byteswap64(col))), 16, "0")


def uuid_to_str(uuid_struct: Column) -> Column:
    """StructType{low,high} -> "8-4-4-4-12" string (kafka.go:214-219).

    Null-safe: null struct (or null low/high) -> null.
    """
    lo = _le_hex(uuid_struct.getField("low"))
    hi = _le_hex(uuid_struct.getField("high"))
    full = F.concat(lo, hi)  # 32 hex chars, little-endian byte order
    return F.concat_ws(
        "-",
        F.substring(full, 1, 8),
        F.substring(full, 9, 4),
        F.substring(full, 13, 4),
        F.substring(full, 17, 4),
        F.substring(full, 21, 12),
    )


def _hex_to_long(hex16: Column) -> Column:
    """16 LE hex chars -> signed long, handling values >= 2^63.

    ``conv(x, 16, 10)`` returns the *unsigned* decimal string; go through
    Decimal(20,0) and wrap negatives to match two's-complement semantics.
    """
    be = F.concat(*[F.substring(hex16, 15 - 2 * i, 2) for i in range(8)])
    unsigned = F.conv(be, 16, 10).cast("decimal(20,0)")
    two63 = F.lit("9223372036854775808").cast("decimal(20,0)")
    two64 = F.lit("18446744073709551616").cast("decimal(21,0)")
    signed = F.when(unsigned >= two63, (unsigned - two64)).otherwise(unsigned)
    return signed.cast("long")


def str_to_uuid_struct(s: Column) -> Column:
    """Inverse of uuid_to_str (reference str2uuid, helper_test.go:17-24)."""
    clean = F.lower(F.regexp_replace(s, "-", ""))
    lo_hex = F.substring(clean, 1, 16)
    hi_hex = F.substring(clean, 17, 16)
    return F.when(
        s.isNotNull(),
        F.struct(
            _hex_to_long(lo_hex).alias("low"),
            _hex_to_long(hi_hex).alias("high"),
        ),
    )
