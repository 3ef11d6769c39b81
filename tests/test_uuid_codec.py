"""UUID codec: golden vectors (kafka_test.go:542-555) + property round-trip."""

import uuid as pyuuid

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_firehose_nozzle_spark.functions.uuid_codec import (
    str_to_uuid_struct,
    uuid_to_str,
)

UUID_ROW = T.StructType(
    [
        T.StructField(
            "u",
            T.StructType(
                [
                    T.StructField("low", T.LongType()),
                    T.StructField("high", T.LongType()),
                ]
            ),
        )
    ]
)


def _signed(v: int) -> int:
    return v - 2**64 if v >= 2**63 else v


def spark_uuid_to_str(spark, low: int, high: int) -> str:
    df = spark.createDataFrame([{"u": {"low": _signed(low), "high": _signed(high)}}], UUID_ROW)
    return df.select(uuid_to_str(F.col("u")).alias("s")).collect()[0].s


def test_golden_vector(spark):
    # kafka_test.go:542-555
    assert (
        spark_uuid_to_str(spark, 0x7243CC580BC17AF4, 0x79D4C3B2020E67A5)
        == "f47ac10b-58cc-4372-a567-0e02b2c3d479"
    )


def test_test_app_id_vector(spark):
    # kafka_test.go:560-563: testAppId mapped through str2uuid
    assert (
        spark_uuid_to_str(spark, 3045678995047011891, 15064251325855190961)
        == "3356a5c7-e86c-442a-b14f-ce5cc4f80ed1"
    )


def test_str_to_uuid_struct(spark):
    df = spark.createDataFrame([("f47ac10b-58cc-4372-a567-0e02b2c3d479",)], ["s"])
    row = df.select(str_to_uuid_struct(F.col("s")).alias("u")).collect()[0].u
    assert row.low == _signed(0x7243CC580BC17AF4)
    assert row.high == _signed(0x79D4C3B2020E67A5)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**64 - 1), st.integers(0, 2**64 - 1))
def test_roundtrip_matches_reference_semantics(spark, low, high):
    """uuid_to_str equals the reference's little-endian hex rendering."""
    buf = low.to_bytes(8, "little") + high.to_bytes(8, "little")
    want = "%s-%s-%s-%s-%s" % (
        buf[0:4].hex(), buf[4:6].hex(), buf[6:8].hex(), buf[8:10].hex(), buf[10:16].hex(),
    )
    got = spark_uuid_to_str(spark, low, high)
    assert got == want
    # and str_to_uuid round-trips back
    df = spark.createDataFrame([(got,)], ["s"])
    back = df.select(str_to_uuid_struct(F.col("s")).alias("u")).collect()[0].u
    assert back.low == _signed(low) and back.high == _signed(high)
