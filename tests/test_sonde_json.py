"""Golden-output serialization tests.

Byte-exact expected JSON for all six event types, from the reference's
TestEnvelopeFormat (kafka_test.go:557-603) and TestJsonEncoder_Encode
(encoder_test.go:13-33) — including the 225-byte length pin.
"""

from pyspark.sql import functions as F

from kafka_firehose_nozzle_spark.fixtures import (
    TEST_TS,
    canonical_envelope_df,
)
from kafka_firehose_nozzle_spark.functions.sonde_json import sonde_json

GOLDEN = {
    "fake-origin-1": (
        '{"origin":"fake-origin-1","eventType":5,"timestamp":%d,'
        '"logMessage":{"message":"aGVsbG8=","message_type":1,'
        '"timestamp":1461318380946558204,'
        '"app_id":"3356a5c7-e86c-442a-b14f-ce5cc4f80ed1",'
        '"source_type":"DEA"}}' % TEST_TS
    ),
    "fake-origin-6": (
        '{"origin":"fake-origin-6","eventType":4,"timestamp":%d,'
        '"httpStartStop":{"applicationId":{"low":3045678995047011891,'
        '"high":15064251325855190961}}}' % TEST_TS
    ),
    "fake-origin-2": (
        '{"origin":"fake-origin-2","eventType":6,"timestamp":%d,'
        '"valueMetric":{"name":"df","value":0.99}}' % TEST_TS
    ),
    "fake-origin-7": (
        '{"origin":"fake-origin-7","eventType":7,"timestamp":%d,'
        '"counterEvent":{"name":"test-event"}}' % TEST_TS
    ),
    "fake-origin-3": (
        '{"origin":"fake-origin-3","eventType":9,"timestamp":%d,'
        '"containerMetric":{'
        '"applicationId":"3356a5c7-e86c-442a-b14f-ce5cc4f80ed1",'
        '"instanceIndex":0}}' % TEST_TS
    ),
    "fake-origin-8": (
        '{"origin":"fake-origin-8","eventType":8,"timestamp":%d,'
        '"error":{"message":"test-error"}}' % TEST_TS
    ),
}


def test_golden_envelope_json(spark):
    df = canonical_envelope_df(spark)
    rows = df.select("origin", sonde_json(df).alias("j")).collect()
    by_origin = {r.origin: r.j for r in rows}
    for origin, want in GOLDEN.items():
        assert by_origin[origin] == want, f"{origin}:\n got {by_origin[origin]}\nwant {want}"


def test_golden_log_message_length(spark):
    # encoder_test.go:18,30-32 pins the canonical LogMessage at 225 bytes
    df = canonical_envelope_df(spark)
    row = (
        df.filter(F.col("origin") == "fake-origin-1")
        .select(F.length(sonde_json(df)).alias("n"))
        .collect()[0]
    )
    assert row.n == 225


def test_sonde_json_roundtrip(spark):
    """decode(encode(envelope)) re-encodes to the identical bytes — the
    decoder inverts base64 bytes and unsigned-u64 renderings exactly."""
    from kafka_firehose_nozzle_spark.functions.sonde_json import (
        envelopes_from_json,
    )

    df = canonical_envelope_df(spark)
    encoded = df.select("origin", sonde_json(df).alias("value"))
    decoded = envelopes_from_json(encoded, "value")
    reencoded = decoded.select(
        "origin", sonde_json(decoded).alias("value")
    )
    want = {r.origin: r.value for r in encoded.collect()}
    got = {r.origin: r.value for r in reencoded.collect()}
    assert got == want


def test_sonde_json_malformed_rows_drop(spark):
    from kafka_firehose_nozzle_spark.functions.sonde_json import (
        envelopes_from_json,
    )

    bad = spark.createDataFrame(
        [("{not json",), ('{"origin":"x","eventType":5}',)], ["value"]
    )
    out = envelopes_from_json(bad, "value").filter("eventType IS NOT NULL")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].origin == "x"
