"""Canonical envelope fixtures (FIXTURES.md §1.1; reference helper_test.go).

These are the exact rows the reference's golden tests serialize
(kafka_test.go:557-603). Also provides a deterministic synthetic envelope
stream generator for routing-distribution / throughput tests (FIXTURES.md §6).
"""

from __future__ import annotations

import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_firehose_nozzle_spark import schemas

TEST_APP_ID = "3356a5c7-e86c-442a-b14f-ce5cc4f80ed1"  # helper_test.go:14
TEST_TS = 1461318380946558204  # encoder_test.go:14

# uuid(TEST_APP_ID) as little-endian u64 pair (kafka_test.go:560-563),
# carried as signed longs: high 15064251325855190961 wraps negative.
TEST_APP_ID_LOW = 3045678995047011891
TEST_APP_ID_HIGH = 15064251325855190961 - 2**64


def _base(origin: str, event_type: int) -> dict:
    return {
        "origin": origin,
        "eventType": event_type,
        "timestamp": TEST_TS,
        "deployment": None,
        "job": None,
        "index": None,
        "ip": None,
        "tags": None,
        "httpStartStop": None,
        "logMessage": None,
        "valueMetric": None,
        "counterEvent": None,
        "error": None,
        "containerMetric": None,
        # _unrecognized (ENVELOPE_SCHEMA's unknown-field residue) is
        # deliberately ABSENT: decode_envelope only materializes the key
        # when residue exists, and these dicts pin that historical shape;
        # createDataFrame fills the missing key as NULL
    }


def canonical_envelopes() -> list[dict]:
    """The 8 canonical rows: log1 http1 vm1 ce1 cm1 err1 unk1 slow1."""
    log1 = _base("fake-origin-1", schemas.LOG_MESSAGE)
    log1["logMessage"] = {
        "message": b"hello",
        "message_type": schemas.MESSAGE_TYPE_OUT,
        "timestamp": TEST_TS,
        "app_id": TEST_APP_ID,
        "source_type": "DEA",
        "source_instance": None,
    }

    http1 = _base("fake-origin-6", schemas.HTTP_START_STOP)
    http1["httpStartStop"] = {
        "startTimestamp": None,
        "stopTimestamp": None,
        "requestId": None,
        "peerType": None,
        "method": None,
        "uri": None,
        "remoteAddress": None,
        "userAgent": None,
        "statusCode": None,
        "contentLength": None,
        "applicationId": {"low": TEST_APP_ID_LOW, "high": TEST_APP_ID_HIGH},
        "instanceIndex": None,
        "instanceId": None,
        "forwarded": None,
    }

    vm1 = _base("fake-origin-2", schemas.VALUE_METRIC)
    vm1["valueMetric"] = {"name": "df", "value": 0.99, "unit": None}

    ce1 = _base("fake-origin-7", schemas.COUNTER_EVENT)
    ce1["counterEvent"] = {"name": "test-event", "delta": None, "total": None}

    cm1 = _base("fake-origin-3", schemas.CONTAINER_METRIC)
    cm1["containerMetric"] = {
        "applicationId": TEST_APP_ID,
        "instanceIndex": 0,
        "cpuPercentage": None,
        "memoryBytes": None,
        "diskBytes": None,
        "memoryBytesQuota": None,
        "diskBytesQuota": None,
    }

    err1 = _base("fake-origin-8", schemas.ERROR)
    err1["error"] = {"source": None, "code": None, "message": "test-error"}

    unk1 = _base("fake-origin-9", -1)

    slow1 = _base("doppler", schemas.COUNTER_EVENT)
    slow1["counterEvent"] = {
        "name": "TruncatingBuffer.DroppedMessages",  # detector.go:116-124
        "delta": None,
        "total": None,
    }

    return [log1, http1, vm1, ce1, cm1, err1, unk1, slow1]


def canonical_envelope_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(canonical_envelopes(), schemas.ENVELOPE_SCHEMA)


def synthetic_envelope_df(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic envelope stream (FIXTURES.md §6 weights): log 70%,
    http 10%, valueMetric 10%, counterEvent 5%, containerMetric 4%,
    error/unknown/slow ~1%. Built distributed via spark.range — no
    driver-side row materialization, scales to any n.
    """
    app_ids = [str(_uuid.UUID(int=seed * 10_000_000 + i)) for i in range(100)]
    r = F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(100))
    app_id = F.element_at(
        F.array(*[F.lit(a) for a in app_ids]),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(100)) + 1).cast("int"),
    )
    et = (
        F.when(r < 70, F.lit(schemas.LOG_MESSAGE))
        .when(r < 80, F.lit(schemas.HTTP_START_STOP))
        .when(r < 90, F.lit(schemas.VALUE_METRIC))
        .when(r < 95, F.lit(schemas.COUNTER_EVENT))
        .when(r < 99, F.lit(schemas.CONTAINER_METRIC))
        .when(r < 100, F.lit(schemas.ERROR))
        .cast("int")
    )
    base_ts = F.lit(TEST_TS) + F.col("id") * 1000

    df = spark.range(n).select(
        F.format_string("origin-%d", F.pmod(F.col("id"), F.lit(8))).alias("origin"),
        et.alias("eventType"),
        base_ts.alias("timestamp"),
        F.lit(None).cast("string").alias("deployment"),
        F.lit(None).cast("string").alias("job"),
        F.lit(None).cast("string").alias("index"),
        F.lit(None).cast("string").alias("ip"),
        F.lit(None).cast("map<string,string>").alias("tags"),
        F.when(
            et == schemas.HTTP_START_STOP,
            F.named_struct(
                F.lit("startTimestamp"), base_ts,
                F.lit("stopTimestamp"), base_ts + 1000,
                F.lit("requestId"), F.named_struct(
                    F.lit("low"), F.col("id"), F.lit("high"), F.col("id") + 1
                ),
                F.lit("peerType"), F.lit(schemas.PEER_TYPE_SERVER),
                F.lit("method"), F.lit(1),
                F.lit("uri"), F.lit("/some/uri"),
                F.lit("remoteAddress"), F.lit("10.0.0.1"),
                F.lit("userAgent"), F.lit("ua"),
                F.lit("statusCode"), F.lit(200),
                F.lit("contentLength"), F.lit(128).cast("long"),
                F.lit("applicationId"), F.named_struct(
                    F.lit("low"), F.lit(TEST_APP_ID_LOW),
                    F.lit("high"), F.lit(TEST_APP_ID_HIGH),
                ),
                F.lit("instanceIndex"), F.lit(0),
                F.lit("instanceId"), F.lit(None).cast("string"),
                F.lit("forwarded"), F.lit(None).cast("array<string>"),
            ),
        ).alias("httpStartStop"),
        F.when(
            et == schemas.LOG_MESSAGE,
            F.named_struct(
                F.lit("message"),
                F.encode(F.format_string("log line %d", F.col("id")), "utf-8"),
                F.lit("message_type"), F.lit(schemas.MESSAGE_TYPE_OUT),
                F.lit("timestamp"), base_ts,
                F.lit("app_id"), app_id,
                F.lit("source_type"), F.lit("DEA"),
                F.lit("source_instance"), F.lit(None).cast("string"),
            ),
        ).alias("logMessage"),
        F.when(
            et == schemas.VALUE_METRIC,
            F.named_struct(
                F.lit("name"), F.lit("df"),
                F.lit("value"), (F.pmod(F.col("id"), F.lit(100)) / 100.0),
                F.lit("unit"), F.lit("ms"),
            ),
        ).alias("valueMetric"),
        F.when(
            et == schemas.COUNTER_EVENT,
            F.named_struct(
                F.lit("name"), F.lit("test-event"),
                F.lit("delta"), F.pmod(F.col("id"), F.lit(10)).cast("long"),
                F.lit("total"), F.col("id").cast("long"),
            ),
        ).alias("counterEvent"),
        F.when(
            et == schemas.ERROR,
            F.named_struct(
                F.lit("source"), F.lit("src"),
                F.lit("code"), F.lit(500),
                F.lit("message"), F.lit("test-error"),
            ),
        ).alias("error"),
        F.when(
            et == schemas.CONTAINER_METRIC,
            F.named_struct(
                F.lit("applicationId"), app_id,
                F.lit("instanceIndex"), F.pmod(F.col("id"), F.lit(4)).cast("int"),
                F.lit("cpuPercentage"), (F.pmod(F.col("id"), F.lit(100)) / 1.0),
                F.lit("memoryBytes"), (F.col("id") * 1024).cast("long"),
                F.lit("diskBytes"), (F.col("id") * 2048).cast("long"),
                F.lit("memoryBytesQuota"), F.lit(None).cast("long"),
                F.lit("diskBytesQuota"), F.lit(None).cast("long"),
            ),
        ).alias("containerMetric"),
        F.lit(None).cast("binary").alias("_unrecognized"),
    )
    return df
