"""Byte-exact sonde-go JSON encoder as a single ``to_json`` expression.

The reference serializes envelopes with easyjson (encoder.go:15-27); golden
tests pin the exact bytes (kafka_test.go:557-603, encoder_test.go:13-33).
Format properties and how each is reproduced JVM-side:

- key order = proto field order (events_easyjson.go:1061-1241)
    -> ENVELOPE_SCHEMA field order + an ordered struct() projection
- omit-nil-pointer fields ("omitempty" on all fields)
    -> to_json drops NULL fields (spark.sql.jsonGenerator.ignoreNullFields,
       default true); empty tags map is nulled explicitly
       (len(tags)!=0 gate, events_easyjson.go:1148)
- enums as ints (eventType, message_type, peerType, method)
    -> stored IntegerType
- bytes as base64 (logMessage.message)
    -> BinaryType renders base64 in to_json
- uint64 rendered unsigned even above 2^63 (uuid low/high, counters,
  container memory/disk)
    -> re-widen LongType to Decimal(20,0) adding 2^64 to negatives;
       to_json prints scale-0 decimals as bare integers

Known fidelity caveat (documented, not triggered by the goldens): Go prints
integral float64 as "42" while Jackson prints "42.0". Reference golden
values (0.99) are non-integral.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO64 = Decimal(2) ** 64


def _unsigned(col: Column) -> Column:
    """LongType carrying a uint64 -> Decimal(20,0) with unsigned value."""
    dec = col.cast("decimal(20,0)")
    return F.when(col < 0, (dec + F.lit(_TWO64).cast("decimal(21,0)")).cast("decimal(20,0)")).otherwise(dec)


def _uuid_json(u: Column) -> Column:
    """UUID{low,high} struct with unsigned rendering (uuid.pb.go:23-27)."""
    return F.when(
        u.isNotNull(),
        F.struct(
            _unsigned(u.getField("low")).alias("low"),
            _unsigned(u.getField("high")).alias("high"),
        ),
    )


def _http_json(h: Column) -> Column:
    return F.when(
        h.isNotNull(),
        F.struct(
            h.getField("startTimestamp").alias("startTimestamp"),
            h.getField("stopTimestamp").alias("stopTimestamp"),
            _uuid_json(h.getField("requestId")).alias("requestId"),
            h.getField("peerType").alias("peerType"),
            h.getField("method").alias("method"),
            h.getField("uri").alias("uri"),
            h.getField("remoteAddress").alias("remoteAddress"),
            h.getField("userAgent").alias("userAgent"),
            h.getField("statusCode").alias("statusCode"),
            h.getField("contentLength").alias("contentLength"),
            _uuid_json(h.getField("applicationId")).alias("applicationId"),
            h.getField("instanceIndex").alias("instanceIndex"),
            h.getField("instanceId").alias("instanceId"),
            h.getField("forwarded").alias("forwarded"),
        ),
    )


def _counter_json(c: Column) -> Column:
    return F.when(
        c.isNotNull(),
        F.struct(
            c.getField("name").alias("name"),
            _unsigned(c.getField("delta")).alias("delta"),
            _unsigned(c.getField("total")).alias("total"),
        ),
    )


def _container_json(c: Column) -> Column:
    return F.when(
        c.isNotNull(),
        F.struct(
            c.getField("applicationId").alias("applicationId"),
            c.getField("instanceIndex").alias("instanceIndex"),
            c.getField("cpuPercentage").alias("cpuPercentage"),
            _unsigned(c.getField("memoryBytes")).alias("memoryBytes"),
            _unsigned(c.getField("diskBytes")).alias("diskBytes"),
            _unsigned(c.getField("memoryBytesQuota")).alias("memoryBytesQuota"),
            _unsigned(c.getField("diskBytesQuota")).alias("diskBytesQuota"),
        ),
    )


def sonde_envelope_struct(df: DataFrame) -> Column:
    """Ordered struct matching easyjson's Envelope marshal order
    (events_easyjson.go:1061-1241); NULL fields are omitted by to_json."""
    tags = df["tags"]
    return F.struct(
        df["origin"].alias("origin"),
        df["eventType"].alias("eventType"),
        df["timestamp"].alias("timestamp"),
        df["deployment"].alias("deployment"),
        df["job"].alias("job"),
        df["index"].alias("index"),
        df["ip"].alias("ip"),
        F.when(F.size(tags) > 0, tags).alias("tags"),
        _http_json(df["httpStartStop"]).alias("httpStartStop"),
        df["logMessage"].alias("logMessage"),
        df["valueMetric"].alias("valueMetric"),
        _counter_json(df["counterEvent"]).alias("counterEvent"),
        df["error"].alias("error"),
        _container_json(df["containerMetric"]).alias("containerMetric"),
    )


def sonde_json(df: DataFrame) -> Column:
    """Envelope row -> sonde-go JSON string (S2; encoder.go:15-18).

    One codegen'd projection; whole-stage compatible; no Python on the
    hot path (the reference benchmarked three Go encoders for exactly this
    reason, encoder_test.go:41-67).
    """
    return F.to_json(sonde_envelope_struct(df))
