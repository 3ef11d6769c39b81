"""Event-type -> Kafka topic routing expressions.

Reference: ``KafkaProducer.input`` switch (kafka.go:305-340) computes a
destination topic per event; ``fmtTopic`` (kafka.go:183-188) substitutes the
application id into a ``%s`` template when configured. An empty resolved
topic means "drop" (kafka.go:333-338) — expressed here as NULL so the
pipeline can ``filter(topic IS NOT NULL)`` (P2) and Catalyst can push the
whole thing into one projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_firehose_nozzle_spark import schemas
from kafka_firehose_nozzle_spark.config import TopicConfig
from kafka_firehose_nozzle_spark.functions.uuid_codec import uuid_to_str


def app_id_expr(df: DataFrame) -> Column:
    """Application id of an envelope, per event type (P4; kafka.go:312,315,327).

    LogMessage -> logMessage.app_id; ContainerMetric ->
    containerMetric.applicationId; HttpStartStop -> uuid2str(applicationId).
    Other types have no app id (and no templated topics).
    """
    return (
        F.when(
            df["eventType"] == schemas.LOG_MESSAGE, df["logMessage.app_id"]
        )
        .when(
            df["eventType"] == schemas.CONTAINER_METRIC,
            df["containerMetric.applicationId"],
        )
        .when(
            df["eventType"] == schemas.HTTP_START_STOP,
            # Go's nil-safe getters render a missing applicationId as the
            # zero UUID (uuid2str(nil) -> GetLow()==0), so default the
            # fields to 0 rather than propagating NULL.
            uuid_to_str(
                F.struct(
                    F.coalesce(
                        df["httpStartStop.applicationId.low"], F.lit(0)
                    ).alias("low"),
                    F.coalesce(
                        df["httpStartStop.applicationId.high"], F.lit(0)
                    ).alias("high"),
                )
            ),
        )
    )


def _fmt_topic(topic: str, topic_fmt: str, app_id: Column) -> Column:
    """fmtTopic (kafka.go:183-188): %s template over app id, else static.

    Go's Sprintf("%s", nil-string) renders ""; format_string on a NULL
    column yields NULL, so coalesce the app id to "" first. An empty static
    topic -> NULL (drop marker).
    """
    if topic_fmt:
        return F.format_string(
            topic_fmt.replace("%s", "%s"), F.coalesce(app_id, F.lit(""))
        )
    if topic:
        return F.lit(topic)
    return F.lit(None).cast("string")


def route_topic_expr(df: DataFrame, topics: TopicConfig) -> Column:
    """Destination-topic column (P1+P3; kafka.go:305-340).

    Unknown event types and disabled (empty) topics resolve to NULL.
    The whole dispatch is a single CASE WHEN — one codegen'd projection,
    no shuffle, no UDF.
    """
    app_id = app_id_expr(df)
    et = df["eventType"]
    return (
        F.when(
            et == schemas.HTTP_START_STOP,
            _fmt_topic(topics.http_start_stop, topics.http_start_stop_fmt, app_id),
        )
        .when(
            et == schemas.LOG_MESSAGE,
            _fmt_topic(topics.log_message, topics.log_message_fmt, app_id),
        )
        .when(
            et == schemas.VALUE_METRIC,
            _fmt_topic(topics.value_metric, "", app_id),
        )
        .when(
            et == schemas.COUNTER_EVENT,
            _fmt_topic(topics.counter_event, "", app_id),
        )
        .when(et == schemas.ERROR, _fmt_topic(topics.error, "", app_id))
        .when(
            et == schemas.CONTAINER_METRIC,
            _fmt_topic(topics.container_metric, topics.container_metric_fmt, app_id),
        )
        .otherwise(F.lit(None).cast("string"))
    )
