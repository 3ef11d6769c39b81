"""Kafka routing end-to-end (K1-K3): the exact (topic, value) rows the
kafka sink receives, captured via foreachBatch interception.

Mirrors the reference's mock-broker integration table
(kafka_test.go:16-228): per-event-type fixed-topic landing, %s topic
templating, and the compression-codec option, each verified against the
message the producer would publish. No broker runs in this sandbox, so
instead of sarama's MockBroker we intercept the sink's input frame —
Spark's kafka sink contract is purely "a DataFrame with (topic, value)
columns plus writer options", and both halves are asserted here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_firehose_nozzle_spark import schemas
from kafka_firehose_nozzle_spark.config import Config, KafkaConfig, TopicConfig
from kafka_firehose_nozzle_spark.fixtures import (
    TEST_APP_ID,
    canonical_envelope_df,
    canonical_envelopes,
)
from kafka_firehose_nozzle_spark.pipeline import route_envelopes_config
from kafka_firehose_nozzle_spark.sinks.kafka import kafka_sink_options
from kafka_firehose_nozzle_spark.streaming.job import file_replay_stream


def _config(compression: str = "", **topic_kw) -> Config:
    c = Config()
    c.kafka = KafkaConfig(
        brokers=["localhost:9092"],
        compression=compression,
        topic=TopicConfig(**topic_kw),
    )
    return c


# the kafka_test.go:16-228 case table: (origin-of-fixture, config, topic)
ROUTING_CASES = [
    ("fake-origin-1", dict(log_message="log"), "log"),
    ("fake-origin-2", dict(value_metric="metric"), "metric"),
    ("fake-origin-3", dict(container_metric="containermetric"), "containermetric"),
    ("fake-origin-6", dict(http_start_stop="httpstartstop"), "httpstartstop"),
    ("fake-origin-7", dict(counter_event="counterevent"), "counterevent"),
    ("fake-origin-8", dict(error="error"), "error"),
    ("fake-origin-1", dict(log_message_fmt="log-%s"), f"log-{TEST_APP_ID}"),
    (
        "fake-origin-3",
        dict(container_metric_fmt="container-metric-%s"),
        f"container-metric-{TEST_APP_ID}",
    ),
]


@pytest.mark.parametrize("origin,topic_kw,want_topic", ROUTING_CASES)
def test_routing_case_lands_on_expected_topic(spark, origin, topic_kw, want_topic):
    env = canonical_envelope_df(spark).filter(F.col("origin") == origin)
    routed = route_envelopes_config(env, _config(**topic_kw)).collect()
    assert [r.topic for r in routed] == [want_topic]
    assert routed[0].value.startswith('{"origin":"%s"' % origin)


@pytest.mark.parametrize(
    "compression,want",
    [("gzip", "gzip"), ("snappy", "snappy"), ("none", None), ("", None)],
)
def test_compression_codec_reaches_producer_options(compression, want):
    # kafka_test.go:186-198: codec must be set on the producer config
    opts = kafka_sink_options(_config(compression, log_message="log"))
    assert opts.get("kafka.compression.type") == want


def test_streaming_foreachbatch_captures_exact_sink_input(spark, tmp_path):
    """Full streaming path: fixture envelopes -> pipeline -> the exact
    frame write_stream_kafka would hand the kafka writer, intercepted
    with foreachBatch."""
    src = str(tmp_path / "env_src")
    canonical_envelope_df(spark).write.mode("overwrite").parquet(src)

    config = _config(
        log_message_fmt="log-%s",
        value_metric="metric",
        container_metric="containermetric",
        http_start_stop="httpstartstop",
        counter_event="counterevent",
        error="error",
    )
    routed = route_envelopes_config(file_replay_stream(spark, src), config)

    captured: list[tuple[str, str]] = []

    def capture(batch_df, batch_id):
        # exactly the (topic, value) frame the kafka format serializes
        assert [f.name for f in batch_df.schema.fields] == ["topic", "value"]
        captured.extend((r.topic, r.value) for r in batch_df.collect())

    q = (
        routed.writeStream.foreachBatch(capture)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    by_topic = {t: v for t, v in captured}
    # 8 fixture envelopes: 7 routable (slow1 is also a CounterEvent),
    # unk1 (unknown event type) dropped — kafka.go:333-338
    assert len(captured) == 7
    assert set(by_topic) == {
        f"log-{TEST_APP_ID}",
        "metric",
        "containermetric",
        "httpstartstop",
        "counterevent",
        "error",
    }
    # templated topic got the envelope's app id, and the payload is the
    # byte-exact sonde JSON (golden pinned in test_sonde_json)
    assert by_topic[f"log-{TEST_APP_ID}"].startswith(
        '{"origin":"fake-origin-1","eventType":5'
    )
    # counterevent topic saw both ce1 and slow1; last captured wins in the
    # dict, but both rows must be present in the raw capture
    ce_rows = [v for t, v in captured if t == "counterevent"]
    assert len(ce_rows) == 2

    # the unroutable row really was the unknown-type one
    unk = canonical_envelopes()[6]
    assert unk["eventType"] not in set(schemas.EVENT_TYPE_NAMES)
