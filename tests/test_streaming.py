"""Streaming end-to-end tests: file-replay source -> routing pipeline ->
memory sink, with listener-accumulated stats (SURVEY.md §5 port, item e)."""

import tempfile

from pyspark.sql import functions as F

from kafka_firehose_nozzle_spark.config import Config, KafkaConfig, TopicConfig
from kafka_firehose_nozzle_spark.fixtures import synthetic_envelope_df
from kafka_firehose_nozzle_spark.streaming.job import (
    file_replay_stream,
    start_pipeline,
)


def _config() -> Config:
    c = Config()
    c.kafka = KafkaConfig(
        brokers=["localhost:9092"],
        topic=TopicConfig(
            log_message="log",
            log_message_fmt="log-%s",
            value_metric="metric",
            container_metric="containermetric",
            http_start_stop="httpstartstop",
            counter_event="counterevent",
            error="error",
        ),
    )
    return c


def test_stream_routing_end_to_end(spark, tmp_path):
    src = str(tmp_path / "envelopes")
    n = 2000
    synthetic_envelope_df(spark, n).write.mode("overwrite").parquet(src)

    envelopes = file_replay_stream(spark, src)
    handle = start_pipeline(
        spark,
        envelopes,
        _config(),
        checkpoint=str(tmp_path / "ckpt"),
        sink="memory",
        memory_sink_name="stream_test_out",
    )
    try:
        handle.query.processAllAvailable()
        handle.wait_for_stats(n)
    finally:
        handle.stop()
    stats = handle.stats

    out = spark.sql("SELECT * FROM stream_test_out")
    total = out.count()
    assert total == n  # all synthetic types are routable with full config

    # templated log topics appear
    log_topics = out.filter(F.col("topic").startswith("log-")).count()
    assert log_topics > 0

    # values are sonde JSON
    row = out.limit(1).collect()[0]
    assert row.value.startswith('{"origin":')

    snap = stats.snapshot()
    assert snap["consume"] == n
    assert snap["forwarded"] == n
    assert snap["ignored"] == 0
    assert snap["publish"] == n  # memory sink reports numOutputRows
    assert snap["delay"] == 0
    assert (
        snap["consume_log_message"]
        + snap["consume_http_start_stop"]
        + snap["consume_value_metric"]
        + snap["consume_counter_event"]
        + snap["consume_container_metric"]
        + snap["consume_error"]
    ) == n


def test_stream_drops_counted(spark, tmp_path):
    """Only value_metric enabled -> everything else ignored (P2 + A1)."""
    src = str(tmp_path / "envelopes2")
    synthetic_envelope_df(spark, 500).write.mode("overwrite").parquet(src)

    config = _config()
    config.kafka.topic = TopicConfig(value_metric="metric")

    handle = start_pipeline(
        spark,
        file_replay_stream(spark, src),
        config,
        checkpoint=str(tmp_path / "ckpt2"),
        sink="memory",
        memory_sink_name="stream_test_drops",
    )
    try:
        handle.query.processAllAvailable()
        handle.wait_for_stats(500)
    finally:
        handle.stop()
    stats = handle.stats

    snap = stats.snapshot()
    assert snap["consume"] == 500
    assert snap["forwarded"] == spark.sql(
        "SELECT count(*) c FROM stream_test_drops"
    ).collect()[0].c
    assert snap["ignored"] == 500 - snap["forwarded"]
    assert snap["ignored"] > 0
