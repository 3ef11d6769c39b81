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


def test_firehose_source_through_full_pipeline(spark, tmp_path):
    """SRC1 -> P1-P4/S2 -> A1 -> sink in one flow: the firehose fixture
    source (wire-decode path enabled) feeds the real routing pipeline
    into a memory sink. The canonical fixture set contains an
    unknown-type envelope and the doppler TruncatingBuffer counter, so
    this also pins ConsumeUnknown and SlowConsumerAlert end-to-end
    through the actual source — not a synthetic DataFrame."""
    from kafka_firehose_nozzle_spark.sources.firehose import FirehoseDataSource

    spark.dataSource.register(FirehoseDataSource)
    envelopes = (
        spark.readStream.format("firehose")
        .option("fixtureRows", "16")
        .option("fixtureWire", "true")
        .load()
    )
    handle = start_pipeline(
        spark,
        envelopes,
        _config(),
        checkpoint=str(tmp_path / "ckpt"),
        sink="memory",
        memory_sink_name="fh_pipe_out",
    )
    try:
        # the fixture source is unbounded — wait for a couple of batches
        # of consume counts instead of processAllAvailable()
        handle.wait_for_stats(32, timeout=120)
    finally:
        handle.stop()
    stats = handle.stats
    assert stats.get("consume") >= 32
    # 16 envelopes/batch cycle through the 8 canonicals: 2x unknown-type
    # and 2x doppler TruncatingBuffer per batch
    assert stats.get("consume_unknown") >= 2
    assert stats.get("slow_consumer_alert") >= 2
    assert stats.get("forwarded") > 0
    # unknown-type envelopes are unroutable -> dropped and counted
    assert stats.get("ignored") >= stats.get("consume_unknown")

    out = spark.sql("SELECT topic, value FROM fh_pipe_out")
    assert out.count() > 0
    # wire-decoded LogMessages route through the %s template with the
    # canonical app id
    assert (
        out.filter(
            F.col("topic") == "log-3356a5c7-e86c-442a-b14f-ce5cc4f80ed1"
        ).count()
        > 0
    )


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
