"""Stats tests: golden JSON (stats_test.go:37-93), concurrency
(stats_test.go:11-35), and observe()-based counter accumulation (A1)."""

import json
import threading

from kafka_firehose_nozzle_spark.config import TopicConfig
from kafka_firehose_nozzle_spark.fixtures import canonical_envelope_df
from kafka_firehose_nozzle_spark.pipeline import route_envelopes
from kafka_firehose_nozzle_spark.stats import OBS_CONSUME, OBS_ROUTED, Stats

FULL = TopicConfig(
    log_message="log",
    value_metric="metric",
    container_metric="containermetric",
    http_start_stop="httpstartstop",
    counter_event="counterevent",
    error="error",
)


def test_stats_json_golden():
    """stats_test.go:37-93: consume+100, publish_fail+50, publish+50,
    subinput +100/-50, forwarded+100 -> delay 0, all 19 keys in order."""
    s = Stats()
    s.inc("consume", 100)
    s.inc("publish_fail", 50)
    s.inc("publish", 50)
    s.inc("subinupt_buffer", 100)
    s.dec("subinupt_buffer", 50)
    s.inc("forwarded", 100)
    got = json.loads(s.to_json())
    assert got["consume"] == 100
    assert got["publish_fail"] == 50
    assert got["publish"] == 50
    assert got["subinupt_buffer"] == 50
    assert got["forwarded"] == 100
    assert got["delay"] == 0
    assert got["instance_id"] == 0
    assert list(got) == [
        "consume", "consume_per_sec", "consume_fail",
        "consume_http_start_stop", "consume_value_metric",
        "consume_counter_event", "consume_log_message", "consume_error",
        "consume_container_metric", "consume_unknown", "ignored",
        "forwarded", "publish", "publish_per_sec", "publish_fail",
        "slow_consumer_alert", "subinupt_buffer", "delay", "instance_id",
    ]


def test_stats_concurrent_inc():
    """stats_test.go:11-35: 20 threads x 5 increments."""
    s = Stats()
    threads = [
        threading.Thread(target=lambda: [s.inc("consume") for _ in range(5)])
        for _ in range(20)
    ]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert s.get("consume") == 100


def test_observe_counters_batch(spark):
    """Batch-mode observed metrics replicate the consume/route counters."""
    from pyspark.sql import Observation

    consume_obs = Observation("consume")
    routed_obs = Observation("routed")
    df = canonical_envelope_df(spark)
    out = route_envelopes(
        df,
        FULL,
        with_observe=True,
        consume_observation=consume_obs,
        routed_observation=routed_obs,
    )
    collected = out.collect()  # action materializes observations
    stats = Stats()
    stats.merge_observation(consume_obs.get)
    stats.merge_observation(routed_obs.get)
    snap = stats.snapshot()
    assert snap["consume"] == 8
    assert snap["consume_log_message"] == 1
    assert snap["consume_counter_event"] == 2
    assert snap["consume_unknown"] == 1
    assert snap["ignored"] == 1  # unk1
    assert snap["forwarded"] == 7
    assert snap["slow_consumer_alert"] == 1  # slow1
    assert snap["delay"] == 7  # nothing published yet
    assert len(collected) == 7
