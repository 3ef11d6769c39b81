"""Routing tests (reference kafka_test.go:16-312): each event type lands on
its configured topic, static and %s-templated; disabled/unknown dropped."""

import pytest
from pyspark.sql import functions as F

from kafka_firehose_nozzle_spark.config import TopicConfig
from kafka_firehose_nozzle_spark.fixtures import TEST_APP_ID, canonical_envelope_df
from kafka_firehose_nozzle_spark.pipeline import route_envelopes

FULL = TopicConfig(
    log_message="log",
    value_metric="metric",
    container_metric="containermetric",
    http_start_stop="httpstartstop",
    counter_event="counterevent",
    error="error",
)


def _routed(spark, topics):
    df = canonical_envelope_df(spark)
    out = route_envelopes(df, topics)
    rows = out.select("topic", "value").collect()
    return rows


def test_static_routing(spark):
    rows = _routed(spark, FULL)
    got = sorted(r.topic for r in rows)
    # 8 canonical rows: unk1 dropped (unknown type); slow1 is a counterEvent
    assert got == sorted(
        ["log", "metric", "containermetric", "httpstartstop",
         "counterevent", "counterevent", "error"]
    )


@pytest.mark.parametrize(
    "topics,origin,want",
    [
        (TopicConfig(log_message_fmt="log-%s"), "fake-origin-1", f"log-{TEST_APP_ID}"),
        (
            TopicConfig(container_metric_fmt="container-metric-%s"),
            "fake-origin-3",
            f"container-metric-{TEST_APP_ID}",
        ),
        (
            TopicConfig(http_start_stop_fmt="http-%s"),
            "fake-origin-6",
            f"http-{TEST_APP_ID}",
        ),
    ],
)
def test_templated_routing(spark, topics, origin, want):
    df = canonical_envelope_df(spark).filter(F.col("origin") == origin)
    rows = route_envelopes(df, topics).collect()
    assert len(rows) == 1 and rows[0].topic == want


def test_disabled_type_dropped(spark):
    # log_message unset -> log1 dropped (kafka_test.go:230-312)
    topics = TopicConfig(value_metric="metric")
    df = canonical_envelope_df(spark).filter(F.col("origin") == "fake-origin-1")
    assert route_envelopes(df, topics).count() == 0


def test_unknown_type_dropped(spark):
    df = canonical_envelope_df(spark).filter(F.col("origin") == "fake-origin-9")
    assert route_envelopes(df, FULL).count() == 0


def test_routed_value_is_golden_json(spark):
    df = canonical_envelope_df(spark).filter(F.col("origin") == "fake-origin-2")
    rows = route_envelopes(df, FULL).collect()
    assert rows[0].value.startswith('{"origin":"fake-origin-2","eventType":6,')


def test_route_topic_from_wire_matches_envelope_path(spark):
    """route_topic_from_wire (single-projection, parse-pruned dispatch
    over the parsed wire struct — the r11 roundtrip fast path) must
    route every envelope to EXACTLY the topic the envelope-column path
    produces, across the canonical corpus (all 6 types + unknown + a
    nil applicationId HttpStartStop) and a synthetic mix, for both a
    fully-templated and a partially-disabled config."""
    from kafka_firehose_nozzle_spark.fixtures import synthetic_envelope_df
    from kafka_firehose_nozzle_spark.functions.routing import (
        route_topic_expr,
        route_topic_from_wire,
    )
    from kafka_firehose_nozzle_spark.functions.sonde_json import (
        _decode_read_schema,
        envelopes_from_json,
        sonde_json,
    )

    templated = TopicConfig(
        log_message_fmt="log-%s",
        value_metric="metric",
        container_metric_fmt="cm-%s",
        http_start_stop_fmt="http-%s",
        counter_event="counterevent",
        error="",  # disabled -> NULL
    )
    for df in (canonical_envelope_df(spark), synthetic_envelope_df(spark, 200)):
        encoded = df.select(sonde_json(df).alias("value")).localCheckpoint()
        for topics in (FULL, templated):
            dec = envelopes_from_json(encoded, "value")
            want = [
                r[0]
                for r in dec.select(
                    route_topic_expr(dec, topics).alias("t")
                ).collect()
            ]
            got = [
                r[0]
                for r in encoded.select(
                    route_topic_from_wire(
                        F.from_json(F.col("value"), _decode_read_schema()),
                        topics,
                    ).alias("t")
                ).collect()
            ]
            assert sorted(want, key=str) == sorted(got, key=str)
