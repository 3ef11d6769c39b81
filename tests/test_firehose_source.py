"""Firehose Python DataSource tests (SRC1/SRC2): fixture-mode streaming
through the full DataSource plumbing, URL building, token validation."""

import pytest

from kafka_firehose_nozzle_spark.sources.firehose import (
    FirehoseDataSource,
    FirehoseStreamReader,
    fetch_uaa_token,
    firehose_url,
)


def test_firehose_url():
    # noaa firehose.go:42-44
    assert (
        firehose_url("wss://doppler.example.com:443", "my-sub")
        == "wss://doppler.example.com:443/firehose/my-sub"
    )


@pytest.mark.parametrize(
    "kw,msg",
    [
        (dict(uaa_addr="", username="u", password="p"), "UaaAddr must not be empty"),
        (dict(uaa_addr="https://uaa", username="", password="p"), "Username must not be empty"),
        (dict(uaa_addr="https://uaa", username="u", password=""), "Password must not be empty"),
    ],
)
def test_token_validation(kw, msg):
    # go-nozzle token.go:69-83
    with pytest.raises(ValueError, match=msg):
        fetch_uaa_token(**kw)


def test_firehose_url_with_filter_type():
    # noaa filter.go:11-19: the filter is a server-side query param
    assert (
        firehose_url("wss://doppler.example.com:443", "my-sub", "logs")
        == "wss://doppler.example.com:443/firehose/my-sub?filter-type=logs"
    )


def test_filter_type_logs_surfaces_only_log_messages():
    # SRC3: filterType=logs -> only LogMessage envelopes (eventType 5)
    reader = FirehoseStreamReader({"fixtureRows": "8", "filterType": "logs"})
    rows, end = reader.read({"n": 0})
    rows = list(rows)
    assert rows and all(r[1] == 5 for r in rows)
    # offsets still advance by envelopes consumed, not rows surfaced
    assert end == {"n": 8}


def test_filter_type_metrics_surfaces_only_metric_envelopes():
    reader = FirehoseStreamReader({"fixtureRows": "8", "filterType": "metrics"})
    rows, _ = reader.read({"n": 0})
    types = {r[1] for r in rows}
    assert types and types <= {6, 7, 9}  # ValueMetric/CounterEvent/ContainerMetric


def test_filter_type_validation():
    with pytest.raises(ValueError, match="filterType"):
        FirehoseStreamReader({"fixtureRows": "8", "filterType": "bogus"})


def test_reader_offsets_fixture_mode():
    reader = FirehoseStreamReader({"fixtureRows": "16"})
    assert reader.initialOffset() == {"n": 0}
    rows, end = reader.read({"n": 0})
    rows = list(rows)
    assert len(rows) == 16
    assert end == {"n": 16}
    rows2, end2 = reader.read(end)
    assert end2 == {"n": 32}
    # deterministic: same offset -> same rows
    again = list(reader.read({"n": 0})[0])
    assert again == rows


def test_stream_through_spark(spark, tmp_path):
    """End-to-end: register the DataSource, run a streaming batch into a
    memory sink, check schema + row content."""
    spark.dataSource.register(FirehoseDataSource)
    df = (
        spark.readStream.format("firehose")
        .option("fixtureRows", "24")
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("firehose_fixture_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM firehose_fixture_out")
    assert out.count() >= 24
    row = out.filter("origin = 'fake-origin-1'").limit(1).collect()[0]
    assert row.eventType == 5
    assert bytes(row.logMessage.message) == b"hello"
    names = [f.name for f in out.schema.fields]
    assert names[:3] == ["origin", "eventType", "timestamp"]
