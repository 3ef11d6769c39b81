"""Config loader tests (reference config_test.go:10-77, fixtures/basic.toml)."""

import pytest

from kafka_firehose_nozzle_spark.config import load_config

BASIC_TOML = """\
subscription_id = "kafka-firehose-nozzle"
insecure_ssl_skip_verify = true

[cf]
doppler_address = "wss://doppler.cloudfoundry.net"
uaa_address = "https://uaa.cloudfoundry.net"
username = "tcnksm"
password = "xyz"
idle_timeout = 10

[kafka]
brokers = ["192.168.1.1:9092","192.168.1.2:9092","192.168.1.3:9092"]
retry_max = 10
retry_backoff_ms = 500

  [kafka.topic]
  log_message = "log"
  log_message_fmt = "log-%s"
  value_metric = "metric"
"""


def test_load_config(tmp_path):
    p = tmp_path / "basic.toml"
    p.write_text(BASIC_TOML)
    c = load_config(str(p))
    assert c.subscription_id == "kafka-firehose-nozzle"
    assert c.insecure_ssl_skip_verify is True
    assert c.cf.doppler_address == "wss://doppler.cloudfoundry.net"
    assert c.cf.uaa_address == "https://uaa.cloudfoundry.net"
    assert c.cf.username == "tcnksm"
    assert c.cf.password == "xyz"
    assert c.cf.idle_timeout == 10
    assert c.kafka.brokers == [
        "192.168.1.1:9092",
        "192.168.1.2:9092",
        "192.168.1.3:9092",
    ]
    assert c.kafka.retry_max == 10
    assert c.kafka.retry_backoff_ms == 500
    assert c.kafka.topic.log_message == "log"
    assert c.kafka.topic.log_message_fmt == "log-%s"
    assert c.kafka.topic.value_metric == "metric"


def test_missing_file(tmp_path):
    # error mentions "no such file" (config_test.go:45-50)
    with pytest.raises(FileNotFoundError, match="[Nn]o such file"):
        load_config(str(tmp_path / "nope.toml"))
