"""Real loopback TLS handshakes through the kafka.ssl.* option builder.

Replicates the reference's TLS suite (tls_test.go:18-248), which mints
a throwaway CA/host/client PKI and runs LIVE localhost handshakes
against a listener configured with RequireAndVerifyClientCert. Here the
listener is stdlib ``ssl`` (verify_mode=CERT_REQUIRED over the minted
CA), and the client side is built from the exact ``kafka.ssl.*`` option
strings that ``kafka_sink_options`` produces — so a green test proves
the option wiring carries handshake-capable PEMs, not just strings.

Failure-mode map to tls_test.go:
  - missing client_certificate / private_key / non-PEM input:
    validation errors pre-dial (tls_test.go:19-47, already covered in
    test_sinks.py; re-asserted here for the file to be self-contained)
  - 'Fail with system CAs' (tls_test.go:148-171): no CA in options ->
    system trust -> self-signed broker rejected
  - 'Fail with no TLS' (tls_test.go:173-195): plaintext client against
    the TLS listener
  - 'Fail with wrong key for cert' (tls_test.go:197-220): the HOST
    cert+key presented as the client identity -> serverAuth-only EKU
    fails OpenSSL's certificate-purpose check
  - 'Try to actually work' (tls_test.go:222-247): full mTLS handshake
    succeeds and application bytes flow
"""

from __future__ import annotations

import socket
import ssl
import threading
from pathlib import Path

import pytest

from kafka_firehose_nozzle_spark.config import Config, KafkaConfig
from kafka_firehose_nozzle_spark.sinks.kafka import (
    kafka_sink_options,
    ssl_context_from_options,
)

from tests.tls_certs import mint


def _tls_options(certs: dict[str, str], *, with_ca: bool, client="client"):
    """kafka.ssl.* options exactly as the sink builds them from config."""
    cfg = Config()
    cfg.kafka = KafkaConfig(
        brokers=["127.0.0.1:0"],
        enable_tls=True,
        certificate=Path(certs[f"{client}_cert"]).read_text(),
        private_key=Path(certs[f"{client}_key"]).read_text(),
        ca_certificates=(
            [Path(certs["ca_cert"]).read_text()] if with_ca else []
        ),
    )
    return kafka_sink_options(cfg)


class MTLSListener:
    """tls.Listen + RequireAndVerifyClientCert (doListenerTLSTest,
    tls_test.go:250-273): one-shot TLS accept that records the handshake
    outcome and the verified client identity, then echoes a byte."""

    def __init__(self, certs: dict[str, str]):
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(certs["server_cert"], certs["server_key"])
        ctx.verify_mode = ssl.CERT_REQUIRED  # mutual TLS
        ctx.load_verify_locations(certs["ca_cert"])
        self._ctx = ctx
        self._sock = socket.socket()
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind(("127.0.0.1", 0))
        self._sock.listen(1)
        self._sock.settimeout(10)
        self.port = self._sock.getsockname()[1]
        self.handshake_error: Exception | None = None
        self.peer_cn: str | None = None

    def __enter__(self):
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._thread.join(timeout=10)
        self._sock.close()

    def _serve(self):
        try:
            raw, _ = self._sock.accept()
        except OSError as e:
            self.handshake_error = e
            return
        try:
            tls = self._ctx.wrap_socket(raw, server_side=True)
            peer = tls.getpeercert()
            self.peer_cn = dict(
                x[0] for x in peer["subject"]
            ).get("commonName")
            tls.sendall(b"\x01")  # the 'produce ack' stand-in
            tls.recv(1)
            tls.close()
        except (ssl.SSLError, OSError) as e:
            self.handshake_error = e
        finally:
            try:
                raw.close()
            except OSError:
                pass


@pytest.fixture(scope="module")
def certs(tmp_path_factory):
    return mint(tmp_path_factory.mktemp("pki"))


# -- pre-dial validation (tls_test.go:19-47 wording) ---------------------


@pytest.mark.parametrize(
    "kw,msg",
    [
        (dict(certificate="", private_key=""), "please specify client_certificate"),
        (dict(certificate="foo", private_key=""), "please specify private_key"),
        (dict(certificate="foo", private_key="bar"), "invalid client certificate PEM"),
    ],
)
def test_tls_config_validation(kw, msg):
    cfg = Config()
    cfg.kafka = KafkaConfig(brokers=["b:9092"], enable_tls=True, **kw)
    with pytest.raises(ValueError, match=msg):
        kafka_sink_options(cfg)


# -- live handshake failure modes ----------------------------------------


def test_system_ca_trust_fails_handshake(certs):
    """'Fail with system CAs': options without ca_certificates fall back
    to system trust, which cannot validate the minted broker cert."""
    opts = _tls_options(certs, with_ca=False)
    assert "kafka.ssl.truststore.certificates" not in opts
    ctx = ssl_context_from_options(opts)
    with MTLSListener(certs) as srv:
        with pytest.raises(ssl.SSLCertVerificationError):
            with socket.create_connection(("127.0.0.1", srv.port), 5) as s:
                with ctx.wrap_socket(s, server_hostname="127.0.0.1") as tls:
                    tls.recv(1)
    assert srv.peer_cn is None


def test_plaintext_client_to_tls_listener_fails(certs):
    """'Fail with no TLS': enable_tls=False produces no ssl options; the
    resulting plaintext connection cannot complete the broker's TLS
    accept."""
    cfg = Config()
    cfg.kafka = KafkaConfig(brokers=["127.0.0.1:0"], enable_tls=False)
    opts = kafka_sink_options(cfg)
    assert not any(k.startswith("kafka.ssl") for k in opts)
    assert "kafka.security.protocol" not in opts
    with MTLSListener(certs) as srv:
        with socket.create_connection(("127.0.0.1", srv.port), 5) as s:
            # a Kafka ApiVersions-ish plaintext blob, not a ClientHello
            s.sendall(b"\x00\x00\x00\x0bkafka-nozzle")
            # server must abort its TLS accept; socket EOFs or resets
            try:
                assert s.recv(64) == b""
            except ConnectionError:
                pass
    assert isinstance(srv.handshake_error, ssl.SSLError)
    assert srv.peer_cn is None


def test_server_cert_as_client_identity_fails(certs):
    """'Fail with wrong key for cert': the host cert/key pair wired
    through the options as the CLIENT identity — its serverAuth-only
    EKU fails the listener's certificate-purpose check."""
    opts = _tls_options(certs, with_ca=True, client="server")
    ctx = ssl_context_from_options(opts)
    with MTLSListener(certs) as srv:
        with pytest.raises((ssl.SSLError, ConnectionError)):
            with socket.create_connection(("127.0.0.1", srv.port), 5) as s:
                with ctx.wrap_socket(s, server_hostname="127.0.0.1") as tls:
                    tls.recv(1)
    assert srv.handshake_error is not None
    assert srv.peer_cn is None


def test_untrusted_client_ca_fails(certs):
    """A client identity minted by an unrelated CA must be rejected by
    the broker's client-cert verification (RequireAndVerifyClientCert)."""
    opts = _tls_options(certs, with_ca=True, client="evil_client")
    ctx = ssl_context_from_options(opts)
    with MTLSListener(certs) as srv:
        with pytest.raises((ssl.SSLError, ConnectionError)):
            with socket.create_connection(("127.0.0.1", srv.port), 5) as s:
                with ctx.wrap_socket(s, server_hostname="127.0.0.1") as tls:
                    tls.recv(1)
    assert srv.peer_cn is None


def test_mtls_handshake_succeeds_end_to_end(certs):
    """'Try to actually work': full chain — client cert + key + CA wired
    through kafka_sink_options -> real mutual handshake -> the listener
    verifies and reports the client CN -> application bytes flow."""
    opts = _tls_options(certs, with_ca=True)
    assert opts["kafka.security.protocol"] == "SSL"
    assert opts["kafka.ssl.keystore.type"] == "PEM"
    ctx = ssl_context_from_options(opts)
    with MTLSListener(certs) as srv:
        with socket.create_connection(("127.0.0.1", srv.port), 5) as s:
            with ctx.wrap_socket(s, server_hostname="127.0.0.1") as tls:
                assert tls.version() is not None  # handshake completed
                assert tls.recv(1) == b"\x01"
                tls.sendall(b"\x00")
    assert srv.handshake_error is None
    assert srv.peer_cn == "stub-test-client"
