"""Self-signed CA / server / client certificate mint for loopback TLS
tests — the stdlib-`ssl` analog of the reference's testdata PEMs
(tls_test.go:18-248 runs real localhost handshakes against self-signed
certs checked into testdata/).

Everything is generated fresh per test run (no PEMs in the tree, no
expiry bombs) with SAN = IP:127.0.0.1 + DNS:localhost so hostname
verification passes on loopback.
"""

from __future__ import annotations

import datetime
import ipaddress
from pathlib import Path

from cryptography import x509
from cryptography.hazmat.primitives import hashes, serialization
from cryptography.hazmat.primitives.asymmetric import rsa
from cryptography.x509.oid import ExtendedKeyUsageOID, NameOID


def _key():
    return rsa.generate_private_key(public_exponent=65537, key_size=2048)


def _write_key(path: Path, key) -> None:
    path.write_bytes(
        key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption(),
        )
    )


def _write_cert(path: Path, cert) -> None:
    path.write_bytes(cert.public_bytes(serialization.Encoding.PEM))


def _name(cn: str) -> x509.Name:
    return x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, cn)])


def _build(
    subject, issuer, pubkey, signing_key, *, is_ca: bool, san=None, eku=None
):
    now = datetime.datetime.now(datetime.timezone.utc)
    builder = (
        x509.CertificateBuilder()
        .subject_name(subject)
        .issuer_name(issuer)
        .public_key(pubkey)
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=1))
        .add_extension(x509.BasicConstraints(ca=is_ca, path_length=None), critical=True)
    )
    if san:
        builder = builder.add_extension(x509.SubjectAlternativeName(san), critical=False)
    if eku:
        # ExtKeyUsage exactly as tls_test.go mints them (ServerAuth on
        # the host cert, ClientAuth on the client cert) — OpenSSL
        # enforces certificate purpose, so presenting the host cert as
        # a client identity fails the handshake like Go's
        # 'wrong type of cert' case
        builder = builder.add_extension(x509.ExtendedKeyUsage(eku), critical=False)
    return builder.sign(signing_key, hashes.SHA256())


def mint(tmp_path: Path) -> dict[str, str]:
    """Mint ca/server/client key+cert PEMs under ``tmp_path``; also an
    UNRELATED second CA ('evil_ca') for the wrong-trust-anchor failure
    mode. Returns {name: path} with keys ca_cert, server_cert,
    server_key, client_cert, client_key, evil_ca_cert, evil_client_cert,
    evil_client_key."""
    out: dict[str, str] = {}
    san = [
        x509.IPAddress(ipaddress.ip_address("127.0.0.1")),
        x509.DNSName("localhost"),
    ]

    ca_key = _key()
    ca_cert = _build(
        _name("stub-test-ca"), _name("stub-test-ca"),
        ca_key.public_key(), ca_key, is_ca=True,
    )

    server_key = _key()
    server_cert = _build(
        _name("127.0.0.1"), _name("stub-test-ca"),
        server_key.public_key(), ca_key, is_ca=False, san=san,
        eku=[ExtendedKeyUsageOID.SERVER_AUTH],
    )

    client_key = _key()
    client_cert = _build(
        _name("stub-test-client"), _name("stub-test-ca"),
        client_key.public_key(), ca_key, is_ca=False,
        eku=[ExtendedKeyUsageOID.CLIENT_AUTH],
    )

    # a second, unrelated CA + client identity: presenting this cert to
    # a server that trusts only stub-test-ca must fail the handshake
    evil_ca_key = _key()
    evil_ca_cert = _build(
        _name("evil-ca"), _name("evil-ca"),
        evil_ca_key.public_key(), evil_ca_key, is_ca=True,
    )
    evil_client_key = _key()
    evil_client_cert = _build(
        _name("evil-client"), _name("evil-ca"),
        evil_client_key.public_key(), evil_ca_key, is_ca=False,
        eku=[ExtendedKeyUsageOID.CLIENT_AUTH],
    )

    for name, obj, writer in [
        ("ca_cert", ca_cert, _write_cert),
        ("server_cert", server_cert, _write_cert),
        ("server_key", server_key, _write_key),
        ("client_cert", client_cert, _write_cert),
        ("client_key", client_key, _write_key),
        ("evil_ca_cert", evil_ca_cert, _write_cert),
        ("evil_client_cert", evil_client_cert, _write_cert),
        ("evil_client_key", evil_client_key, _write_key),
    ]:
        p = tmp_path / f"{name}.pem"
        writer(p, obj)
        out[name] = str(p)
    return out
