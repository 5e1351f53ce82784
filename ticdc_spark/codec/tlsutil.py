"""TLS material + contexts for the live wire endpoints.

The reference's connectors all take a full credential triple —
`Credential{CAPath, CertPath, KeyPath}` (pkg/security/credential.go) —
meaning: verify the peer against CAPath, and present CertPath/KeyPath
as our own identity (mutual TLS when the server demands it).  This
module mirrors that shape with in-memory PEMs:

- :func:`make_ca` — a self-signed CA.
- :func:`issue_cert` — a CA-signed leaf (server leaf carries an IP/DNS
  SAN; client leaf carries clientAuth EKU).
- :func:`server_context` — server side; pass ``client_ca_pem`` to
  require and verify client certificates (mTLS).
- :func:`client_context` — client side; hostname verification is ON
  (the server leafs carry a proper IP SAN); pass cert/key to present a
  client identity.

:func:`make_self_signed` (a leaf that is its own CA) is kept for the
single-sided listeners.
"""

from __future__ import annotations

import datetime
import ipaddress
import os
import ssl
import tempfile


def _ec_key():
    from cryptography.hazmat.primitives.asymmetric import ec
    return ec.generate_private_key(ec.SECP256R1())


def _pem(cert, key) -> tuple[bytes, bytes]:
    from cryptography.hazmat.primitives import serialization
    cert_pem = cert.public_bytes(serialization.Encoding.PEM)
    key_pem = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    )
    return cert_pem, key_pem


_NOT_BEFORE = datetime.datetime(2020, 1, 1)
_NOT_AFTER = datetime.datetime(2050, 1, 1)


def _san_for(hostname: str):
    from cryptography import x509
    try:
        return x509.SubjectAlternativeName(
            [x509.IPAddress(ipaddress.ip_address(hostname))])
    except ValueError:
        return x509.SubjectAlternativeName([x509.DNSName(hostname)])


def make_self_signed(hostname: str = "127.0.0.1") -> tuple[bytes, bytes]:
    """-> (cert_pem, key_pem) for a self-signed server cert with an IP SAN
    (the cert doubles as its own CA for pin-style verification)."""
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes
    from cryptography.x509.oid import NameOID

    key = _ec_key()
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, hostname)])
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(_NOT_BEFORE)
        .not_valid_after(_NOT_AFTER)
        .add_extension(_san_for(hostname), critical=False)
        .add_extension(x509.BasicConstraints(ca=True, path_length=None),
                       critical=True)
        .sign(key, hashes.SHA256())
    )
    return _pem(cert, key)


def make_ca(common_name: str = "ticdc-spark-test-ca") -> tuple[bytes, bytes]:
    """-> (ca_cert_pem, ca_key_pem): a self-signed signing CA."""
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes
    from cryptography.x509.oid import NameOID

    key = _ec_key()
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, common_name)])
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(_NOT_BEFORE)
        .not_valid_after(_NOT_AFTER)
        .add_extension(x509.BasicConstraints(ca=True, path_length=0),
                       critical=True)
        .add_extension(x509.KeyUsage(
            digital_signature=True, key_cert_sign=True, crl_sign=True,
            content_commitment=False, key_encipherment=False,
            data_encipherment=False, key_agreement=False,
            encipher_only=False, decipher_only=False), critical=True)
        .sign(key, hashes.SHA256())
    )
    return _pem(cert, key)


def issue_cert(ca_cert_pem: bytes, ca_key_pem: bytes,
               hostname: str = "127.0.0.1",
               client: bool = False) -> tuple[bytes, bytes]:
    """CA-signed leaf. ``client=False`` -> server cert with an IP/DNS SAN
    and serverAuth EKU; ``client=True`` -> client cert with clientAuth EKU
    (CN = hostname arg, which then names the client identity)."""
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.x509.oid import ExtendedKeyUsageOID, NameOID

    ca_cert = x509.load_pem_x509_certificate(ca_cert_pem)
    ca_key = serialization.load_pem_private_key(ca_key_pem, password=None)
    key = _ec_key()
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, hostname)])
    eku = (ExtendedKeyUsageOID.CLIENT_AUTH if client
           else ExtendedKeyUsageOID.SERVER_AUTH)
    b = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(ca_cert.subject)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(_NOT_BEFORE)
        .not_valid_after(_NOT_AFTER)
        .add_extension(x509.BasicConstraints(ca=False, path_length=None),
                       critical=True)
        .add_extension(x509.ExtendedKeyUsage([eku]), critical=False)
    )
    if not client:
        b = b.add_extension(_san_for(hostname), critical=False)
    cert = b.sign(ca_key, hashes.SHA256())
    return _pem(cert, key)


def _park(*pems: bytes) -> list[str]:
    """ssl's load_* APIs want files; park PEMs in a private tempdir."""
    d = tempfile.mkdtemp(prefix="tls-")
    paths = []
    for i, pem in enumerate(pems):
        p = os.path.join(d, f"{i}.pem")
        with open(p, "wb") as f:
            f.write(pem)
        paths.append(p)
    return paths


def server_context(cert_pem: bytes, key_pem: bytes,
                   client_ca_pem: bytes | None = None) -> ssl.SSLContext:
    """Server context.  With ``client_ca_pem``, the listener demands and
    verifies a client certificate chained to that CA (mutual TLS — the
    CertPath/KeyPath half of the reference's Credential)."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    cert_path, key_path = _park(cert_pem, key_pem)
    ctx.load_cert_chain(cert_path, key_path)
    if client_ca_pem is not None:
        ctx.load_verify_locations(cadata=client_ca_pem.decode())
        ctx.verify_mode = ssl.CERT_REQUIRED
    return ctx


def mutual_server_material(host: str) -> tuple[bytes, bytes, ssl.SSLContext]:
    """One-call mTLS listener setup: a fresh CA, a CA-signed server leaf,
    and a server context that REQUIRES client certs chained to that CA.
    -> (ca_cert_pem, ca_key_pem, ctx); mint client identities with
    issue_cert(ca_cert, ca_key, name, client=True)."""
    ca_cert, ca_key = make_ca()
    cert_pem, key_pem = issue_cert(ca_cert, ca_key, host)
    return ca_cert, ca_key, server_context(cert_pem, key_pem,
                                           client_ca_pem=ca_cert)


def client_context(ca_pem: bytes, cert_pem: bytes | None = None,
                   key_pem: bytes | None = None) -> ssl.SSLContext:
    """Verifying client context pinned to the given CA — the `ca-path`
    option's semantics (no system trust store).  Hostname verification
    stays ON: server leafs carry a real IP/DNS SAN, so a CA-signed cert
    for a different identity is rejected.  Pass cert/key to present a
    client certificate for mTLS listeners."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.load_verify_locations(cadata=ca_pem.decode())
    ctx.check_hostname = True
    ctx.verify_mode = ssl.CERT_REQUIRED
    if cert_pem is not None:
        if key_pem is None:
            raise ValueError("client cert requires key_pem")
        cert_path, key_path = _park(cert_pem, key_pem)
        ctx.load_cert_chain(cert_path, key_path)
    return ctx


def insecure_client_context(cert_pem: bytes | None = None,
                            key_pem: bytes | None = None) -> ssl.SSLContext:
    """insecure-skip-verify client context (`pkg/config/sink.go:494`;
    sarama's tls.Config.InsecureSkipVerify, `sarama_config.go:112`):
    TLS transport with NO chain or hostname verification — the
    reference only honors the knob when enable-tls is already on
    (`pkg/sink/kafka/options.go:423-425`).  Still presents a client
    certificate when given (mTLS listeners verify the CLIENT even if
    the client skips verifying the server)."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.check_hostname = False
    ctx.verify_mode = ssl.CERT_NONE
    if cert_pem is not None:
        if key_pem is None:
            raise ValueError("client cert requires key_pem")
        cert_path, key_path = _park(cert_pem, key_pem)
        ctx.load_cert_chain(cert_path, key_path)
    return ctx
