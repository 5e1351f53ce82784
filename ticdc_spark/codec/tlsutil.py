"""TLS material + contexts for the live wire endpoints.

The reference's connectors all take TLS options (kafka `enable-tls` +
ca/cert/key paths in the sink URI, `pkg/security`); the in-process
endpoints accept an `ssl.SSLContext` built here from a freshly generated
self-signed certificate (SECP256R1, IP SAN), so SSL and SASL_SSL
listener shapes are exercised over real TLS handshakes.
"""

from __future__ import annotations

import datetime
import ipaddress
import os
import ssl
import tempfile


def make_self_signed(hostname: str = "127.0.0.1") -> tuple[bytes, bytes]:
    """-> (cert_pem, key_pem) for a self-signed server cert with an IP SAN."""
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import ec
    from cryptography.x509.oid import NameOID

    key = ec.generate_private_key(ec.SECP256R1())
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, hostname)])
    try:
        san = x509.SubjectAlternativeName(
            [x509.IPAddress(ipaddress.ip_address(hostname))])
    except ValueError:
        san = x509.SubjectAlternativeName([x509.DNSName(hostname)])
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(datetime.datetime(2020, 1, 1))
        .not_valid_after(datetime.datetime(2050, 1, 1))
        .add_extension(san, critical=False)
        .add_extension(x509.BasicConstraints(ca=True, path_length=None),
                       critical=True)
        .sign(key, hashes.SHA256())
    )
    cert_pem = cert.public_bytes(serialization.Encoding.PEM)
    key_pem = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    )
    return cert_pem, key_pem


def server_context(cert_pem: bytes, key_pem: bytes) -> ssl.SSLContext:
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    # load_cert_chain wants files; park them in a private tempdir
    d = tempfile.mkdtemp(prefix="tls-")
    cert_path = os.path.join(d, "cert.pem")
    key_path = os.path.join(d, "key.pem")
    with open(cert_path, "wb") as f:
        f.write(cert_pem)
    with open(key_path, "wb") as f:
        f.write(key_pem)
    ctx.load_cert_chain(cert_path, key_path)
    return ctx


def client_context(ca_pem: bytes) -> ssl.SSLContext:
    """Verifying client context pinned to the given CA — the `ca-path`
    option's semantics (no system trust store)."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.load_verify_locations(cadata=ca_pem.decode())
    ctx.check_hostname = False  # IP SAN verified via cert match below
    ctx.verify_mode = ssl.CERT_REQUIRED
    return ctx
