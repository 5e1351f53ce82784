"""SCRAM-SHA-256 (RFC 5802 / RFC 7677) — client and server sides.

The SASL mechanism the reference's Kafka config exposes
(`pkg/sink/kafka/sarama_config.go` SASL mechanisms: PLAIN,
SCRAM-SHA-256, SCRAM-SHA-512); used by codec/kafka_wire.py's
SaslAuthenticate exchange. Implemented from the RFCs; the RFC 7677
example exchange is pinned in tests.
"""

from __future__ import annotations

import base64
import hashlib
import hmac

# SCRAM-SHA-512 is the same algebra over sha512 (RFC 5802 §3 is
# hash-agnostic); every entry point takes algo="sha256"|"sha512"


def _h(data: bytes, algo: str = "sha256") -> bytes:
    return hashlib.new(algo, data).digest()


def _hmac(key: bytes, msg: bytes, algo: str = "sha256") -> bytes:
    return hmac.new(key, msg, algo).digest()


def _xor(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


def salted_password(password: str, salt: bytes, iterations: int,
                    algo: str = "sha256") -> bytes:
    return hashlib.pbkdf2_hmac(algo, password.encode("utf-8"), salt, iterations)


def saslname_escape(name: str) -> str:
    """RFC 5802 §5.1 saslname encoding: ',' -> =2C, '=' -> =3D (in that
    attribute-value position a raw ',' or '=' would break parsing)."""
    return name.replace("=", "=3D").replace(",", "=2C")


def saslname_unescape(name: str) -> str:
    """Inverse of :func:`saslname_escape`; a '=' not starting =2C/=3D is
    a protocol error per RFC 5802."""
    rest = name
    while "=" in rest:
        i = rest.index("=")
        if rest[i:i + 3] not in ("=2C", "=3D"):
            raise ValueError(f"malformed saslname: {name!r}")
        rest = rest[i + 3:]
    return name.replace("=2C", ",").replace("=3D", "=")


def client_first_message(username: str, client_nonce: str) -> str:
    # gs2 header "n,," = no channel binding
    return f"n,,n={saslname_escape(username)},r={client_nonce}"


def server_first_message(client_first: str, server_nonce_ext: str,
                         salt: bytes, iterations: int) -> str:
    client_nonce = dict(
        p.split("=", 1) for p in client_first.split(",")[2:])["r"]
    return (f"r={client_nonce}{server_nonce_ext},"
            f"s={base64.b64encode(salt).decode()},i={iterations}")


def _auth_message(client_first: str, server_first: str, channel_binding: str) -> str:
    client_first_bare = client_first.split(",", 2)[2]
    client_final_without_proof = (
        f"c={channel_binding},r=" + dict(
            p.split("=", 1) for p in server_first.split(","))["r"])
    return ",".join([client_first_bare, server_first, client_final_without_proof])


def client_final_message(client_first: str, server_first: str,
                         password: str, algo: str = "sha256") -> tuple[str, bytes]:
    """-> (client-final-message, expected ServerSignature)."""
    attrs = dict(p.split("=", 1) for p in server_first.split(","))
    salt = base64.b64decode(attrs["s"])
    iterations = int(attrs["i"])
    sp = salted_password(password, salt, iterations, algo)
    client_key = _hmac(sp, b"Client Key", algo)
    stored_key = _h(client_key, algo)
    cb = base64.b64encode(b"n,,").decode()
    auth_msg = _auth_message(client_first, server_first, cb).encode("utf-8")
    proof = _xor(client_key, _hmac(stored_key, auth_msg, algo))
    server_key = _hmac(sp, b"Server Key", algo)
    server_sig = _hmac(server_key, auth_msg, algo)
    final = (f"c={cb},r={attrs['r']},p={base64.b64encode(proof).decode()}")
    return final, server_sig


def server_verify_final(client_first: str, server_first: str,
                        client_final: str, password: str,
                        algo: str = "sha256") -> tuple[bool, str]:
    """Server side: verify the proof; -> (ok, server-final-message)."""
    attrs = dict(p.split("=", 1) for p in server_first.split(","))
    salt = base64.b64decode(attrs["s"])
    iterations = int(attrs["i"])
    fattrs = dict(p.split("=", 1) for p in client_final.split(",", 2)
                  if "=" in p)
    sp = salted_password(password, salt, iterations, algo)
    client_key = _hmac(sp, b"Client Key", algo)
    stored_key = _h(client_key, algo)
    auth_msg = _auth_message(client_first, server_first, fattrs["c"]).encode("utf-8")
    expect_proof = _xor(client_key, _hmac(stored_key, auth_msg, algo))
    ok = hmac.compare_digest(expect_proof, base64.b64decode(fattrs["p"]))
    # nonce must match what the server issued
    ok = ok and fattrs["r"] == attrs["r"]
    server_key = _hmac(sp, b"Server Key", algo)
    server_sig = _hmac(server_key, auth_msg, algo)
    return ok, "v=" + base64.b64encode(server_sig).decode()


def client_check_server_final(server_final: str, expected_sig: bytes) -> bool:
    return hmac.compare_digest(
        base64.b64decode(server_final.split("v=", 1)[1]), expected_sig)
