"""caching_sha2_password — MySQL 8's default auth plugin.

Covers: RSA full-auth over plaintext, cleartext full-auth over TLS,
the digest-cache fast path on reconnect, wrong-password 1045 on both
legs, and Protocol::AuthSwitchRequest when client and server plugins
disagree.  This is the first thing the reference hits against a stock
MySQL 8 through go-sql-driver.
"""

from __future__ import annotations

import socket

import pytest

from ticdc_spark.codec import mysql_wire as mw
from ticdc_spark.sinks.mysql_client import MySQLConn
from ticdc_spark.sinks.mysql_server import MiniMySQLServer


def test_scramble_and_cache_verify_roundtrip():
    nonce = bytes(range(1, 21))
    tok = mw.caching_sha2_scramble("secret", nonce)
    assert len(tok) == 32
    digest = mw.caching_sha2_digest("secret")
    assert mw.verify_caching_sha2_cached(digest, nonce, tok)
    assert not mw.verify_caching_sha2_cached(digest, nonce, b"\x00" * 32)
    assert not mw.verify_caching_sha2_cached(
        mw.caching_sha2_digest("other"), nonce, tok)


def test_rsa_password_leg_roundtrip():
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import rsa

    priv = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    pub_pem = priv.public_key().public_bytes(
        serialization.Encoding.PEM,
        serialization.PublicFormat.SubjectPublicKeyInfo)
    nonce = bytes(range(20, 0, -1))
    blob = mw.rsa_encrypt_password(pub_pem, "s3cret!", nonce)
    assert mw.rsa_decrypt_password(priv, blob, nonce) == "s3cret!"


def test_full_auth_rsa_then_fast_path_cache():
    with MiniMySQLServer() as s:  # caching_sha2 is the default
        assert s.auth_plugin == mw.AUTH_PLUGIN_CACHING_SHA2
        assert s._sha2_cache == {}
        # first connection: cache miss -> perform_full_authentication
        # over plaintext -> RSA public-key leg
        with MySQLConn("127.0.0.1", s.port, "root", "secret") as c:
            assert c.query("SELECT 1 AS one").rows == [[1]]
        assert "root" in s._sha2_cache  # full auth populated the cache
        digest = s._sha2_cache["root"]
        # second connection: fast path (cache must not be re-written)
        with MySQLConn("127.0.0.1", s.port, "root", "secret") as c:
            assert c.query("SELECT 2 AS two").rows == [[2]]
        assert s._sha2_cache["root"] == digest


def test_full_auth_cleartext_over_tls():
    with MiniMySQLServer(tls=True) as s:
        with MySQLConn("127.0.0.1", s.port, "root", "secret",
                       tls_ca=s.ca_pem) as c:
            assert c.query("SELECT 3 AS three").rows == [[3]]
        assert "root" in s._sha2_cache


def test_wrong_password_1045_both_legs():
    with MiniMySQLServer() as s:
        # RSA leg
        with pytest.raises(mw.MySQLError) as e:
            MySQLConn("127.0.0.1", s.port, "root", "wrong")
        assert e.value.code == 1045
        # prime the cache, then wrong password against the fast path:
        # fast verify fails -> full auth -> 1045
        with MySQLConn("127.0.0.1", s.port, "root", "secret"):
            pass
        with pytest.raises(mw.MySQLError) as e:
            MySQLConn("127.0.0.1", s.port, "root", "still-wrong")
        assert e.value.code == 1045
    with MiniMySQLServer(tls=True) as s:
        with pytest.raises(mw.MySQLError) as e:
            MySQLConn("127.0.0.1", s.port, "root", "nope", tls_ca=s.ca_pem)
        assert e.value.code == 1045


def test_auth_switch_request_to_server_default():
    """A client that answers with mysql_native_password against a
    caching_sha2 server gets an AuthSwitchRequest and re-scrambles."""
    with MiniMySQLServer() as s:
        sock = socket.create_connection(("127.0.0.1", s.port), timeout=10)
        try:
            _, payload = mw.read_packet(sock)
            hs = mw.dec_handshake_v10(payload)
            assert hs["auth_plugin"] == mw.AUTH_PLUGIN_CACHING_SHA2
            # deliberately respond with the OTHER plugin
            mw.write_packet(sock, 1, mw.enc_handshake_response41(
                "root", "secret", hs["nonce"], None,
                mw.CLIENT_PROTOCOL_41 | mw.CLIENT_SECURE_CONNECTION
                | mw.CLIENT_PLUGIN_AUTH, plugin=mw.AUTH_PLUGIN))
            seq_in, payload = mw.read_packet(sock)
            assert payload[:1] == b"\xfe"
            plugin, new_nonce = mw.dec_auth_switch_request(payload)
            assert plugin == mw.AUTH_PLUGIN_CACHING_SHA2
            mw.write_packet(sock, seq_in + 1,
                            mw.caching_sha2_scramble("secret", new_nonce))
            seq_in, payload = mw.read_packet(sock)
            # cache may be cold -> full auth; drive the RSA leg
            if payload[:1] == b"\x01" and payload[1] == mw.SHA2_PERFORM_FULL_AUTH:
                seq = mw.write_packet(sock, seq_in + 1,
                                      bytes([mw.SHA2_REQUEST_PUBLIC_KEY]))
                s_in, key_payload = mw.read_packet(sock)
                assert key_payload[:1] == b"\x01"
                mw.write_packet(sock, s_in + 1, mw.rsa_encrypt_password(
                    key_payload[1:], "secret", new_nonce))
                _, payload = mw.read_packet(sock)
            elif payload[:1] == b"\x01" and payload[1] == mw.SHA2_FAST_AUTH_SUCCESS:
                _, payload = mw.read_packet(sock)
            assert payload[:1] == b"\x00"  # OK
        finally:
            sock.close()


def test_native_password_server_still_supported():
    with MiniMySQLServer(auth_plugin="mysql_native_password") as s:
        with MySQLConn("127.0.0.1", s.port, "root", "secret") as c:
            assert c.query("SELECT 4 AS four").rows == [[4]]
