"""Pulsar auth parity: basic + mTLS-authentication providers and the
reference's provider priority (`pkg/sink/pulsar/factory.go:95-125`
setupAuthentication: token > token-from-file > basic > oauth2 > tls;
config keys `pkg/config/sink.go:643-657`)."""

from __future__ import annotations

import ssl

import pytest

from ticdc_spark.config import parse_changefeed_config, pulsar_auth
from ticdc_spark.sinks.pulsar_broker import PulsarBroker
from ticdc_spark.sinks.pulsar_client import PulsarConn


def _cfg(pulsar_block: str) -> str:
    return ('sink-uri = "pulsar://h:6650/cdc?protocol=canal-json"\n'
            "[sink.pulsar-config]\n" + pulsar_block)


def test_priority_token_beats_basic():
    cfg = parse_changefeed_config(_cfg(
        'authentication-token = "tok"\n'
        'basic-user-name = "u"\nbasic-password = "p"\n'))
    assert pulsar_auth(cfg) == {"token": "tok"}


def test_priority_basic_beats_oauth2_and_tls(tmp_path):
    cfg = parse_changefeed_config(_cfg(
        'basic-user-name = "u"\nbasic-password = "p"\n'
        'auth-tls-certificate-path = "/c"\n'
        'auth-tls-private-key-path = "/k"\n'))
    assert pulsar_auth(cfg) == {"basic": {"user": "u", "password": "p"}}


def test_priority_oauth2_beats_tls(tmp_path):
    key = tmp_path / "creds.json"
    key.write_text('{"client_id": "c", "client_secret": "s"}')
    cfg = parse_changefeed_config(_cfg(
        'auth-tls-certificate-path = "/c"\n'
        'auth-tls-private-key-path = "/k"\n'
        "[sink.pulsar-config.oauth2]\n"
        'oauth2-issuer-url = "http://i"\n'
        'oauth2-audience = "a"\n'
        'oauth2-client-id = "c"\n'
        f'oauth2-private-key = "{key}"\n'))
    assert "oauth2" in pulsar_auth(cfg)


def test_tls_is_last_priority_and_needs_both_paths():
    cfg = parse_changefeed_config(_cfg(
        'auth-tls-certificate-path = "/c"\n'
        'auth-tls-private-key-path = "/k"\n'))
    assert pulsar_auth(cfg) == {"tls": {"certificate_path": "/c",
                                        "private_key_path": "/k"}}
    # one path alone is NOT tls auth (the reference's nil-pointer AND)
    half = parse_changefeed_config(_cfg(
        'auth-tls-certificate-path = "/c"\n'))
    assert pulsar_auth(half) == {}


def test_basic_needs_both_fields():
    cfg = parse_changefeed_config(_cfg('basic-user-name = "u"\n'))
    assert pulsar_auth(cfg) == {}


def test_live_basic_roundtrip_and_refusals():
    with PulsarBroker(basic_users={"u": "secret"}) as b:
        conn = PulsarConn.from_service_url(
            b.service_url, basic={"user": "u", "password": "secret"})
        pid = conn.create_producer("t")
        conn.send(pid, b"v", partition_key="k")
        assert b.topic_size("t") == 1
        conn.close()
        # wrong password refused
        with pytest.raises(IOError, match="invalid basic"):
            PulsarConn.from_service_url(
                b.service_url, basic={"user": "u", "password": "nope"})
        # no credentials at all refused
        with pytest.raises(IOError, match="invalid basic"):
            PulsarConn.from_service_url(b.service_url)
        # token method refused on a basic broker
        with pytest.raises(IOError, match="invalid basic"):
            PulsarConn.from_service_url(b.service_url, token="u:secret")


def test_live_authtls_roundtrip_and_refusals():
    with PulsarBroker(tls=True, mutual_tls=True,
                      require_tls_auth=True) as b:
        cert, key = b.issue_client_cert("cdc")
        conn = PulsarConn.from_service_url(
            b.service_url, tls_ca=b.ca_pem, tls_client_cert=(cert, key),
            tls_auth=True)
        pid = conn.create_producer("t")
        conn.send(pid, b"v", partition_key="k")
        assert b.topic_size("t") == 1
        conn.close()
        # a trusted transport cert WITHOUT the tls auth method is refused
        with pytest.raises(IOError, match="tls authentication required"):
            PulsarConn.from_service_url(
                b.service_url, tls_ca=b.ca_pem, tls_client_cert=(cert, key))
        # no client certificate: the mTLS handshake itself fails
        with pytest.raises((ssl.SSLError, OSError)):
            PulsarConn.from_service_url(
                b.service_url, tls_ca=b.ca_pem, tls_auth=True)


def test_require_tls_auth_demands_mutual_tls():
    with pytest.raises(ValueError, match="mutual_tls"):
        PulsarBroker(require_tls_auth=True)


def test_pulsar_tuning_options_parse_and_reach_the_wire():
    """[sink.pulsar-config] client tuning (`pkg/config/sink.go:615-643`;
    defaults `pkg/sink/pulsar/config.go:25-38`): batching-max-messages
    caps the per-SEND batch (one broker entry each), the timeouts land
    on the socket, and invalid values are refused."""
    from ticdc_spark.config import pulsar_client_options

    opts = pulsar_client_options(parse_changefeed_config(_cfg(
        "batching-max-messages = 3\nsend-timeout = 7\n"
        'pulsar-version = "3.0"\n')))
    assert opts["batching_max_messages"] == 3
    assert opts["send_timeout"] == 7
    assert opts["connection_timeout"] == 5      # reference default
    assert opts["operation_timeout"] == 30
    assert opts["batching_max_publish_delay"] == 10
    assert opts["pulsar_version"] == "3.0"
    with pytest.raises(ValueError, match="batching-max-messages"):
        pulsar_client_options(parse_changefeed_config(_cfg(
            "batching-max-messages = 0\n")))
    with PulsarBroker() as b:
        conn = PulsarConn.from_service_url(
            b.service_url, connect_timeout=5, send_timeout=7)
        assert conn.sock.gettimeout() == 7
        pid = conn.create_producer("t")
        msgs = [(f"v{i}".encode(), None) for i in range(10)]
        assert conn.send_pipelined(pid, msgs, batch_size=3) == 10
        assert b.topic_size("t") == 4  # ceil(10/3) entries
        conn.close()
