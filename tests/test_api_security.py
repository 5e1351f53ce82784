"""Control-plane API security: HTTPS, mTLS, and client-user auth.

Reference: the open API serves over TLS with optional mTLS
(`pkg/config/server.go:112-124` Security.MTLS) and, with
``client-user-required``, gates every route behind Basic auth verified
against the upstream (`api/middleware/authenticate_middleware.go:33-78`
— allowed-list check, then a credentialed dial of upstream TiDB).
Config validation: enabling the gate with an empty allowed list is an
error (`pkg/config/server.go:251-254`). E2e models:
`http_api_tls_with_user_auth`, `cli_with_auth`.

The upstream password dial here IS a real credentialed connect — a
MiniMySQLServer plays upstream TiDB, exactly the reference's "verify by
building a connection" trick.
"""

from __future__ import annotations

import ssl
import urllib.error

import pytest

from ticdc_spark.api import ApiServer
from ticdc_spark.client import ApiClient, ApiError
from ticdc_spark.codec import tlsutil
from ticdc_spark.streaming.registry import ChangefeedRegistry


def _registry(tmp_path):
    return ChangefeedRegistry(str(tmp_path / "reg"))


def test_client_user_required_demands_allowed_list(tmp_path):
    with pytest.raises(ValueError, match="client-allowed-user"):
        ApiServer(_registry(tmp_path), client_user_required=True)


def test_https_round_trip_and_wrong_ca_rejected(tmp_path):
    srv = ApiServer(_registry(tmp_path), tls=True)
    port = srv.start()
    try:
        url = f"https://127.0.0.1:{port}"
        assert ApiClient(url, ca_pem=srv.ca_pem).health()
        # a client pinned to a DIFFERENT CA must refuse the server
        other_ca, _ = tlsutil.make_ca("other-ca")
        with pytest.raises(urllib.error.URLError):
            ApiClient(url, timeout_s=5, ca_pem=other_ca).health()
        # plaintext client against the TLS port fails outright
        with pytest.raises(Exception):
            ApiClient(f"http://127.0.0.1:{port}", timeout_s=5).health()
    finally:
        srv.stop()


def test_mutual_tls_requires_client_cert(tmp_path):
    srv = ApiServer(_registry(tmp_path), tls=True, mutual_tls=True)
    port = srv.start()
    try:
        url = f"https://127.0.0.1:{port}"
        cert, key = srv.issue_client_cert("cli-user")
        assert ApiClient(url, ca_pem=srv.ca_pem, cert_pem=cert,
                         key_pem=key).health()
        with pytest.raises((urllib.error.URLError, ssl.SSLError,
                            ConnectionError, OSError)):
            ApiClient(url, timeout_s=5, ca_pem=srv.ca_pem).health()
    finally:
        srv.stop()


def _upstream_verify(host, port):
    """The reference's verifyTiDBUser: try to BUILD a connection with
    the credentials (`authenticate_middleware.go:81-110`)."""
    def check(user: str, password: str) -> bool:
        from ticdc_spark.sinks.mysql_client import MySQLConn

        try:
            MySQLConn(host, port, user, password).close()
            return True
        except Exception:
            return False
    return check


def test_user_auth_against_live_upstream(tmp_path):
    from ticdc_spark.sinks.mysql_live import start_server

    upstream = start_server(user="cdc_admin", password="s3cret")
    srv = ApiServer(
        _registry(tmp_path), tls=True,
        client_user_required=True, client_allowed_user=["cdc_admin"],
        verify_password=_upstream_verify(upstream.host, upstream.port))
    port = srv.start()
    try:
        url = f"https://127.0.0.1:{port}"
        ok = ApiClient(url, ca_pem=srv.ca_pem, user="cdc_admin",
                       password="s3cret")
        assert ok.health()
        assert ok.changefeeds.list() == []  # routed past the gate

        # no credentials at all -> 401 with the reference's message
        with pytest.raises(ApiError) as ei:
            ApiClient(url, ca_pem=srv.ca_pem).health()
        assert ei.value.status == 401
        assert "authorization header" in str(ei.value)

        # user not in the allowed list -> 401 "not allowed"
        with pytest.raises(ApiError) as ei:
            ApiClient(url, ca_pem=srv.ca_pem, user="mallory",
                      password="s3cret").health()
        assert ei.value.status == 401
        assert "not allowed" in str(ei.value)

        # empty username has its own message
        with pytest.raises(ApiError) as ei:
            ApiClient(url, ca_pem=srv.ca_pem, user="",
                      password="x").health()
        assert "Empty username" in str(ei.value)

        # allowed user, wrong password -> upstream dial fails -> 401
        with pytest.raises(ApiError) as ei:
            ApiClient(url, ca_pem=srv.ca_pem, user="cdc_admin",
                      password="wrong").health()
        assert ei.value.status == 401
        assert "upstream" in str(ei.value)

        # POST with a body on the denied path must not desync keep-alive:
        # two calls on fresh clients both answer cleanly
        for _ in range(2):
            with pytest.raises(ApiError):
                ApiClient(url, ca_pem=srv.ca_pem, user="mallory",
                          password="pw").changefeeds.create(
                    "cf-x", 'sink-uri = "blackhole://"')
    finally:
        srv.stop()
        upstream.stop()


def test_cli_auth_flags(tmp_path, capsys):
    from ticdc_spark import cli

    srv = ApiServer(
        _registry(tmp_path), tls=True,
        client_user_required=True, client_allowed_user=["ops"],
        verify_password=lambda u, p: p == "pw")
    port = srv.start()
    ca_path = tmp_path / "ca.pem"
    ca_path.write_bytes(srv.ca_pem)
    try:
        base = ["--server", f"https://127.0.0.1:{port}",
                "--ca", str(ca_path)]
        rc = cli.main([*base, "--user", "ops", "--password", "pw",
                       "changefeed", "list"])
        assert rc == 0
        rc = cli.main([*base, "--user", "ops", "--password", "nope",
                       "changefeed", "list"])
        assert rc == 1
    finally:
        srv.stop()
