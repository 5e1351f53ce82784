"""GCS JSON-API and Azure Blob REST endpoints: auth, CRUD, pagination.

The other two URI families the reference's external-storage lib speaks
(`pkg/config/sink_protocol.go:133-139`) beside s3 — dialects from the
public REST specs (Bearer/JSON with nextPageToken; SharedKey HMAC with
NextMarker XML)."""

from __future__ import annotations

import base64

import pytest

from ticdc_spark.sinks.azblob_server import (AzBlobClient,
                                             MiniAzureBlobServer, sign,
                                             string_to_sign)
from ticdc_spark.sinks.gcs_server import GCSClient, MiniGCSServer


def test_gcs_put_get_list_pagination():
    with MiniGCSServer() as s, GCSClient(s.endpoint, s.token) as c:
        keys = [f"schema=test/table=tp_{i}/2020-01-01/f{i}.csv"
                for i in range(7)]
        for i, k in enumerate(keys):
            c.put_object("cdc", k, b"line%d\n" % i)
        assert c.get_object("cdc", keys[3]) == b"line3\n"
        # maxResults=3 -> 3 pages through nextPageToken
        got = c.list_objects("cdc", max_keys=3)
        assert [k for k, _ in got] == sorted(keys)
        assert all(n == 6 for _, n in got)


def test_gcs_auth_rejections():
    with MiniGCSServer() as s:
        bad = GCSClient(s.endpoint, "not-the-token")
        with pytest.raises(IOError, match="401"):
            bad.put_object("cdc", "k", b"v")
        with pytest.raises(IOError, match="401"):
            bad.list_objects("cdc")
        bad.close()


def test_azblob_put_get_list_pagination():
    with MiniAzureBlobServer() as s, \
            AzBlobClient(s.endpoint, s.account, s.key_b64) as c:
        keys = [f"schema=test/table=tp_{i}/f{i}.csv" for i in range(5)]
        for i, k in enumerate(keys):
            c.put_object("cdc", k, b"row%d\n" % i)
        assert c.get_object("cdc", keys[2]) == b"row2\n"
        got = c.list_objects("cdc", max_keys=2)  # NextMarker pages
        assert [k for k, _ in got] == sorted(keys)


def test_azblob_sharedkey_rejections():
    with MiniAzureBlobServer() as s:
        wrong = AzBlobClient(s.endpoint, s.account,
                             base64.b64encode(b"wrong" * 6).decode())
        with pytest.raises(IOError, match="403"):
            wrong.put_object("cdc", "k", b"v")
        wrong.close()
        # tampered body invalidates nothing (body isn't signed) but a
        # tampered signed header does: replayed signature with a
        # different x-ms-date must fail
        ok = AzBlobClient(s.endpoint, s.account, s.key_b64)
        ok.put_object("cdc", "k", b"v")
        ok.x_ms_date = "Fri, 02 Jan 2026 00:00:00 GMT"
        ok.put_object("cdc", "k2", b"v2")  # re-signs with the new date
        assert ok.get_object("cdc", "k2") == b"v2"
        ok.close()


def test_azblob_string_to_sign_shape():
    """The canonical layout: 12 header fields, sorted x-ms-* block,
    /account/path + sorted query params."""
    sts = string_to_sign(
        "GET", "acct", "/cdc",
        {"restype": "container", "comp": "list"},
        {"x-ms-date": "D", "x-ms-version": "V", "Content-Length": "0"})
    lines = sts.split("\n")
    assert lines[0] == "GET"
    assert lines[3] == ""  # Content-Length 0 -> empty per 2015-02-21+
    assert "x-ms-date:D" in lines and "x-ms-version:V" in lines
    assert lines[-3:] == ["/acct/cdc", "comp:list", "restype:container"]
    assert sign("QUJD", sts)  # base64("ABC") key signs without error


def test_gcs_tls_and_mutual_tls():
    """https:// GCS endpoint with pinned CA; mutual_tls demands a
    chained client certificate (Credential triple shape)."""
    import ssl

    from ticdc_spark.codec.tlsutil import make_self_signed
    from ticdc_spark.sinks.gcs_server import GCSClient, MiniGCSServer

    with MiniGCSServer(tls=True) as srv:
        assert srv.endpoint.startswith("https://")
        with GCSClient(srv.endpoint, srv.token, tls_ca=srv.ca_pem) as c:
            c.put_object("b", "k", b"enc")
            assert c.get_object("b", "k") == b"enc"
            # the resumable-session Location URI must carry the
            # server's ACTUAL scheme — a conformant client follows the
            # absolute URL, so http:// here would downgrade TLS
            _, headers, _ = c._request_h(
                "POST", "/upload/storage/v1/b/b/o"
                        "?uploadType=resumable&name=big")
            assert headers["Location"].startswith("https://")
            c.put_object_large("b", "big", b"x" * 262144 * 2,
                               part_size=262144)
            assert c.get_object("b", "big") == b"x" * 262144 * 2
        other_ca, _ = make_self_signed()
        with pytest.raises((ssl.SSLError, IOError)):
            with GCSClient(srv.endpoint, srv.token, tls_ca=other_ca) as c:
                c.put_object("b", "k2", b"x")
    with MiniGCSServer(tls=True, mutual_tls=True) as srv:
        cert, key = srv.issue_client_cert()
        with GCSClient(srv.endpoint, srv.token, tls_ca=srv.ca_pem,
                       tls_client_cert=(cert, key)) as c:
            c.put_object("b", "k", b"m")
            assert c.get_object("b", "k") == b"m"
        # no client cert -> handshake refused
        with pytest.raises((ssl.SSLError, IOError, ConnectionError)):
            with GCSClient(srv.endpoint, srv.token,
                           tls_ca=srv.ca_pem) as c:
                c.put_object("b", "k3", b"x")


def test_azblob_tls_and_mutual_tls():
    import ssl

    from ticdc_spark.codec.tlsutil import make_self_signed
    from ticdc_spark.sinks.azblob_server import (AzBlobClient,
                                                 MiniAzureBlobServer)

    with MiniAzureBlobServer(tls=True) as srv:
        assert srv.endpoint.startswith("https://")
        with AzBlobClient(srv.endpoint, srv.account, srv.key_b64,
                          tls_ca=srv.ca_pem) as c:
            c.put_object("ct", "k", b"enc")
            assert c.get_object("ct", "k") == b"enc"
        other_ca, _ = make_self_signed()
        with pytest.raises((ssl.SSLError, IOError)):
            with AzBlobClient(srv.endpoint, srv.account, srv.key_b64,
                              tls_ca=other_ca) as c:
                c.put_object("ct", "k2", b"x")
    with MiniAzureBlobServer(tls=True, mutual_tls=True) as srv:
        cert, key = srv.issue_client_cert()
        with AzBlobClient(srv.endpoint, srv.account, srv.key_b64,
                          tls_ca=srv.ca_pem,
                          tls_client_cert=(cert, key)) as c:
            c.put_object("ct", "k", b"m")
            assert c.get_object("ct", "k") == b"m"
        with pytest.raises((ssl.SSLError, IOError, ConnectionError)):
            with AzBlobClient(srv.endpoint, srv.account, srv.key_b64,
                              tls_ca=srv.ca_pem) as c:
                c.put_object("ct", "k3", b"x")
