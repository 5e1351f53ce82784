"""S3 REST endpoint + SigV4: official vector, CRUD, pagination, auth."""

import hashlib
import hmac

import pytest

from ticdc_spark.codec import awssig
from ticdc_spark.sinks.s3_client import S3Client, S3Error
from ticdc_spark.sinks.s3_server import MiniS3Server


def test_sigv4_official_aws_vector():
    """The documented AWS example: IAM ListUsers, 20150830, us-east-1."""
    headers = {
        "content-type": "application/x-www-form-urlencoded; charset=utf-8",
        "host": "iam.amazonaws.com",
        "x-amz-date": "20150830T123600Z",
    }
    canon = awssig.canonical_request(
        "GET", "/", "Action=ListUsers&Version=2010-05-08", headers,
        ["content-type", "host", "x-amz-date"],
        hashlib.sha256(b"").hexdigest())
    assert hashlib.sha256(canon.encode()).hexdigest() == (
        "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59")
    sts = "\n".join(["AWS4-HMAC-SHA256", "20150830T123600Z",
                     "20150830/us-east-1/iam/aws4_request",
                     hashlib.sha256(canon.encode()).hexdigest()])
    key = awssig.signing_key("wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
                             "20150830", "us-east-1", "iam")
    assert hmac.new(key, sts.encode(), hashlib.sha256).hexdigest() == (
        "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")


def test_sigv4_sign_verify_roundtrip():
    headers = {"host": "127.0.0.1:9999"}
    auth, payload_hash = awssig.sign(
        "PUT", "/b/some key.csv", "", headers, b"body",
        "AK", "SK", "20260101T000000Z")
    full = {"host": "127.0.0.1:9999", "x-amz-date": "20260101T000000Z",
            "x-amz-content-sha256": payload_hash}
    assert awssig.verify("PUT", "/b/some key.csv", "", full, auth, "SK")
    assert not awssig.verify("PUT", "/b/some key.csv", "", full, auth, "OTHER")
    assert not awssig.verify("PUT", "/b/OTHER", "", full, auth, "SK")
    info = awssig.parse_authorization(auth)
    assert info["access_key"] == "AK" and info["service"] == "s3"


@pytest.fixture()
def s3():
    with MiniS3Server() as srv:
        with S3Client(srv.endpoint, srv.access_key, srv.secret_key) as c:
            yield srv, c


def test_put_get_head_delete(s3):
    srv, c = s3
    etag = c.put_object("cdc", "a/b/f.csv", b"1,2\n")
    assert etag == '"%s"' % hashlib.md5(b"1,2\n").hexdigest()
    assert c.get_object("cdc", "a/b/f.csv") == b"1,2\n"
    assert c.head_object("cdc", "a/b/f.csv") == 4
    c.delete_object("cdc", "a/b/f.csv")
    with pytest.raises(S3Error) as ei:
        c.get_object("cdc", "a/b/f.csv")
    assert ei.value.status == 404 and ei.value.code == "NoSuchKey"


def test_list_objects_paginates_with_real_tokens(s3):
    srv, c = s3
    for i in range(25):
        c.put_object("cdc", f"p/k{i:03d}", b"x")
    c.put_object("cdc", "other/k", b"y")
    got = c.list_objects("cdc", prefix="p/", max_keys=10)  # 3 pages
    assert [k for k, _ in got] == [f"p/k{i:03d}" for i in range(25)]
    assert c.list_objects("cdc", prefix="nope/") == []


def test_wrong_credentials_rejected(s3):
    srv, _ = s3
    with S3Client(srv.endpoint, srv.access_key, "bad-secret") as c:
        with pytest.raises(S3Error) as ei:
            c.put_object("cdc", "k", b"v")
        assert ei.value.status == 403
        assert ei.value.code == "SignatureDoesNotMatch"
    with S3Client(srv.endpoint, "UNKNOWN-AK", srv.secret_key) as c:
        with pytest.raises(S3Error):
            c.list_objects("cdc")


def test_tampered_payload_rejected(s3):
    """A body that doesn't match the signed x-amz-content-sha256 must 403
    (payload integrity is part of SigV4)."""
    import http.client

    srv, _ = s3
    auth, payload_hash = awssig.sign(
        "PUT", "/cdc/k", "", {"host": f"{srv.host}:{srv.port}"},
        b"original", "AKIDTEST", srv.secret_key, "20260101T000000Z")
    conn = http.client.HTTPConnection(srv.host, srv.port)
    conn.request("PUT", "/cdc/k", body=b"TAMPERED!",  # != signed payload
                 headers={"Host": f"{srv.host}:{srv.port}",
                          "x-amz-date": "20260101T000000Z",
                          "x-amz-content-sha256": payload_hash,
                          "Authorization": auth,
                          "Content-Length": "9"})
    resp = conn.getresponse()
    assert resp.status == 403
    conn.close()


def test_https_endpoint_with_pinned_ca():
    from ticdc_spark.codec.tlsutil import make_self_signed

    with MiniS3Server(tls=True) as srv:
        assert srv.endpoint.startswith("https://")
        with S3Client(srv.endpoint, srv.access_key, srv.secret_key,
                      tls_ca=srv.ca_pem) as c:
            c.put_object("cdc", "k", b"v")
            assert c.get_object("cdc", "k") == b"v"
        # wrong CA fails the handshake; missing CA fails closed
        other_ca, _ = make_self_signed()
        with pytest.raises(Exception):
            with S3Client(srv.endpoint, srv.access_key, srv.secret_key,
                          tls_ca=other_ca) as c:
                c.put_object("cdc", "k2", b"v")
        with pytest.raises(ValueError, match="needs tls_ca"):
            S3Client(srv.endpoint, srv.access_key, srv.secret_key)
