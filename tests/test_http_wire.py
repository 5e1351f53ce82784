"""HttpWire + pipelined storage-client paths: byte equality with the
per-item ops, ordering, windowing, and transport-error behavior."""

import socket
import threading

import pytest

from ticdc_spark.sinks.azblob_server import AzBlobClient, MiniAzureBlobServer
from ticdc_spark.sinks.gcs_server import GCSClient, MiniGCSServer
from ticdc_spark.sinks.http_wire import HttpWire
from ticdc_spark.sinks.s3_client import S3Client
from ticdc_spark.sinks.s3_server import MiniS3Server


def test_s3_pipelined_put_get_matches_per_item():
    with MiniS3Server() as srv:
        c = S3Client(srv.endpoint, srv.access_key, srv.secret_key)
        items = [(f"dir/k{i}", bytes([i % 251]) * (100 + 7 * i))
                 for i in range(40)]
        # window smaller than the batch so several pipeline flights run
        c.put_objects("b", items, max_in_flight=7)
        got = c.get_objects("b", [k for k, _ in items], max_in_flight=7)
        assert got == [v for _, v in items]
        # per-item reads see the same bytes
        assert c.get_object("b", "dir/k3") == items[3][1]
        c.close()


def test_s3_pipelined_byte_window_bounds_flight():
    with MiniS3Server() as srv:
        c = S3Client(srv.endpoint, srv.access_key, srv.secret_key)
        big = b"z" * (3 * 1024 * 1024)
        # 3 objects of 3 MiB with a 4 MiB window: one object per flight,
        # and an object bigger than the window still goes (len guard)
        c.put_objects("b", [("a", big), ("b", big), ("c", big)],
                      max_in_flight=16, max_bytes=4 * 1024 * 1024)
        assert c.get_objects("b", ["a", "b", "c"]) == [big, big, big]
        c.close()


def test_gcs_azblob_pipelined_roundtrip():
    with MiniGCSServer() as srv:
        c = GCSClient(srv.endpoint, srv.token)
        items = [(f"p/{i}.csv", f"v{i}".encode()) for i in range(9)]
        c.put_objects("b", items, max_in_flight=4)
        assert c.get_objects("b", [k for k, _ in items],
                             max_in_flight=4) == [v for _, v in items]
        c.close()
    with MiniAzureBlobServer() as srv:
        c = AzBlobClient(srv.endpoint, srv.account, srv.key_b64)
        items = [(f"p/{i}.csv", f"v{i}".encode()) for i in range(9)]
        c.put_objects("b", items, max_in_flight=4)
        assert c.get_objects("b", [k for k, _ in items],
                             max_in_flight=4) == [v for _, v in items]
        c.close()


def test_http_wire_header_lookup_and_head():
    with MiniS3Server() as srv:
        c = S3Client(srv.endpoint, srv.access_key, srv.secret_key)
        etag = c.put_object("b", "k", b"hello")
        assert etag  # ETag header parsed (original case preserved)
        assert c.head_object("b", "k") == 5  # HEAD: no body consumed
        # connection still usable after HEAD (framing didn't desync)
        assert c.get_object("b", "k") == b"hello"
        c.close()


def test_http_wire_eof_raises_connection_error():
    # a server that accepts one connection and closes it mid-response
    lsock = socket.socket()
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(1)
    port = lsock.getsockname()[1]

    def serve():
        conn, _ = lsock.accept()
        conn.recv(65536)
        conn.sendall(b"HTTP/1.1 200 OK\r\nContent-Length: 100\r\n\r\nshort")
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    w = HttpWire("127.0.0.1", port, timeout=5)
    w.request("GET", "/x")
    with pytest.raises(ConnectionError):
        w.getresponse()
    lsock.close()


def test_s3_tls_still_works_over_http_wire():
    srv = MiniS3Server(tls=True).start()
    try:
        c = S3Client(srv.endpoint, srv.access_key, srv.secret_key,
                     tls_ca=srv.ca_pem)
        c.put_object("b", "k", b"tls-bytes")
        assert c.get_objects("b", ["k"]) == [b"tls-bytes"]
        c.close()
    finally:
        srv.stop()
