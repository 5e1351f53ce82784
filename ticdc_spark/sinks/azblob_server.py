"""In-process Azure Blob endpoint speaking the Blob service REST subset
a storage sink needs (learn.microsoft.com/rest/api/storageservices —
public spec):

- Put Blob:  PUT /{container}/{blob} with x-ms-blob-type: BlockBlob
- Get Blob:  GET /{container}/{blob}
- List Blobs: GET /{container}?restype=container&comp=list&prefix=&
  maxresults=&marker=  (XML EnumerationResults with real NextMarker)

Auth: SharedKey — `Authorization: SharedKey {account}:{signature}` with
signature = HMAC-SHA256(base64-decoded key, string-to-sign) per the
2009-09-19+ Blob string-to-sign layout (VERB, content headers,
CanonicalizedHeaders = sorted x-ms-*, CanonicalizedResource =
/account/path + sorted query params).  Verified server-side; 403 on
mismatch.

Reference parity target: the azblob:// scheme of the external-storage
lib behind `pkg/config/sink_protocol.go:133-139`.  TEST endpoint — in
production the same client bytes target real Azure.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, quote, unquote, urlsplit

_XML = 'application/xml'


def string_to_sign(method: str, account: str, path: str,
                   query: dict[str, str], headers: dict[str, str]) -> str:
    """Blob-service SharedKey string-to-sign (the 14-line canonical
    layout).  Empty Content-Length encodes as '' per the 2015-02-21+
    rule; x-ms-* headers sort lexicographically; every query param of
    the canonicalized resource appears as \\nname:value sorted by name."""
    h = {k.lower(): v.strip() for k, v in headers.items()}
    cl = h.get("content-length", "")
    if cl == "0":
        cl = ""
    fields = [
        method.upper(),
        h.get("content-encoding", ""),
        h.get("content-language", ""),
        cl,
        h.get("content-md5", ""),
        h.get("content-type", ""),
        "",  # Date — x-ms-date rides in canonicalized headers instead
        h.get("if-modified-since", ""),
        h.get("if-match", ""),
        h.get("if-none-match", ""),
        h.get("if-unmodified-since", ""),
        h.get("range", ""),
    ]
    canon_headers = "".join(
        f"{k}:{h[k]}\n" for k in sorted(h) if k.startswith("x-ms-"))
    canon_resource = f"/{account}{path}"
    for k in sorted(query):
        canon_resource += f"\n{k}:{query[k]}"
    return "\n".join(fields) + "\n" + canon_headers + canon_resource


def sign(key_b64: str, sts: str) -> str:
    mac = hmac.new(base64.b64decode(key_b64), sts.encode("utf-8"),
                   hashlib.sha256)
    return base64.b64encode(mac.digest()).decode()


class MiniAzureBlobServer:
    def __init__(self, account: str = "cdcaccount",
                 key_b64: str | None = None, host: str = "127.0.0.1"):
        self.account = account
        self.key_b64 = key_b64 or base64.b64encode(
            b"azure-test-shared-key-32-bytes!!").decode()
        self.host = host
        self.containers: dict[str, dict[str, bytes]] = {}
        self._lock = threading.Lock()
        srv = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            def _send(self, status: int, body: bytes = b"",
                      ctype: str = _XML) -> None:
                self.send_response(status)
                if body:
                    self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def _authed(self, body_len: int) -> bool:
                u = urlsplit(self.path)
                q = {k: v[-1] for k, v in
                     parse_qs(u.query, keep_blank_values=True).items()}
                sts = string_to_sign(
                    self.command, srv.account, unquote(u.path), q,
                    dict(self.headers.items()))
                want = f"SharedKey {srv.account}:{sign(srv.key_b64, sts)}"
                if self.headers.get("Authorization", "") == want:
                    return True
                self._send(403, b"<Error><Code>AuthenticationFailed"
                                b"</Code></Error>")
                return False

            def do_PUT(self):
                n = int(self.headers.get("Content-Length", 0))
                if not self._authed(n):
                    self.rfile.read(n)
                    return
                body = self.rfile.read(n)
                u = urlsplit(self.path)
                container, _, blob = unquote(u.path).strip("/").partition("/")
                if not blob:
                    return self._send(400, b"<Error><Code>InvalidUri"
                                           b"</Code></Error>")
                if self.headers.get("x-ms-blob-type") != "BlockBlob":
                    return self._send(400, b"<Error><Code>"
                                           b"UnsupportedBlobType"
                                           b"</Code></Error>")
                with srv._lock:
                    srv.containers.setdefault(container, {})[blob] = body
                self._send(201)

            def do_GET(self):
                if not self._authed(0):
                    return
                u = urlsplit(self.path)
                q = {k: v[-1] for k, v in
                     parse_qs(u.query, keep_blank_values=True).items()}
                container, _, blob = unquote(u.path).strip("/").partition("/")
                if not blob and q.get("restype") == "container" \
                        and q.get("comp") == "list":
                    prefix = q.get("prefix", "")
                    maxresults = int(q.get("maxresults", 5000))
                    with srv._lock:
                        keys = sorted(
                            k for k in srv.containers.get(container, {})
                            if k.startswith(prefix))
                    start = 0
                    if q.get("marker"):
                        after = base64.urlsafe_b64decode(
                            q["marker"]).decode()
                        start = next((i + 1 for i, k in enumerate(keys)
                                      if k == after), len(keys))
                    page = keys[start:start + maxresults]
                    rest = keys[start + maxresults:]
                    blobs = "".join(
                        f"<Blob><Name>{k}</Name><Properties>"
                        f"<Content-Length>"
                        f"{len(srv.containers[container][k])}"
                        f"</Content-Length></Properties></Blob>"
                        for k in page)
                    marker = ""
                    if rest and page:
                        nm = base64.urlsafe_b64encode(
                            page[-1].encode()).decode()
                        marker = f"<NextMarker>{nm}</NextMarker>"
                    xml = (f'<?xml version="1.0" encoding="utf-8"?>'
                           f'<EnumerationResults ContainerName='
                           f'"{container}"><Blobs>{blobs}</Blobs>'
                           f"{marker}</EnumerationResults>")
                    return self._send(200, xml.encode())
                with srv._lock:
                    body = srv.containers.get(container, {}).get(blob)
                if body is None:
                    return self._send(404, b"<Error><Code>BlobNotFound"
                                           b"</Code></Error>")
                self._send(200, body, ctype="application/octet-stream")

        self._server = ThreadingHTTPServer((host, 0), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    @property
    def endpoint(self) -> str:
        return f"http://{self.host}:{self.port}"

    def start(self) -> "MiniAzureBlobServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


class AzBlobClient:
    """SharedKey-signing client with the S3Client surface (put/get/list),
    so the storage sink is scheme-generic."""

    def __init__(self, endpoint: str, account: str, key_b64: str,
                 x_ms_date: str = "Thu, 01 Jan 2026 00:00:00 GMT"):
        import http.client

        u = urlsplit(endpoint)
        self.host, self.port = u.hostname, u.port
        self.account = account
        self.key_b64 = key_b64
        # deterministic clock, like the S3 client's amz_date
        self.x_ms_date = x_ms_date
        self.conn = http.client.HTTPConnection(self.host, self.port,
                                               timeout=60)

    def _request(self, method: str, path: str, query: dict[str, str],
                 body: bytes = b"",
                 extra: dict[str, str] | None = None) -> tuple[int, bytes]:
        """``path`` is the DECODED resource path — it signs as-is (both
        sides canonicalize the decoded form) and percent-encodes only
        on the request line."""
        headers = {
            "x-ms-date": self.x_ms_date,
            "x-ms-version": "2021-08-06",
            "Content-Length": str(len(body)),
        }
        if extra:
            headers.update(extra)
        sts = string_to_sign(method, self.account, path, query, headers)
        headers["Authorization"] = (
            f"SharedKey {self.account}:{sign(self.key_b64, sts)}")
        qs = "&".join(f"{k}={quote(str(v), safe='')}"
                      for k, v in query.items())
        url = quote(path) + (f"?{qs}" if qs else "")
        self.conn.request(method, url, body=body or None, headers=headers)
        resp = self.conn.getresponse()
        return resp.status, resp.read()

    def put_object(self, container: str, key: str, body: bytes) -> None:
        status, data = self._request(
            "PUT", f"/{container}/{key}", {}, body,
            extra={"x-ms-blob-type": "BlockBlob"})
        if status != 201:
            raise IOError(f"azblob put {key}: {status} {data[:200]!r}")

    def get_object(self, container: str, key: str) -> bytes:
        status, data = self._request(
            "GET", f"/{container}/{key}", {})
        if status != 200:
            raise IOError(f"azblob get {key}: {status} {data[:200]!r}")
        return data

    def list_objects(self, container: str,
                     max_keys: int = 5000) -> list[tuple[str, int]]:
        import re

        out: list[tuple[str, int]] = []
        marker = ""
        while True:
            q = {"restype": "container", "comp": "list",
                 "maxresults": str(max_keys)}
            if marker:
                q["marker"] = marker
            status, data = self._request("GET", f"/{container}", q)
            if status != 200:
                raise IOError(f"azblob list: {status} {data[:200]!r}")
            xml = data.decode()
            for m in re.finditer(
                    r"<Blob><Name>(.*?)</Name><Properties>"
                    r"<Content-Length>(\d+)</Content-Length>", xml):
                out.append((m.group(1), int(m.group(2))))
            nm = re.search(r"<NextMarker>(.*?)</NextMarker>", xml)
            if not nm:
                return out
            marker = nm.group(1)

    def close(self) -> None:
        self.conn.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
