"""In-process GCS endpoint speaking the JSON API subset a storage sink
needs (cloud.google.com/storage/docs/json_api — public REST spec):

- media upload:  POST /upload/storage/v1/b/{bucket}/o?uploadType=media&name=K
- media download: GET /storage/v1/b/{bucket}/o/{object}?alt=media
- list objects:   GET /storage/v1/b/{bucket}/o?prefix=&maxResults=&pageToken=
  with real nextPageToken pagination

Auth: `Authorization: Bearer <token>` checked against the configured
token (the oauth2 token a real deployment gets from its service
account), 401 otherwise.

Reference parity target: the gcs:// scheme of the external-storage lib
behind `pkg/config/sink_protocol.go:133-139`.  Scale note: TEST
endpoint — in production the same client bytes target real GCS.
"""

from __future__ import annotations

import base64
import hashlib
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, quote, unquote, urlsplit


class MiniGCSServer:
    def __init__(self, token: str = "gcs-test-token",
                 host: str = "127.0.0.1"):
        self.token = token
        self.host = host
        self.buckets: dict[str, dict[str, bytes]] = {}
        self._lock = threading.Lock()
        srv = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def _json(self, status: int, obj) -> None:
                body = json.dumps(obj).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _bytes(self, status: int, body: bytes) -> None:
                self.send_response(status)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _err(self, status: int, message: str) -> None:
                self._json(status, {"error": {"code": status,
                                              "message": message}})

            def _authed(self) -> bool:
                got = self.headers.get("Authorization", "")
                if got == f"Bearer {srv.token}":
                    return True
                self._err(401, "Invalid Credentials")
                return False

            def do_POST(self):
                # drain the body FIRST: an early 401 must not leave the
                # payload unread on the keep-alive socket (the next
                # request would parse it as garbage)
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                if not self._authed():
                    return
                u = urlsplit(self.path)
                q = {k: v[-1] for k, v in parse_qs(u.query).items()}
                parts = u.path.strip("/").split("/")
                # /upload/storage/v1/b/{bucket}/o
                if (len(parts) == 6 and parts[0] == "upload"
                        and parts[1:4] == ["storage", "v1", "b"]
                        and parts[5] == "o"):
                    if q.get("uploadType") != "media" or "name" not in q:
                        return self._err(400, "media upload needs "
                                              "uploadType=media&name=")
                    bucket, name = parts[4], q["name"]
                    with srv._lock:
                        srv.buckets.setdefault(bucket, {})[name] = body
                    md5 = base64.b64encode(
                        hashlib.md5(body).digest()).decode()
                    return self._json(200, {
                        "kind": "storage#object", "bucket": bucket,
                        "name": name, "size": str(len(body)),
                        "md5Hash": md5})
                self._err(404, "unknown upload path")

            def do_GET(self):
                if not self._authed():
                    return
                u = urlsplit(self.path)
                q = {k: v[-1] for k, v in parse_qs(u.query).items()}
                parts = u.path.strip("/").split("/", 4)
                # /storage/v1/b/{bucket}/o[/{object}]
                if (len(parts) >= 4 and parts[0:3] == ["storage", "v1", "b"]
                        and len(parts) == 5):
                    bucket = parts[3]
                    rest = parts[4]
                    if rest == "o":  # list
                        prefix = q.get("prefix", "")
                        max_results = int(q.get("maxResults", 1000))
                        with srv._lock:
                            keys = sorted(
                                k for k in srv.buckets.get(bucket, {})
                                if k.startswith(prefix))
                        start = 0
                        if "pageToken" in q:
                            after = base64.urlsafe_b64decode(
                                q["pageToken"]).decode()
                            start = next(
                                (i + 1 for i, k in enumerate(keys)
                                 if k == after), len(keys))
                        page = keys[start:start + max_results]
                        rest_keys = keys[start + max_results:]
                        out = {
                            "kind": "storage#objects",
                            "items": [{"name": k,
                                       "size": str(len(srv.buckets[bucket][k]))}
                                      for k in page],
                        }
                        if rest_keys and page:
                            out["nextPageToken"] = base64.urlsafe_b64encode(
                                page[-1].encode()).decode()
                        return self._json(200, out)
                    if rest.startswith("o/"):  # media download
                        name = unquote(rest[2:])
                        if q.get("alt") != "media":
                            return self._err(400, "alt=media required")
                        with srv._lock:
                            body = srv.buckets.get(bucket, {}).get(name)
                        if body is None:
                            return self._err(404, f"No such object: {name}")
                        return self._bytes(200, body)
                self._err(404, "unknown path")

        self._server = ThreadingHTTPServer((host, 0), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)

    @property
    def endpoint(self) -> str:
        return f"http://{self.host}:{self.port}"

    def start(self) -> "MiniGCSServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


class GCSClient:
    """JSON-API client for the subset above: put/get/list with Bearer
    auth — the S3Client surface so the storage sink is scheme-generic."""

    def __init__(self, endpoint: str, token: str):
        import http.client

        u = urlsplit(endpoint)
        self.host, self.port = u.hostname, u.port
        self.token = token
        self.conn = http.client.HTTPConnection(self.host, self.port,
                                               timeout=60)

    def _request(self, method: str, path: str,
                 body: bytes = b"") -> tuple[int, bytes]:
        self.conn.request(method, path, body=body or None, headers={
            "Authorization": f"Bearer {self.token}",
            "Content-Length": str(len(body)),
        })
        resp = self.conn.getresponse()
        data = resp.read()
        return resp.status, data

    def put_object(self, bucket: str, key: str, body: bytes) -> None:
        status, data = self._request(
            "POST",
            f"/upload/storage/v1/b/{bucket}/o?uploadType=media"
            f"&name={quote(key, safe='')}", body)
        if status != 200:
            raise IOError(f"gcs put {key}: {status} {data[:200]!r}")

    def get_object(self, bucket: str, key: str) -> bytes:
        status, data = self._request(
            "GET",
            f"/storage/v1/b/{bucket}/o/{quote(key, safe='')}?alt=media")
        if status != 200:
            raise IOError(f"gcs get {key}: {status} {data[:200]!r}")
        return data

    def list_objects(self, bucket: str,
                     max_keys: int = 1000) -> list[tuple[str, int]]:
        out: list[tuple[str, int]] = []
        token = None
        while True:
            path = f"/storage/v1/b/{bucket}/o?maxResults={max_keys}"
            if token:
                path += f"&pageToken={token}"
            status, data = self._request("GET", path)
            if status != 200:
                raise IOError(f"gcs list: {status} {data[:200]!r}")
            doc = json.loads(data)
            out += [(i["name"], int(i["size"]))
                    for i in doc.get("items", [])]
            token = doc.get("nextPageToken")
            if not token:
                return out

    def close(self) -> None:
        self.conn.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
