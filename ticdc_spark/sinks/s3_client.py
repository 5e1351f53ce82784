"""S3 REST client: SigV4-signed PutObject/GetObject/ListObjectsV2/Delete.

The stdlib-http analog of what the AWS SDK does for the reference's
cloud-storage sink. Every request carries a real SigV4 Authorization
header (`codec/awssig.py`, validated against the official AWS vector);
ListObjectsV2 follows real continuation-token pagination.
"""

from __future__ import annotations

import http.client
import urllib.parse
import xml.etree.ElementTree as ET

from ticdc_spark.codec import awssig


class S3Error(Exception):
    def __init__(self, status: int, code: str, message: str):
        super().__init__(f"{status} {code}: {message}")
        self.status = status
        self.code = code


class S3Client:
    def __init__(self, endpoint: str, access_key: str, secret_key: str,
                 region: str = "us-east-1", amz_date: str = "20260101T000000Z",
                 tls_ca: bytes | None = None,
                 tls_client_cert: tuple[bytes, bytes] | None = None):
        u = urllib.parse.urlsplit(endpoint)
        self.host = u.hostname
        self.port = u.port
        self.access_key = access_key
        self.secret_key = secret_key
        self.region = region
        # deterministic clock: the mini server doesn't enforce skew; a
        # real deployment stamps wall time here
        self.amz_date = amz_date
        if u.scheme == "https":
            from ticdc_spark.codec.tlsutil import client_context

            if tls_ca is None:
                raise ValueError("https endpoint needs tls_ca (pinned CA)")
            cert, key = tls_client_cert or (None, None)
            self.conn = http.client.HTTPSConnection(
                self.host, self.port, timeout=60,
                context=client_context(tls_ca, cert, key))
        else:
            self.conn = http.client.HTTPConnection(self.host, self.port, timeout=60)

    def close(self):
        self.conn.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _request(self, method: str, path: str, query: str = "",
                 body: bytes = b"") -> tuple[int, dict, bytes]:
        host_hdr = f"{self.host}:{self.port}"
        auth, payload_hash = awssig.sign(
            method, path, query, {"host": host_hdr}, body,
            self.access_key, self.secret_key, self.amz_date, self.region)
        url = path + (f"?{query}" if query else "")
        headers = {
            "Host": host_hdr,
            "x-amz-date": self.amz_date,
            "x-amz-content-sha256": payload_hash,
            "Authorization": auth,
            "Content-Length": str(len(body)),
        }
        self.conn.request(method, url, body=body, headers=headers)
        resp = self.conn.getresponse()
        data = resp.read()
        if resp.status >= 400:
            code, msg = "Unknown", data.decode("utf-8", "replace")
            try:
                root = ET.fromstring(data)
                code = root.findtext("Code", code)
                msg = root.findtext("Message", msg)
            except ET.ParseError:
                pass
            raise S3Error(resp.status, code, msg)
        return resp.status, dict(resp.getheaders()), data

    # -- object ops

    def put_object(self, bucket: str, key: str, body: bytes) -> str:
        _, headers, _ = self._request("PUT", f"/{bucket}/{key}", body=body)
        return headers.get("ETag", "")

    def get_object(self, bucket: str, key: str) -> bytes:
        _, _, data = self._request("GET", f"/{bucket}/{key}")
        return data

    def head_object(self, bucket: str, key: str) -> int:
        _, headers, _ = self._request("HEAD", f"/{bucket}/{key}")
        return int(headers.get("Content-Length", 0))

    def delete_object(self, bucket: str, key: str) -> None:
        self._request("DELETE", f"/{bucket}/{key}")

    def list_objects(self, bucket: str, prefix: str = "",
                     max_keys: int = 1000) -> list[tuple[str, int]]:
        """Full listing via ListObjectsV2 continuation pages."""
        out: list[tuple[str, int]] = []
        token = None
        while True:
            q = {"list-type": "2", "prefix": prefix, "max-keys": str(max_keys)}
            if token:
                q["continuation-token"] = token
            query = urllib.parse.urlencode(sorted(q.items()))
            _, _, data = self._request("GET", f"/{bucket}", query=query)
            root = ET.fromstring(data)
            ns = root.tag.partition("}")[0] + "}" if root.tag.startswith("{") else ""
            for c in root.findall(f"{ns}Contents"):
                out.append((c.findtext(f"{ns}Key"), int(c.findtext(f"{ns}Size"))))
            if root.findtext(f"{ns}IsTruncated") != "true":
                return out
            token = root.findtext(f"{ns}NextContinuationToken")
            if not token:
                return out
