"""api/v2 Python client SDK — the Go client's twin (`pkg/api/v2/
api_client.go`: ``APIV2Interface`` with ``Changefeeds() / Captures() /
Processors() / Tso() / Status() / Unsafe()`` groups; method surface from
`pkg/api/v2/changefeed.go:76-220` etc.).

Thin stdlib-urllib wrapper over a running :class:`ticdc_spark.api.
ApiServer` (or any server speaking the same routes).  Non-2xx responses
raise :class:`ApiError` carrying the server's ``error_msg`` — the
analog of the Go client's typed error unwrap.
"""
from __future__ import annotations

import json
import urllib.error
import urllib.request


class ApiError(RuntimeError):
    def __init__(self, status: int, message: str, code: str = "") -> None:
        super().__init__(f"HTTP {status} [{code}]: {message}")
        self.status = status
        self.message = message
        self.code = code  # RFC code, e.g. CDC:ErrChangeFeedNotExists


class _Group:
    def __init__(self, client: "ApiClient") -> None:
        self._c = client


class _Changefeeds(_Group):
    def create(self, changefeed_id: str, config_toml: str,
               sink_uri: str | None = None) -> dict:
        body = {"changefeed_id": changefeed_id, "config_toml": config_toml}
        if sink_uri:
            body["sink_uri"] = sink_uri
        return self._c._call("/api/v2/changefeeds", "POST", body)

    def list(self, state: str | None = None) -> list[dict]:
        q = f"?state={state}" if state else ""
        return self._c._call(f"/api/v2/changefeeds{q}")["items"]

    def get(self, changefeed_id: str) -> dict:
        return self._c._call(f"/api/v2/changefeeds/{changefeed_id}")

    def update(self, changefeed_id: str, config_toml: str) -> dict:
        return self._c._call(f"/api/v2/changefeeds/{changefeed_id}", "PUT",
                             {"config_toml": config_toml})

    def pause(self, changefeed_id: str) -> dict:
        return self._c._call(
            f"/api/v2/changefeeds/{changefeed_id}/pause", "POST", {})

    def resume(self, changefeed_id: str,
               overwrite_checkpoint_ts: int | None = None) -> dict:
        """cli `changefeed resume [--overwrite-checkpoint-ts]`
        (`api/v2/changefeed.go:785-790`): the optional ts rewinds the
        changefeed before restarting."""
        body: dict = {}
        if overwrite_checkpoint_ts is not None:
            body["overwrite_checkpoint_ts"] = overwrite_checkpoint_ts
        return self._c._call(
            f"/api/v2/changefeeds/{changefeed_id}/resume", "POST", body)

    def delete(self, changefeed_id: str) -> None:
        self._c._call(f"/api/v2/changefeeds/{changefeed_id}", "DELETE")

    def status(self, changefeed_id: str) -> dict:
        return self._c._call(f"/api/v2/changefeeds/{changefeed_id}/status")

    def synced(self, changefeed_id: str, resolved_ts: int = 0) -> dict:
        return self._c._call(
            f"/api/v2/changefeeds/{changefeed_id}/synced",
            headers={"X-Resolved-Ts": str(resolved_ts)})

    def tables(self, changefeed_id: str) -> list[dict]:
        return self._c._call(
            f"/api/v2/changefeeds/{changefeed_id}/tables")["items"]

    def get_dispatcher_count(self, changefeed_id: str) -> int:
        return self._c._call(
            f"/api/v2/changefeeds/{changefeed_id}/get_dispatcher_count"
        )["count"]

    def verify_table(self, filter_rules: list[str],
                     case_sensitive: bool = False) -> dict:
        return self._c._call("/api/v2/verify_table", "POST",
                             {"filter_rules": filter_rules,
                              "case_sensitive": case_sensitive})

    def move_table(self, changefeed_id: str) -> dict:
        return self._c._call(
            f"/api/v2/changefeeds/{changefeed_id}/move_table", "POST", {})

    def split_table_by_region_count(
            self, changefeed_id: str, table_id: int,
            n_regions: int = 1, spans_num: int = 1) -> dict:
        return self._c._call(
            f"/api/v2/changefeeds/{changefeed_id}/"
            f"split_table_by_region_count?tableID={table_id}",
            "POST", {"n_regions": n_regions, "spans_num": spans_num})


class _Captures(_Group):
    def list(self) -> list[dict]:
        return self._c._call("/api/v2/captures")["items"]


class _Processors(_Group):
    def list(self) -> list[dict]:
        return self._c._call("/api/v2/processors")["items"]

    def get(self, changefeed_id: str, capture_id: str) -> dict:
        return self._c._call(
            f"/api/v2/processors/{changefeed_id}/{capture_id}")


class _Tso(_Group):
    def query(self) -> int:
        return self._c._call("/api/v2/tso", "POST", {})["timestamp"]


class _Unsafe(_Group):
    def metadata(self) -> list[dict]:
        return self._c._call("/api/v2/unsafe/metadata")["kvs"]

    def resolve_lock(self, region_id: int, ts: int = 0) -> None:
        self._c._call("/api/v2/unsafe/resolve_lock", "POST",
                      {"region_id": region_id, "ts": ts})

    def delete_service_gc_safepoint(self) -> None:
        self._c._call("/api/v2/unsafe/service_gc_safepoint", "DELETE")


class ApiClient:
    """``APIV2Interface`` twin.  Usage::

        client = ApiClient(f"http://127.0.0.1:{port}")
        client.changefeeds.create("cf", toml)
        client.changefeeds.pause("cf")
    """

    def __init__(self, base_url: str, timeout_s: float = 10.0,
                 user: str | None = None, password: str | None = None,
                 ca_pem: bytes | None = None,
                 cert_pem: bytes | None = None,
                 key_pem: bytes | None = None) -> None:
        """TLS + auth (the cli's --ca/--cert/--key/--user/--password,
        `pkg/security/credential.go` + `cli_with_auth` e2e): ``ca_pem``
        pins the server CA for https URLs (no system trust store);
        cert/key present a client certificate to mTLS listeners;
        user/password ride every request as HTTP Basic auth for
        ``client-user-required`` servers."""
        self.base_url = base_url.rstrip("/")
        self.timeout_s = timeout_s
        self._ssl_ctx = None
        if ca_pem is not None:
            from ticdc_spark.codec import tlsutil

            self._ssl_ctx = tlsutil.client_context(ca_pem, cert_pem,
                                                   key_pem)
        self._auth_header = None
        if user is not None:
            import base64 as _b64

            tok = _b64.b64encode(
                f"{user}:{password or ''}".encode()).decode()
            self._auth_header = f"Basic {tok}"
        self.changefeeds = _Changefeeds(self)
        self.captures = _Captures(self)
        self.processors = _Processors(self)
        self.tso = _Tso(self)
        self.unsafe = _Unsafe(self)

    # -- server-level --------------------------------------------------
    def health(self) -> bool:
        return self._call("/api/v2/health").get("status") == "ok"

    def status(self) -> dict:
        return self._call("/api/v2/status")

    def set_log_level(self, level: str) -> None:
        self._call("/api/v2/log", "POST", {"log_level": level})

    def set_redact_mode(self, mode: str) -> dict:
        return self._call("/api/v2/log/redact", "POST",
                          {"redact_info_log": mode})

    def resign_owner(self) -> None:
        self._call("/api/v2/owner/resign", "POST", {})

    def metrics_text(self) -> str:
        req = urllib.request.Request(self.base_url + "/metrics")
        if self._auth_header:
            req.add_header("Authorization", self._auth_header)
        with urllib.request.urlopen(req, timeout=self.timeout_s,
                                    context=self._ssl_ctx) as r:
            return r.read().decode()

    # -- transport -----------------------------------------------------
    def _call(self, path: str, method: str = "GET",
              body: dict | None = None,
              headers: dict | None = None) -> dict:
        data = json.dumps(body).encode() if body is not None else None
        hdrs = {"Content-Type": "application/json", **(headers or {})}
        if self._auth_header:
            hdrs.setdefault("Authorization", self._auth_header)
        req = urllib.request.Request(
            self.base_url + path, data=data, method=method, headers=hdrs)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s,
                                        context=self._ssl_ctx) as r:
                payload = r.read()
        except urllib.error.HTTPError as e:
            try:
                doc = json.loads(e.read())
                msg = doc.get("error_msg", "")
                rfc = doc.get("error_code", "")
            except Exception:
                msg = rfc = ""
            raise ApiError(e.code, msg, rfc) from None
        return json.loads(payload) if payload else {}
