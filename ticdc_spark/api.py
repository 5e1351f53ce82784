"""HTTP control plane — the OpenAPI v2 surface of the reference
(`api/v2/api.go:61-110`) over :class:`ChangefeedRegistry`.

Routes implemented (reference handler in parens):

- ``GET    /api/v2/health``                       (ServerHealth)
- ``POST   /api/v2/changefeeds``                  (CreateChangefeed, `api/v2/changefeed.go:89`)
- ``GET    /api/v2/changefeeds``                  (ListChangeFeeds)
- ``GET    /api/v2/changefeeds/{id}``             (GetChangeFeed)
- ``PUT    /api/v2/changefeeds/{id}``             (UpdateChangefeed — only
  while stopped, mirroring the reference's pause-before-update rule)
- ``POST   /api/v2/changefeeds/{id}/pause``       (PauseChangefeed)
- ``POST   /api/v2/changefeeds/{id}/resume``      (ResumeChangefeed)
- ``DELETE /api/v2/changefeeds/{id}``             (DeleteChangefeed)
- ``GET    /api/v2/changefeeds/{id}/status``      (status)
- ``GET    /api/v2/changefeeds/{id}/synced``      (synced)
- ``POST   /api/v2/tso``                          (QueryTso)

The server is stdlib ``ThreadingHTTPServer`` — the control plane is
driver-side and tiny; the data plane never touches it. Responses follow
the reference's JSON shapes loosely (``{"error_msg": ...}`` on failure,
HTTP status codes per REST convention).
"""

from __future__ import annotations

import json
import re
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ticdc_spark.streaming.registry import ChangefeedRegistry

_CF_ROUTE = re.compile(
    r"^/api/v2/changefeeds/(?P<id>[^/]+)(?P<verb>/(pause|resume|status|synced))?$"
)


class ApiServer:
    """Bind the registry to an ephemeral HTTP port. ``start()`` returns
    the bound port; ``stop()`` shuts the listener down."""

    def __init__(self, registry: ChangefeedRegistry, host: str = "127.0.0.1") -> None:
        self.registry = registry
        self.host = host
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def start(self, port: int = 0) -> int:
        registry = self.registry

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence per-request stderr noise
                pass

            def _send(self, code: int, payload: dict | list) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                if not n:
                    return {}
                return json.loads(self.rfile.read(n))

            # -- GET ------------------------------------------------------
            def do_GET(self):
                if self.path == "/api/v2/health":
                    return self._send(200, {"status": "ok"})
                if self.path == "/api/v2/changefeeds":
                    items = [
                        {"id": cid, "state": st}
                        for cid, st in sorted(registry.list().items())
                    ]
                    return self._send(200, {"total": len(items), "items": items})
                m = _CF_ROUTE.match(self.path)
                if not m:
                    return self._send(404, {"error_msg": "no such route"})
                cid, verb = m.group("id"), (m.group("verb") or "")
                try:
                    info = registry.describe(cid)
                except KeyError:
                    return self._send(
                        400, {"error_msg": f"changefeed not found: {cid}"}
                    )
                if verb == "/status":
                    return self._send(200, {
                        "state": info["state"],
                        "checkpoint_ts": info["checkpoint_ts"],
                    })
                if verb == "/synced":
                    # Reference semantics: synced when the checkpoint has
                    # caught up with the (caller-supplied) resolved ts.
                    target = self.path  # no query parsing needed: header opt
                    resolved = int(self.headers.get("X-Resolved-Ts") or 0)
                    ckpt = info["checkpoint_ts"] or 0
                    del target
                    return self._send(200, {
                        "synced": bool(resolved) and ckpt >= resolved,
                        "checkpoint_ts": ckpt,
                        "resolved_ts": resolved,
                    })
                if verb:
                    return self._send(404, {"error_msg": "no such route"})
                return self._send(200, info)

            # -- POST -----------------------------------------------------
            def do_POST(self):
                if self.path == "/api/v2/tso":
                    # A TSO is (physical ms << 18) | logical in TiDB; a
                    # microsecond epoch is a faithful monotonic stand-in.
                    return self._send(200, {"timestamp": int(time.time() * 1e6)})
                if self.path == "/api/v2/changefeeds":
                    body = self._body()
                    cid = body.get("changefeed_id")
                    toml = body.get("config_toml", "")
                    if not cid:
                        return self._send(400, {"error_msg": "changefeed_id required"})
                    try:
                        registry.create(cid, toml)
                    except ValueError as e:
                        return self._send(400, {"error_msg": str(e)})
                    return self._send(200, registry.describe(cid))
                m = _CF_ROUTE.match(self.path)
                if not m or m.group("verb") not in ("/pause", "/resume"):
                    return self._send(404, {"error_msg": "no such route"})
                cid = m.group("id")
                try:
                    if m.group("verb") == "/pause":
                        registry.pause(cid)
                    else:
                        registry.resume(cid)
                except KeyError:
                    return self._send(
                        400, {"error_msg": f"changefeed not found: {cid}"}
                    )
                return self._send(200, registry.describe(cid))

            # -- PUT ------------------------------------------------------
            def do_PUT(self):
                m = _CF_ROUTE.match(self.path)
                if not m or m.group("verb"):
                    return self._send(404, {"error_msg": "no such route"})
                cid = m.group("id")
                try:
                    registry.update(cid, self._body().get("config_toml", ""))
                except KeyError:
                    return self._send(
                        400, {"error_msg": f"changefeed not found: {cid}"}
                    )
                except ValueError as e:
                    return self._send(400, {"error_msg": str(e)})
                return self._send(200, registry.describe(cid))

            # -- DELETE ---------------------------------------------------
            def do_DELETE(self):
                m = _CF_ROUTE.match(self.path)
                if not m or m.group("verb"):
                    return self._send(404, {"error_msg": "no such route"})
                cid = m.group("id")
                try:
                    registry.remove(cid)
                except KeyError:
                    # Reference DELETE is idempotent on missing changefeeds.
                    pass
                return self._send(200, {})

        self._httpd = ThreadingHTTPServer((self.host, port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="ticdc-api", daemon=True
        )
        self._thread.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
