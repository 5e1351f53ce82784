"""HTTP control-plane tests — the api/v2 surface (`api/v2/api.go:61-110`)
served over ChangefeedRegistry, driven through real HTTP round-trips."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from tests.test_control_plane import REFERENCE_TOML
from ticdc_spark.api import ApiServer
from ticdc_spark.streaming.registry import ChangefeedRegistry


@pytest.fixture()
def api(tmp_path):
    reg = ChangefeedRegistry(str(tmp_path))
    srv = ApiServer(reg)
    port = srv.start()
    yield f"http://127.0.0.1:{port}", reg
    srv.stop()


def _req(url, method="GET", body=None, headers=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method,
                                 headers=headers or {})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_and_tso(api):
    base, _ = api
    assert _req(f"{base}/api/v2/health") == (200, {"status": "ok"})
    s1, t1 = _req(f"{base}/api/v2/tso", "POST")
    s2, t2 = _req(f"{base}/api/v2/tso", "POST")
    assert s1 == s2 == 200
    assert t2["timestamp"] >= t1["timestamp"] > 0


def test_changefeed_crud_over_http(api):
    base, _ = api
    # create
    st, doc = _req(f"{base}/api/v2/changefeeds", "POST",
                   {"changefeed_id": "cf-http", "config_toml": REFERENCE_TOML})
    assert st == 200 and doc["state"] == "normal"
    # duplicate create rejected
    st, err = _req(f"{base}/api/v2/changefeeds", "POST",
                   {"changefeed_id": "cf-http", "config_toml": REFERENCE_TOML})
    assert st == 400 and "already exists" in err["error_msg"]
    # list
    st, lst = _req(f"{base}/api/v2/changefeeds")
    assert st == 200 and lst["total"] == 1
    assert lst["items"][0] == {"id": "cf-http", "state": "normal"}
    # get
    st, doc = _req(f"{base}/api/v2/changefeeds/cf-http")
    assert st == 200 and doc["config_toml"] == REFERENCE_TOML
    assert doc["checkpoint_ts"] is None  # never ran
    # update while running is rejected (reference pause-before-update rule)
    st, err = _req(f"{base}/api/v2/changefeeds/cf-http", "PUT",
                   {"config_toml": REFERENCE_TOML})
    assert st == 400 and "pause it before update" in err["error_msg"]
    # pause → update → resume
    st, doc = _req(f"{base}/api/v2/changefeeds/cf-http/pause", "POST")
    assert st == 200 and doc["state"] == "stopped"
    new_toml = REFERENCE_TOML.replace('protocol = "canal-json"',
                                      'protocol = "open-protocol"')
    st, doc = _req(f"{base}/api/v2/changefeeds/cf-http", "PUT",
                   {"config_toml": new_toml})
    assert st == 200 and 'open-protocol' in doc["config_toml"]
    st, doc = _req(f"{base}/api/v2/changefeeds/cf-http/resume", "POST")
    assert st == 200 and doc["state"] == "normal"
    # status route
    st, status = _req(f"{base}/api/v2/changefeeds/cf-http/status")
    assert st == 200 and status["state"] == "normal"
    # delete (idempotent)
    assert _req(f"{base}/api/v2/changefeeds/cf-http", "DELETE")[0] == 200
    assert _req(f"{base}/api/v2/changefeeds/cf-http", "DELETE")[0] == 200
    st, lst = _req(f"{base}/api/v2/changefeeds")
    assert lst["items"][0]["state"] == "removed"


def test_missing_changefeed_is_400(api):
    base, _ = api
    st, err = _req(f"{base}/api/v2/changefeeds/nope")
    assert st == 400 and "not found" in err["error_msg"]
    st, err = _req(f"{base}/api/v2/changefeeds/nope/pause", "POST")
    assert st == 400
    st, _err = _req(f"{base}/api/v2/changefeeds", "POST", {"config_toml": ""})
    assert st == 400  # changefeed_id required


def test_status_synced_and_gc_safepoint_after_run(api, spark, sf_dir):
    base, reg = api
    _req(f"{base}/api/v2/changefeeds", "POST",
         {"changefeed_id": "cf-run", "config_toml": REFERENCE_TOML})
    reg.run("cf-run", spark, sf_dir, timeout_s=240)
    st, status = _req(f"{base}/api/v2/changefeeds/cf-run/status")
    assert st == 200 and status["checkpoint_ts"] is not None
    ckpt = status["checkpoint_ts"]
    # synced: caught up vs a resolved ts at/below the checkpoint, not above
    st, s = _req(f"{base}/api/v2/changefeeds/cf-run/synced",
                 headers={"X-Resolved-Ts": str(ckpt)})
    assert st == 200 and s["synced"] is True
    st, s = _req(f"{base}/api/v2/changefeeds/cf-run/synced",
                 headers={"X-Resolved-Ts": str(ckpt + 1)})
    assert s["synced"] is False
    # GC safepoint = min checkpoint over live changefeeds
    assert reg.gc_safepoint() == ckpt
    # a second, never-run changefeed contributes nothing
    _req(f"{base}/api/v2/changefeeds", "POST",
         {"changefeed_id": "cf-idle", "config_toml": REFERENCE_TOML})
    assert reg.gc_safepoint() == ckpt
    # removing the running changefeed drops the safepoint
    _req(f"{base}/api/v2/changefeeds/cf-run", "DELETE")
    assert reg.gc_safepoint() is None
