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
    # state filter param
    st, lst = _req(f"{base}/api/v2/changefeeds?state=stopped")
    assert st == 200 and lst["total"] == 0
    st, lst = _req(f"{base}/api/v2/changefeeds?state=normal")
    assert lst["total"] == 1
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
    assert status["rows"] > 0 and status["epochs"] > 0  # statistics
    ckpt = status["checkpoint_ts"]
    # synced branches (`api/v2/changefeed.go:1658-1730`, default
    # intervals 300s/15s): sink idle long enough AND checkpoint fresh
    ckpt_ms = ckpt // 1000
    st, s = _req(f"{base}/api/v2/changefeeds/cf-run/synced",
                 headers={"X-Resolved-Ts": str(ckpt),
                          "X-Last-Synced-Ts": str(ckpt - 400 * 1_000_000),
                          "X-Now-Ts": str(ckpt_ms + 10_000)})
    assert st == 200 and s["synced"] is True
    assert s["info"] == "The data syncing is finished"
    # recent last-synced -> still replicating
    st, s = _req(f"{base}/api/v2/changefeeds/cf-run/synced",
                 headers={"X-Resolved-Ts": str(ckpt),
                          "X-Last-Synced-Ts": str(ckpt),
                          "X-Now-Ts": str(ckpt_ms + 10_000)})
    assert s["synced"] is False and "not finished" in s["info"]
    # idle but checkpoint stale with a small resolved-checkpoint gap
    # -> the check-PD message branch
    st, s = _req(f"{base}/api/v2/changefeeds/cf-run/synced",
                 headers={"X-Resolved-Ts": str(ckpt),
                          "X-Last-Synced-Ts": str(ckpt - 400 * 1_000_000),
                          "X-Now-Ts": str(ckpt_ms + 60_000)})
    assert s["synced"] is False and "PD is online" in s["info"]
    # GC safepoint = min checkpoint over live changefeeds
    assert reg.gc_safepoint() == ckpt
    # a second, never-run changefeed contributes nothing
    _req(f"{base}/api/v2/changefeeds", "POST",
         {"changefeed_id": "cf-idle", "config_toml": REFERENCE_TOML})
    assert reg.gc_safepoint() == ckpt
    # removing the running changefeed drops the safepoint
    _req(f"{base}/api/v2/changefeeds/cf-run", "DELETE")
    assert reg.gc_safepoint() is None


def test_server_status_captures_processors(api):
    base, _ = api
    st, doc = _req(f"{base}/api/v2/status")
    assert st == 200 and doc["is_owner"] is True and doc["id"] == "driver"
    assert doc["version"].startswith("ticdc-spark")
    st, caps = _req(f"{base}/api/v2/captures")
    assert st == 200 and caps["total"] == 1
    assert caps["items"][0]["is_owner"] is True
    # no changefeeds yet -> no processors
    st, procs = _req(f"{base}/api/v2/processors")
    assert st == 200 and procs["total"] == 0
    _req(f"{base}/api/v2/changefeeds", "POST",
         {"changefeed_id": "cf-p", "config_toml": REFERENCE_TOML})
    st, procs = _req(f"{base}/api/v2/processors")
    assert procs["items"] == [{"changefeed_id": "cf-p", "capture_id": "driver"}]
    st, proc = _req(f"{base}/api/v2/processors/cf-p/driver")
    # REFERENCE_TOML excludes test.tp_view (table_id 5)
    assert st == 200 and proc["table_ids"] == [1, 2, 3, 4]
    assert _req(f"{base}/api/v2/processors/cf-p/ghost")[0] == 400
    assert _req(f"{base}/api/v2/processors/nope/driver")[0] == 400


def test_tables_and_dispatcher_count(api):
    base, _ = api
    _req(f"{base}/api/v2/changefeeds", "POST",
         {"changefeed_id": "cf-t", "config_toml": REFERENCE_TOML})
    st, doc = _req(f"{base}/api/v2/changefeeds/cf-t/tables")
    assert st == 200 and doc["total"] == 1
    assert doc["items"][0] == {"node_id": "driver", "table_ids": [1, 2, 3, 4]}
    st, doc = _req(f"{base}/api/v2/changefeeds/cf-t/get_dispatcher_count")
    assert st == 200 and doc["count"] == 4


def test_verify_table_and_get_all_tables(api):
    base, _ = api
    # default store: all five tp_* tables carry a PK -> all eligible
    st, doc = _req(f"{base}/api/v2/get_all_tables", "POST", {})
    assert st == 200 and len(doc["all_tables"]) == 5
    assert doc["ineligible_tables"] == []
    # filter rules narrow the set (last-match-wins with exclusion)
    st, doc = _req(f"{base}/api/v2/verify_table", "POST",
                   {"filter_rules": ["*.*", "!test.tp_view"]})
    names = [t["table_name"] for t in doc["eligible_tables"]]
    assert "tp_view" not in names and len(names) == 4


def test_ineligible_table_reported(tmp_path):
    from ticdc_spark.api import default_schema_store

    store = default_schema_store()
    store.apply_ddl({
        "type": "create-table", "schema": "test", "table": "no_pk",
        "table_id": 99, "commit_ts": 0,
        "columns": [{"name": "x", "spark_type": "bigint"}],
    })
    reg = ChangefeedRegistry(str(tmp_path))
    srv = ApiServer(reg, schema_store=store)
    port = srv.start()
    try:
        st, doc = _req(f"http://127.0.0.1:{port}/api/v2/verify_table",
                       "POST", {"filter_rules": ["test.*"]})
        assert st == 200
        assert [t["table_name"] for t in doc["ineligible_tables"]] == ["no_pk"]
        assert len(doc["eligible_tables"]) == 5
        # force-replicate admits PK-less tables
        st, doc = _req(f"http://127.0.0.1:{port}/api/v2/verify_table",
                       "POST", {"filter_rules": ["test.*"],
                                "force_replicate": True})
        assert doc["ineligible_tables"] == []
        assert len(doc["eligible_tables"]) == 6
    finally:
        srv.stop()


def test_split_table_by_region_count(api):
    base, _ = api
    split_toml = REFERENCE_TOML + "\n[scheduler]\nenable-table-across-nodes = true\n"
    _req(f"{base}/api/v2/changefeeds", "POST",
         {"changefeed_id": "cf-s", "config_toml": split_toml})
    # a changefeed without the scheduler flag is rejected
    _req(f"{base}/api/v2/changefeeds", "POST",
         {"changefeed_id": "cf-noflag", "config_toml": REFERENCE_TOML})
    st, err = _req(
        f"{base}/api/v2/changefeeds/cf-noflag/split_table_by_region_count?tableID=1",
        "POST", {"n_regions": 10, "spans_num": 3})
    assert st == 400 and "enable_table_across_nodes" in err["error_msg"]
    # 10 regions into 3 spans: stepper gives sizes 4,3,3
    st, doc = _req(
        f"{base}/api/v2/changefeeds/cf-s/split_table_by_region_count?tableID=1",
        "POST", {"n_regions": 10, "spans_num": 3})
    assert st == 200
    sizes = [s["end_region"] - s["start_region"] for s in doc["spans"]]
    assert sizes == [4, 3, 3]
    assert doc["spans"][0]["start_region"] == 0
    assert doc["spans"][-1]["end_region"] == 10
    # fewer regions than spans: split is skipped (one span)
    st, doc = _req(
        f"{base}/api/v2/changefeeds/cf-s/split_table_by_region_count?tableID=1",
        "POST", {"n_regions": 2, "spans_num": 3})
    assert len(doc["spans"]) == 1
    # excluded table (tp_view, id 5) is rejected
    st, err = _req(
        f"{base}/api/v2/changefeeds/cf-s/split_table_by_region_count?tableID=5",
        "POST", {"n_regions": 10, "spans_num": 3})
    assert st == 400 and "not in changefeed" in err["error_msg"]
    # missing tableID param
    st, err = _req(
        f"{base}/api/v2/changefeeds/cf-s/split_table_by_region_count",
        "POST", {"n_regions": 10, "spans_num": 3})
    assert st == 400
    # placement ops are single-node no-ops
    st, _doc = _req(f"{base}/api/v2/changefeeds/cf-s/move_table", "POST", {})
    assert st == 200
    st, _doc = _req(f"{base}/api/v2/changefeeds/cf-s/merge_table", "POST", {})
    assert st == 200


def test_log_owner_and_unsafe_routes(api):
    base, reg = api
    st, _doc = _req(f"{base}/api/v2/log", "POST", {"log_level": "debug"})
    assert st == 200
    st, err = _req(f"{base}/api/v2/log", "POST", {"log_level": "loud"})
    assert st == 400
    assert _req(f"{base}/api/v2/owner/resign", "POST", {})[0] == 200
    _req(f"{base}/api/v2/changefeeds", "POST",
         {"changefeed_id": "cf-m", "config_toml": REFERENCE_TOML})
    st, meta = _req(f"{base}/api/v2/unsafe/metadata")
    assert st == 200
    assert meta["kvs"][0]["key"] == "/ticdc/changefeed/info/cf-m"
    assert meta["kvs"][0]["value"]["state"] == "normal"
    st, _doc = _req(f"{base}/api/v2/unsafe/service_gc_safepoint", "DELETE")
    assert st == 200


def test_redact_mode_ladder(api):
    base, _ = api
    # invalid mode rejected at parse
    st, err = _req(f"{base}/api/v2/log/redact", "POST",
                   {"redact_info_log": "sometimes"})
    assert st == 400 and "redact" in err["error_msg"]
    # off -> marker
    st, doc = _req(f"{base}/api/v2/log/redact", "POST",
                   {"redact_info_log": "marker"})
    assert (st, doc) == (200, {"previous_mode": "off",
                               "current_mode": "marker"})
    # same mode is idempotent success
    st, doc = _req(f"{base}/api/v2/log/redact", "POST",
                   {"redact_info_log": "marker"})
    assert st == 200 and doc["current_mode"] == "marker"
    # marker -> on
    st, doc = _req(f"{base}/api/v2/log/redact", "POST",
                   {"redact_info_log": "on"})
    assert st == 200 and doc["previous_mode"] == "marker"
    # downgrade rejected (`log.go:152-157`)
    st, err = _req(f"{base}/api/v2/log/redact", "POST",
                   {"redact_info_log": "off"})
    assert st == 400 and "more restrictive" in err["error_msg"]


def test_failpoint_routes(api):
    from ticdc_spark import failpoint

    base, _ = api
    try:
        # empty list initially
        assert _req(f"{base}/debug/failpoints") == (200, [])
        # missing fields
        st, _err = _req(f"{base}/debug/failpoints", "POST", {"name": "x"})
        assert st == 400
        # bad grammar -> 500 (EnableFailpoint surfaces the error)
        st, _err = _req(f"{base}/debug/failpoints", "POST",
                        {"name": "x", "expr": "not-a-term"})
        assert st == 500
        # enable, observe in list AND in the armed registry
        st, _ = _req(f"{base}/debug/failpoints", "POST",
                     {"name": "api/test-point", "expr": "1*error(boom)"})
        assert st == 200
        st, lst = _req(f"{base}/debug/failpoints")
        assert lst == [{"name": "api/test-point", "expr": "1*error(boom)"}]
        assert "api/test-point" in failpoint.active()
        # the armed point actually fires
        with pytest.raises(RuntimeError):
            failpoint.inject("api/test-point")
        # disable via query param
        st, _ = _req(f"{base}/debug/failpoints?name=api/test-point",
                     "DELETE")
        assert st == 200
        assert _req(f"{base}/debug/failpoints") == (200, [])
        assert "api/test-point" not in failpoint.active()
        # disable without a name
        st, _err = _req(f"{base}/debug/failpoints", "DELETE", {})
        assert st == 400
    finally:
        failpoint.disable_all()


def test_debug_info_and_resolve_lock(api):
    base, _ = api
    st, info = _req(f"{base}/debug/info")
    assert st == 200 and info["pid"] > 0 and "changefeeds" in info
    st, _ = _req(f"{base}/api/v2/unsafe/resolve_lock", "POST",
                 {"region_id": 7, "ts": 123456})
    assert st == 200
    st, _err = _req(f"{base}/api/v2/unsafe/resolve_lock", "POST",
                    {"region_id": "seven", "ts": 1})
    assert st == 400


def test_metrics_exposition(api):
    base, reg = api
    reg.create("cf-metrics", REFERENCE_TOML)
    req = urllib.request.Request(f"{base}/metrics")
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    # FeedState.ToInt: normal = 0 (`pkg/config/changefeed.go:63-84`)
    assert 'ticdc_owner_status{changefeed="cf-metrics"} 0' in text
    assert "# TYPE ticdc_owner_status gauge" in text
    assert "ticdc_owner_ownership_counter 1" in text
    # second scrape bumps the counter
    with urllib.request.urlopen(req) as r:
        assert "ticdc_owner_ownership_counter 2" in r.read().decode()
    # paused changefeed reports stopped = 3
    reg.pause("cf-metrics")
    with urllib.request.urlopen(req) as r:
        text = r.read().decode()
    assert 'ticdc_owner_status{changefeed="cf-metrics"} 3' in text


def test_start_ts_before_gc_safepoint_refused(api, spark, sf_dir):
    base, reg = api
    # establish a GC safepoint by running a changefeed
    reg.create("cf-gc", REFERENCE_TOML)
    reg.run("cf-gc", spark, sf_dir, timeout_s=240)
    sp = reg.gc_safepoint()
    assert sp is not None
    st, err = _req(f"{base}/api/v2/changefeeds", "POST",
                   {"changefeed_id": "cf-behind",
                    "config_toml": REFERENCE_TOML,
                    "start_ts": sp - 1})
    assert st == 400
    assert err["error_code"] == "CDC:ErrStartTsBeforeGC"
    # at-or-after the safepoint is accepted
    st, _doc = _req(f"{base}/api/v2/changefeeds", "POST",
                    {"changefeed_id": "cf-ok",
                     "config_toml": REFERENCE_TOML,
                     "start_ts": sp})
    assert st == 200


def test_metrics_error_info_series(api, spark, sf_dir):
    base, reg = api
    cf = reg.create("cf-err", REFERENCE_TOML)
    import pytest as _pytest

    def boom(*a, **k):
        raise RuntimeError("sink connection reset")

    cf.start = boom
    with _pytest.raises(RuntimeError):
        reg.run("cf-err", spark, sf_dir, timeout_s=5)
    with urllib.request.urlopen(f"{base}/metrics") as r:
        text = r.read().decode()
    assert 'ticdc_owner_changefeed_error_info{changefeed="cf-err"' in text
    assert 'state="warning"' in text
    # FeedState warning = 6
    assert 'ticdc_owner_status{changefeed="cf-err"} 6' in text


def test_create_refuses_ineligible_tables(tmp_path):
    """ErrTableIneligible (`api/v2/changefeed.go:289-295`): a matched
    PK-less table refuses the create unless force-replicate or
    ignore-ineligible-table."""
    from ticdc_spark.api import ApiServer, default_schema_store

    store = default_schema_store()
    store.apply_ddl({
        "type": "create-table", "schema": "test", "table": "tp_nopk",
        "table_id": 99, "commit_ts": 0,
        "columns": [{"name": "id", "spark_type": "bigint"},
                    {"name": "val", "spark_type": "double"}],
    })
    reg = ChangefeedRegistry(str(tmp_path))
    srv = ApiServer(reg, schema_store=store)
    base = f"http://127.0.0.1:{srv.start()}"
    try:
        st, doc = _req(f"{base}/api/v2/changefeeds", "POST",
                       {"changefeed_id": "cf-bad",
                        "config_toml": REFERENCE_TOML})
        assert st == 400 and "ErrTableIneligible" in doc["error_msg"]
        assert "test.tp_nopk" in doc["error_msg"]
        # ignore-ineligible-table skips them silently
        st, _ = _req(f"{base}/api/v2/changefeeds", "POST",
                     {"changefeed_id": "cf-ok",
                      "config_toml": "ignore-ineligible-table = true\n"
                      + REFERENCE_TOML})
        assert st == 200
        # force-replicate admits them
        st, _ = _req(f"{base}/api/v2/changefeeds", "POST",
                     {"changefeed_id": "cf-force",
                      "config_toml": "force-replicate = true\n"
                      + REFERENCE_TOML})
        assert st == 200
        # a filter that excludes the PK-less table is fine
        st, _ = _req(f"{base}/api/v2/changefeeds", "POST",
                     {"changefeed_id": "cf-filtered",
                      "config_toml":
                      '[filter]\nrules = ["test.tp_click"]\n'})
        assert st == 200
    finally:
        srv.stop()


def test_resume_with_overwrite_checkpoint_ts_http(api, spark, sf_dir):
    """POST /resume with overwrite_checkpoint_ts in the body
    (`api/v2/changefeed.go:785-790` ResumeChangefeedConfig) rewinds the
    changefeed; bad values answer 400."""
    base, reg = api
    toml = '[sink]\nprotocol = "canal-json"\n'
    st, _ = _req(f"{base}/api/v2/changefeeds", "POST",
                 {"changefeed_id": "cf-rw", "config_toml": toml})
    assert st == 200
    reg.run("cf-rw", spark, sf_dir, timeout_s=240)
    ckpt = reg.get("cf-rw").checkpoint_ts()
    assert ckpt
    st, _ = _req(f"{base}/api/v2/changefeeds/cf-rw/pause", "POST")
    assert st == 200
    # invalid ts -> 400
    st, err = _req(f"{base}/api/v2/changefeeds/cf-rw/resume", "POST",
                   {"overwrite_checkpoint_ts": -5})
    assert st == 400 and "overwrite_checkpoint_ts" in err["error_msg"]
    # rewind to half the checkpoint
    st, doc = _req(f"{base}/api/v2/changefeeds/cf-rw/resume", "POST",
                   {"overwrite_checkpoint_ts": ckpt // 2})
    assert st == 200 and doc["state"] == "normal"
    reg.run("cf-rw", spark, sf_dir, timeout_s=240)
    # the rewound run re-checkpoints at the head
    assert reg.get("cf-rw").checkpoint_ts() == ckpt
