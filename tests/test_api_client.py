"""Python client SDK (`client.py`, the `pkg/api/v2` Go client twin)
driven against a live ApiServer."""

from __future__ import annotations

import pytest

from tests.test_control_plane import REFERENCE_TOML
from ticdc_spark.api import ApiServer
from ticdc_spark.client import ApiClient, ApiError
from ticdc_spark.streaming.registry import ChangefeedRegistry


@pytest.fixture()
def client(tmp_path):
    reg = ChangefeedRegistry(str(tmp_path))
    srv = ApiServer(reg)
    port = srv.start()
    yield ApiClient(f"http://127.0.0.1:{port}")
    srv.stop()


def test_lifecycle_through_sdk(client):
    assert client.health()
    doc = client.changefeeds.create("cf-sdk", REFERENCE_TOML)
    assert doc["state"] == "normal"
    assert [i["id"] for i in client.changefeeds.list()] == ["cf-sdk"]
    client.changefeeds.pause("cf-sdk")
    assert client.changefeeds.get("cf-sdk")["state"] == "stopped"
    client.changefeeds.resume("cf-sdk")
    assert client.changefeeds.get("cf-sdk")["state"] == "normal"
    st = client.changefeeds.status("cf-sdk")
    assert "state" in st
    assert client.changefeeds.get_dispatcher_count("cf-sdk") > 0
    assert client.changefeeds.tables("cf-sdk")
    client.changefeeds.delete("cf-sdk")
    assert client.changefeeds.list(state="normal") == []


def test_errors_surface_as_api_error(client):
    with pytest.raises(ApiError) as ei:
        client.changefeeds.get("nope")
    assert ei.value.status == 400
    assert "not found" in ei.value.message


def test_groups_and_server_level(client):
    t1, t2 = client.tso.query(), client.tso.query()
    assert t2 >= t1 > 0
    assert client.captures.list()[0]["is_owner"] is True
    client.changefeeds.create("cf-g", REFERENCE_TOML)
    assert client.processors.get("cf-g", "driver")["changefeed_id"] == "cf-g"
    out = client.changefeeds.verify_table(["*.*"])
    assert out["eligible_tables"]
    client.unsafe.resolve_lock(region_id=1, ts=9)
    assert any("cf-g" in kv["key"] for kv in client.unsafe.metadata())
    client.set_log_level("debug")
    assert client.set_redact_mode("marker")["current_mode"] == "marker"
    assert "ticdc_owner_status" in client.metrics_text()
    client.resign_owner()
    client.unsafe.delete_service_gc_safepoint()


def test_rfc_error_codes(client):
    with pytest.raises(ApiError) as ei:
        client.changefeeds.get("ghost")
    assert ei.value.code == "CDC:ErrChangeFeedNotExists"
    client.changefeeds.create("cf-dup", REFERENCE_TOML)
    with pytest.raises(ApiError) as ei:
        client.changefeeds.create("cf-dup", REFERENCE_TOML)
    assert ei.value.code == "CDC:ErrChangeFeedAlreadyExists"
    with pytest.raises(ApiError) as ei:
        client.changefeeds.update("cf-dup", "")  # running: update refused
    assert ei.value.code == "CDC:ErrChangefeedUpdateRefused"
    with pytest.raises(ApiError) as ei:
        client.set_log_level("shout")
    assert ei.value.code == "CDC:ErrAPIInvalidParam"
