"""CLI tests — the `cmd/cdc/cli` twin driven against a live ApiServer,
full lifecycle through real HTTP."""

from __future__ import annotations

import io
import json

import pytest

from tests.test_control_plane import REFERENCE_TOML
from ticdc_spark.api import ApiServer
from ticdc_spark.cli import main
from ticdc_spark.streaming.registry import ChangefeedRegistry


@pytest.fixture()
def server(tmp_path):
    reg = ChangefeedRegistry(str(tmp_path / "wd"))
    srv = ApiServer(reg)
    port = srv.start()
    toml_path = tmp_path / "cf.toml"
    toml_path.write_text(
        REFERENCE_TOML + "\n[scheduler]\nenable-table-across-nodes = true\n")
    yield f"http://127.0.0.1:{port}", str(toml_path)
    srv.stop()


def run(server_url, *argv):
    out = io.StringIO()
    rc = main(["--server", server_url, *argv], out=out)
    return rc, json.loads(out.getvalue())


def test_changefeed_lifecycle(server):
    url, toml = server
    rc, doc = run(url, "changefeed", "create", "-c", "cf1", "--config", toml)
    assert rc == 0 and doc["state"] == "normal"
    rc, doc = run(url, "changefeed", "list")
    assert rc == 0 and doc["total"] == 1
    rc, doc = run(url, "changefeed", "query", "-c", "cf1")
    assert rc == 0 and "canal-json" in doc["config_toml"]
    rc, doc = run(url, "changefeed", "statistics", "-c", "cf1")
    assert rc == 0 and doc["state"] == "normal"
    rc, doc = run(url, "changefeed", "pause", "-c", "cf1")
    assert rc == 0 and doc["state"] == "stopped"
    rc, doc = run(url, "changefeed", "update", "-c", "cf1", "--config", toml)
    assert rc == 0
    rc, doc = run(url, "changefeed", "resume", "-c", "cf1")
    assert rc == 0 and doc["state"] == "normal"
    rc, doc = run(url, "changefeed", "split-table-by-region-count",
                  "-c", "cf1", "--table-id", "1",
                  "--n-regions", "7", "--spans-num", "2")
    assert rc == 0
    assert [s["end_region"] - s["start_region"] for s in doc["spans"]] == [4, 3]
    rc, _ = run(url, "changefeed", "move-table", "-c", "cf1")
    assert rc == 0
    rc, _ = run(url, "changefeed", "remove", "-c", "cf1")
    assert rc == 0
    # errors exit 1 with the server's error document
    rc, err = run(url, "changefeed", "query", "-c", "ghost")
    assert rc == 1 and "not found" in err["error_msg"]


def test_other_nouns(server):
    url, toml = server
    run(url, "changefeed", "create", "-c", "cf2", "--config", toml)
    rc, caps = run(url, "capture", "list")
    assert rc == 0 and caps["items"][0]["id"] == "driver"
    rc, procs = run(url, "processor", "list")
    assert rc == 0 and procs["total"] == 1
    rc, tso = run(url, "tso", "query")
    assert rc == 0 and tso["timestamp"] > 0
    rc, meta = run(url, "unsafe", "show-metadata")
    assert rc == 0 and meta["kvs"][0]["key"].endswith("cf2")
    rc, _ = run(url, "unsafe", "delete-service-gc-safepoint")
    assert rc == 0


def test_create_with_sink_uri(server):
    url, toml = server
    rc, doc = run(url, "changefeed", "create", "-c", "cf-uri",
                  "--config", toml, "--sink-uri", "mysql://root@h:4000/db")
    assert rc == 0 and doc["sink_uri"] == "mysql://root@h:4000/db"
    rc, doc = run(url, "changefeed", "query", "-c", "cf-uri")
    assert doc["sink_uri"] == "mysql://root@h:4000/db"


def test_consumer_replay_tool(server, spark, sf_dir, tmp_path):
    """cmd/kafka-consumer analog: run a changefeed, then rebuild state
    from its sink files via the CLI consumer verb."""
    from ticdc_spark.streaming.registry import ChangefeedRegistry

    reg = ChangefeedRegistry(str(tmp_path / "wd2"))
    reg.create("cf-replay", REFERENCE_TOML)
    reg.run("cf-replay", spark, sf_dir, timeout_s=240)
    sink_dir = reg.get("cf-replay").sink_dir
    out_dir = str(tmp_path / "state")
    rc, doc = run("http://unused", "consumer", "replay",
                  "--sink-dir", sink_dir, "--output", out_dir)
    assert rc == 0 and doc["rows"] > 0
    state = spark.read.parquet(out_dir)
    assert {"schema_name", "table_name", "id", "val", "k"} <= set(state.columns)


def test_unsafe_resolve_lock_and_move_split(server):
    url, toml = server
    rc, _ = run(url, "unsafe", "resolve-lock", "--region-id", "3",
                "--ts", "42")
    assert rc == 0
    rc, doc = run(url, "changefeed", "create", "-c", "cf-ms",
                  "--config", toml)
    assert rc == 0
    rc, doc = run(url, "changefeed", "move-split-table", "-c", "cf-ms")
    assert rc == 0 and "single-node" in doc.get("note", "")


def test_unsafe_reset_wipes_changefeeds(server):
    url, toml = server
    for cid in ("cf-r1", "cf-r2"):
        rc, _ = run(url, "changefeed", "create", "-c", cid,
                    "--config", toml)
        assert rc == 0
    rc, doc = run(url, "unsafe", "reset")
    assert rc == 0
    assert doc["removed_changefeeds"] == ["cf-r1", "cf-r2"]
    rc, lst = run(url, "changefeed", "list")
    # reference DELETE moves feeds to removed; none stay listable-normal
    assert all(item["state"] == "removed" for item in lst["items"])
