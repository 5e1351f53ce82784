"""``cdc cli`` — command-line twin of the reference CLI
(`cmd/cdc/cli/cli.go` + per-command files) over the HTTP api/v2 surface.

Command tree (reference file in parens):

    changefeed create --changefeed-id --config      (cli_changefeed_create.go)
    changefeed list                                 (cli_changefeed_list.go)
    changefeed query --changefeed-id                (cli_changefeed_query.go)
    changefeed pause|resume|remove --changefeed-id  (cli_changefeed_{pause,resume,remove}.go)
    changefeed update --changefeed-id --config      (cli_changefeed_update.go)
    changefeed statistics --changefeed-id           (cli_changefeed_statistics.go)
    changefeed split-table-by-region-count --changefeed-id --table-id
        [--n-regions --spans-num]                   (cli_changefeed_split_table_by_region_count.go)
    changefeed move-table|merge-table --changefeed-id  (placement no-ops)
    capture list                                    (cli_capture_list.go)
    processor list                                  (processor.go)
    tso query                                       (cli_tso_query.go)
    unsafe show-metadata                            (cli_unsafe_show_metadata.go)
    unsafe delete-service-gc-safepoint              (cli_unsafe_delete_service_gc_safepoint.go)

Every command issues one HTTP call against ``--server`` and prints the
JSON response; non-2xx exits 1 — same contract as the reference CLI
(which talks to the same api/v2 routes).
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.error
import urllib.request


# transport options bound by main() from --ca/--cert/--key/--user/
# --password (the reference cli's security flags,
# `pkg/security/credential.go`; e2e `cli_with_auth`)
_CALL_OPTS: dict = {}


def _call(server: str, path: str, method: str = "GET", body: dict | None = None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(server.rstrip("/") + path, data=data, method=method)
    ctx = None
    if _CALL_OPTS.get("ca"):
        from ticdc_spark.codec import tlsutil

        ctx = tlsutil.client_context(
            _CALL_OPTS["ca"], _CALL_OPTS.get("cert"), _CALL_OPTS.get("key"))
    if _CALL_OPTS.get("user") is not None:
        import base64

        tok = base64.b64encode(
            f"{_CALL_OPTS['user']}:{_CALL_OPTS.get('password') or ''}"
            .encode()).decode()
        req.add_header("Authorization", f"Basic {tok}")
    try:
        with urllib.request.urlopen(req, context=ctx) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _emit(status: int, doc, out=sys.stdout) -> int:
    json.dump(doc, out, indent=2, sort_keys=True)
    out.write("\n")
    return 0 if 200 <= status < 300 else 1


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="cdc cli")
    p.add_argument("--server", default="http://127.0.0.1:8300",
                   help="api/v2 server address")
    p.add_argument("--ca", default=None,
                   help="CA certificate PEM path for https --server")
    p.add_argument("--cert", default=None,
                   help="client certificate PEM path (mTLS)")
    p.add_argument("--key", default=None,
                   help="client private key PEM path (mTLS)")
    p.add_argument("--user", default=None,
                   help="API username (client-user-required servers)")
    p.add_argument("--password", default=None, help="API password")
    sub = p.add_subparsers(dest="noun", required=True)

    cf = sub.add_parser("changefeed").add_subparsers(dest="verb", required=True)

    def cf_cmd(name: str, config: bool = False, table_id: bool = False):
        c = cf.add_parser(name)
        c.add_argument("--changefeed-id", "-c", required=True)
        if config:
            c.add_argument("--config", required=True,
                           help="changefeed TOML config file")
            c.add_argument("--sink-uri", default=None,
                           help="downstream URI (kafka://, mysql://, s3://...)")
        if table_id:
            c.add_argument("--table-id", type=int, required=True)
            c.add_argument("--n-regions", type=int, default=1)
            c.add_argument("--spans-num", type=int, default=1)
        return c

    cf_cmd("create", config=True)
    cf.add_parser("list")
    cf_cmd("query")
    cf_cmd("pause")
    cf_cmd("resume")
    cf_cmd("remove")
    cf_cmd("update", config=True)
    cf_cmd("statistics")
    cf_cmd("split-table-by-region-count", table_id=True)
    cf_cmd("move-table")
    cf_cmd("move-split-table")
    cf_cmd("merge-table")

    cap = sub.add_parser("capture").add_subparsers(dest="verb", required=True)
    cap.add_parser("list")
    proc = sub.add_parser("processor").add_subparsers(dest="verb", required=True)
    proc.add_parser("list")
    tso = sub.add_parser("tso").add_subparsers(dest="verb", required=True)
    tso.add_parser("query")
    uns = sub.add_parser("unsafe").add_subparsers(dest="verb", required=True)
    uns.add_parser("show-metadata")
    uns.add_parser("delete-service-gc-safepoint")
    rl = uns.add_parser("resolve-lock")  # cli_unsafe_resolve_lock.go
    rl.add_argument("--region-id", type=int, required=True)
    rl.add_argument("--ts", type=int, default=0)
    uns.add_parser("reset")  # cli_unsafe_reset.go: drop ALL cdc metadata
    # consumer tools (`cmd/kafka-consumer`, `cmd/storage-consumer`):
    # decode a changefeed's sink output and rebuild table state locally
    con = sub.add_parser("consumer").add_subparsers(dest="verb", required=True)
    rep = con.add_parser("replay")
    rep.add_argument("--sink-dir", required=True,
                     help="a changefeed's sink output directory")
    rep.add_argument("--output", required=True,
                     help="parquet directory for the rebuilt state")
    return p


def main(argv: list[str] | None = None, out=sys.stdout) -> int:
    a = build_parser().parse_args(argv)
    s = a.server
    _CALL_OPTS.clear()
    for flag in ("ca", "cert", "key"):
        path = getattr(a, flag, None)
        if path:
            with open(path, "rb") as f:
                _CALL_OPTS[flag] = f.read()
    if getattr(a, "user", None) is not None:
        _CALL_OPTS["user"] = a.user
        _CALL_OPTS["password"] = a.password
    if a.noun == "changefeed":
        cid = getattr(a, "changefeed_id", None)
        if a.verb == "create":
            with open(a.config) as f:
                toml = f.read()
            body = {"changefeed_id": cid, "config_toml": toml}
            if a.sink_uri:
                body["sink_uri"] = a.sink_uri
            return _emit(*_call(s, "/api/v2/changefeeds", "POST", body),
                         out=out)
        if a.verb == "list":
            return _emit(*_call(s, "/api/v2/changefeeds"), out=out)
        if a.verb == "query":
            return _emit(*_call(s, f"/api/v2/changefeeds/{cid}"), out=out)
        if a.verb in ("pause", "resume"):
            return _emit(*_call(s, f"/api/v2/changefeeds/{cid}/{a.verb}",
                                "POST"), out=out)
        if a.verb == "remove":
            return _emit(*_call(s, f"/api/v2/changefeeds/{cid}", "DELETE"),
                         out=out)
        if a.verb == "update":
            with open(a.config) as f:
                toml = f.read()
            return _emit(*_call(s, f"/api/v2/changefeeds/{cid}", "PUT",
                                {"config_toml": toml}), out=out)
        if a.verb == "statistics":
            return _emit(*_call(s, f"/api/v2/changefeeds/{cid}/status"),
                         out=out)
        if a.verb == "split-table-by-region-count":
            return _emit(*_call(
                s,
                f"/api/v2/changefeeds/{cid}/split_table_by_region_count"
                f"?tableID={a.table_id}",
                "POST",
                {"n_regions": a.n_regions, "spans_num": a.spans_num},
            ), out=out)
        if a.verb in ("move-table", "move-split-table", "merge-table"):
            return _emit(*_call(
                s, f"/api/v2/changefeeds/{cid}/{a.verb.replace('-', '_')}",
                "POST", {}), out=out)
    if a.noun == "capture":
        return _emit(*_call(s, "/api/v2/captures"), out=out)
    if a.noun == "processor":
        return _emit(*_call(s, "/api/v2/processors"), out=out)
    if a.noun == "tso":
        return _emit(*_call(s, "/api/v2/tso", "POST", {}), out=out)
    if a.noun == "unsafe":
        if a.verb == "show-metadata":
            return _emit(*_call(s, "/api/v2/unsafe/metadata"), out=out)
        if a.verb == "resolve-lock":
            return _emit(*_call(s, "/api/v2/unsafe/resolve_lock", "POST",
                                {"region_id": a.region_id, "ts": a.ts}),
                         out=out)
        if a.verb == "reset":
            # `cli_unsafe_reset.go` wipes every changefeed plus the
            # service GC safepoint; over the API that is list → delete
            # each → drop the safepoint.
            code, lst = _call(s, "/api/v2/changefeeds")
            removed = []
            if code == 200:
                for item in lst.get("items", []):
                    _call(s, f"/api/v2/changefeeds/{item['id']}", "DELETE")
                    removed.append(item["id"])
            code, _ = _call(s, "/api/v2/unsafe/service_gc_safepoint",
                            "DELETE")
            return _emit(code, {"removed_changefeeds": sorted(removed)},
                         out=out)
        return _emit(*_call(s, "/api/v2/unsafe/service_gc_safepoint",
                            "DELETE"), out=out)
    if a.noun == "consumer":
        # local Spark job, no HTTP: the consumer is its own process in
        # the reference too (cmd/kafka-consumer applies to MySQL; here
        # the rebuilt state lands in parquet for diffing)
        from ticdc_spark.session import get_spark
        from ticdc_spark.sinks.consumer import replay_sink_dir

        spark = get_spark("ticdc-consumer")
        state = replay_sink_dir(spark, a.sink_dir)
        state.write.mode("overwrite").parquet(a.output)
        n = spark.read.parquet(a.output).count()
        return _emit(200, {"rows": n, "output": a.output}, out=out)
    raise AssertionError("unreachable")


if __name__ == "__main__":
    sys.exit(main())
