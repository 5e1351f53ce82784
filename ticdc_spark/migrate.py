"""Old-TiCDC metadata migration — `pkg/migrate/migrate.go`.

The reference upgrades a cluster in place: old etcd keys
(`/tidb/cdc/changefeed/info/<id>`, `/tidb/cdc/job/<id>`) move to the
new cluster/keyspace-scoped layout, every ChangeFeedInfo document gets
its upstream id + default keyspace + name (recovered from the key path)
stamped in, and the meta-version key advances to ``CDC_META_VERSION``
exactly once (`migrate.go:164-280`).  Version gating
(`ShouldMigrate`): newer-than-us metadata is an error, equal is a
no-op, older/absent migrates.

Here the "etcd dump" is a plain dict of key → JSON string (our
registry's `unsafe/metadata` shape), so the migration is a pure
function — testable without a live store — plus a seeding hook into
:class:`ChangefeedRegistry`.
"""
from __future__ import annotations

import json
from urllib.parse import urlsplit, urlunsplit

CDC_META_VERSION = 1  # `migrate.go:52` cdcMetaVersion
NO_META_VERSION = -1
DEFAULT_KEYSPACE = "default"

OLD_CHANGEFEED_PREFIX = "/tidb/cdc/changefeed/info"
OLD_JOB_PREFIX = "/tidb/cdc/job"
NEW_CHANGEFEED_PREFIX = "/ticdc/default/default/changefeed/info"
NEW_STATUS_PREFIX = "/ticdc/default/default/changefeed/status"
META_VERSION_KEY = "/ticdc/default/__meta_version__"


class MigrateError(RuntimeError):
    pass


def should_migrate(meta_version: int) -> bool:
    """`ShouldMigrate` + the in-migrate guard (`migrate.go:181-189`)."""
    if meta_version > CDC_META_VERSION:
        raise MigrateError(
            f"metadata version {meta_version} is newer than this engine's "
            f"{CDC_META_VERSION}; refusing to touch it")
    return meta_version < CDC_META_VERSION  # NO_META_VERSION included


def mask_changefeed_info(doc_json: str) -> str:
    """`maskChangefeedInfo` (`migrate.go:343-371`): credentials become
    ``username:password`` and the host ``***`` before the document is
    logged.  Only the log copy is masked — the stored document keeps the
    real URI."""
    try:
        doc = json.loads(doc_json)
    except ValueError:
        return doc_json
    uri = doc.get("sink-uri")
    if not isinstance(uri, str):
        return doc_json
    parts = urlsplit(uri)
    netloc = parts.netloc
    if "@" in netloc:
        _, host = netloc.rsplit("@", 1)
        netloc = "username:password@" + host
        host_only = host
    else:
        host_only = netloc
    if host_only:
        netloc = netloc[: len(netloc) - len(host_only)] + "***"
    doc["sink-uri"] = urlunsplit(
        (parts.scheme, netloc, parts.path, parts.query, parts.fragment))
    return json.dumps(doc)


def migrate_metadata(
    old_kvs: dict[str, str],
    meta_version: int = NO_META_VERSION,
    upstream_id: int = 1,
) -> dict[str, str]:
    """Pure migration: old dump → new-layout dump.

    Changefeed info documents are rewritten (upstream-id, keyspace,
    name-from-key, `migrate.go:229-246`); job/status documents move
    verbatim (`migrate.go:251-252`); unknown keys stay untouched;
    the meta-version key lands at ``CDC_META_VERSION``.
    """
    if not should_migrate(meta_version):
        return dict(old_kvs)  # already current: no-op (`migrate.go:188`)
    out: dict[str, str] = {}
    for key, value in old_kvs.items():
        if key.startswith(OLD_CHANGEFEED_PREFIX + "/"):
            cid = key[len(OLD_CHANGEFEED_PREFIX) + 1:]
            try:
                doc = json.loads(value)
            except ValueError as e:
                raise MigrateError(
                    f"unmarshal changefeed {cid} failed: {e}") from None
            doc["upstream-id"] = upstream_id
            doc["keyspace"] = DEFAULT_KEYSPACE
            doc["changefeed-id"] = cid
            out[f"{NEW_CHANGEFEED_PREFIX}/{cid}"] = json.dumps(doc)
        elif key.startswith(OLD_JOB_PREFIX + "/"):
            cid = key[len(OLD_JOB_PREFIX) + 1:]
            out[f"{NEW_STATUS_PREFIX}/{cid}"] = value
        else:
            out[key] = value
    out[META_VERSION_KEY] = str(CDC_META_VERSION)
    return out


def seed_registry(new_kvs: dict[str, str], registry) -> list[str]:
    """Create a changefeed in our :class:`ChangefeedRegistry` for every
    migrated info document (the coordinator-restart analog: migrated
    feeds resume under the new engine).  Old documents carry the replica
    config as a nested JSON object; it feeds `parse_changefeed_config`
    (fmt=json) unchanged — same dashed field names."""
    created = []
    for key, value in sorted(new_kvs.items()):
        if not key.startswith(NEW_CHANGEFEED_PREFIX + "/"):
            continue
        doc = json.loads(value)
        cid = doc["changefeed-id"]
        cfg = doc.get("config") or {}
        registry.create(cid, json.dumps(cfg), fmt="json",
                        sink_uri=doc.get("sink-uri"))
        created.append(cid)
    return created
