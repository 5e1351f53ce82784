"""S4/S5 — SchemaStore: versioned table metadata built by applying DDL
events, with as-of lookup.

Reference: the schema store ingests parsed DDL jobs and applies a
per-action handler (`logservice/schemastore/persist_storage_ddl_handlers.go:
120-462` — 38 action types), keeps EVERY historical TableInfo version
(`logservice/schemastore/multi_version.go`), and answers
``GetTableInfo(tableID, ts)`` = largest version ≤ ts
(`logservice/schemastore/schema_store.go:50-54`) plus
``GetAllPhysicalTables`` (`:44`) and ``FetchTableDDLEvents(start, end]``
(`:62`).

This is the driver-side control plane of the Spark engine (schemas are
small metadata): handlers mutate an in-memory multi-version map; the
data plane consumes it either as a broadcast registry DataFrame
(``registry_df`` → `plans/schema_registry.asof_bind_schema_join`) or as
literal as-of expressions compiled into the changelog mount
(`sources/typed.py`). Spark structural notes per handler are in each
method docstring.

Covers ALL 38 reference action types
(`persist_storage_ddl_handlers.go:120-462`): schema/table/column DDL,
index + FK + PK actions, partition lifecycle (add/drop/truncate/
exchange/reorganize/alter-partitioning/remove-partitioning), TTL,
charset/collation at schema/table/column level, views, recover-table,
batch create-tables and multi-table rename, and multi-schema-change.
Actions that don't change row shape still bump the table version
(consumers re-plan against the new version — same discipline as the
reference's SetVersion-only handlers).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

DEFAULT_CHARSET = "utf8mb4"


@dataclass(frozen=True)
class ColumnInfo:
    """Per-column meta (`pkg/common/column.go:25-36`: name, type, flags,
    per-column charset — GBK et al. ride each column in the reference)."""
    name: str
    spark_type: str          # §1.3 mapping, e.g. "bigint", "double", "string"
    nullable: bool = True
    primary_key: bool = False
    charset: str | None = None   # None = inherit table charset
    default: str | None = None   # ActionSetDefaultValue

    def meta_str(self) -> str:
        """Canonical per-column descriptor used by version exports —
        pins every column-level handler effect in one comparable token."""
        return (f"{self.name}:{self.spark_type}:{int(self.nullable)}:"
                f"{int(self.primary_key)}:{self.charset or ''}:"
                f"{self.default or ''}")


@dataclass(frozen=True)
class TableInfo:
    """`pkg/common/table_info.go:79-117` analog: naming + columns +
    PK/UK eligibility + version (UpdateTS) + table attributes the DDL
    handlers mutate (charset, comment, TTL, partition physical ids)."""
    table_id: int
    schema_name: str
    table_name: str
    columns: tuple[ColumnInfo, ...]
    version_ts: int
    dropped: bool = False
    charset: str = DEFAULT_CHARSET
    comment: str = ""
    ttl: str | None = None            # ActionAlterTTLInfo / TTLRemove
    partitions: tuple[int, ...] = ()  # physical partition table ids

    @property
    def has_pk_or_not_null_uk(self) -> bool:
        # eligibility flag `table_info.go:98` — replication needs a handle
        return any(c.primary_key and not c.nullable for c in self.columns)

    def column_names(self) -> list[str]:
        return [c.name for c in self.columns]

    def spark_schema_ddl(self) -> str:
        """Spark DDL string for the payload struct at this version."""
        return ", ".join(f"{c.name} {c.spark_type}" for c in self.columns)

    def physical_ids(self) -> tuple[int, ...]:
        """Physical table ids carrying rows: the partitions when
        partitioned, else the table id itself."""
        return self.partitions if self.partitions else (self.table_id,)


class DDLError(ValueError):
    pass


class SchemaStore:
    """Multi-versioned store: every (table_id → sorted [(ts, TableInfo)])
    plus the DDL event log for ``fetch_table_ddl_events``."""

    def __init__(self) -> None:
        self._schemas: set[str] = set()
        self._versions: dict[int, list[tuple[int, TableInfo]]] = {}
        self._by_name: dict[tuple[str, str], int] = {}  # current name → id
        self._ddl_log: list[dict] = []
        self._next_id = 1

    # -- lookups (schema_store.go:41-68) ----------------------------------
    def get_table_info(self, table_id: int, ts: int) -> TableInfo:
        """Largest version with version_ts <= ts (`schema_store.go:50-54`)."""
        versions = self._versions.get(table_id)
        if not versions:
            raise DDLError(f"unknown table id {table_id}")
        best = None
        for vts, info in versions:
            if vts <= ts:
                best = info
            else:
                break
        if best is None:
            raise DDLError(f"table {table_id} has no version <= {ts}")
        if best.dropped:
            raise DDLError(f"table {table_id} is dropped as of {ts}")
        return best

    def get_all_physical_tables(self, ts: int) -> list[TableInfo]:
        out = []
        for tid in self._versions:
            try:
                out.append(self.get_table_info(tid, ts))
            except DDLError:
                continue
        return sorted(out, key=lambda t: t.table_id)

    def fetch_table_ddl_events(self, table_id: int, start_ts: int, end_ts: int) -> list[dict]:
        """DDLs for one table in (start_ts, end_ts] (`schema_store.go:62`)."""
        return [
            e for e in self._ddl_log
            if e.get("table_id") == table_id and start_ts < e["commit_ts"] <= end_ts
        ]

    # -- apply (persist_storage_ddl_handlers.go:120-462) -------------------
    def apply_ddl(self, ddl: dict) -> None:
        """ddl: {"type": ..., "commit_ts": int, ...action fields}.

        Version discipline: a new TableInfo is appended at commit_ts;
        earlier versions stay answerable (as-of reads at older ts see the
        old shape — exactly the reference's multi-version store).
        """
        handler = getattr(self, "_h_" + ddl["type"].replace("-", "_"), None)
        if handler is None:
            raise DDLError(f"unsupported DDL action: {ddl['type']}")
        handler(ddl)
        self._ddl_log.append(dict(ddl))

    def _push(self, info: TableInfo) -> None:
        vs = self._versions.setdefault(info.table_id, [])
        if vs and vs[-1][0] > info.version_ts:
            raise DDLError("DDL commit_ts regressed")
        vs.append((info.version_ts, info))

    def _current(self, ddl: dict) -> TableInfo:
        key = (ddl["schema"], ddl["table"])
        tid = ddl.get("table_id") or self._by_name.get(key)
        if tid is None:
            raise DDLError(f"unknown table {key[0]}.{key[1]}")
        info = self._versions[tid][-1][1]
        if info.dropped:
            raise DDLError(f"table {key[0]}.{key[1]} is dropped")
        return info

    # each handler notes its Spark-side structural consequence
    def _h_create_schema(self, ddl: dict) -> None:
        self._schemas.add(ddl["schema"])

    def _h_drop_schema(self, ddl: dict) -> None:
        """Drops every table in the schema (handlers `:120-170`)."""
        self._schemas.discard(ddl["schema"])
        for (s, t), tid in list(self._by_name.items()):
            if s == ddl["schema"]:
                cur = self._versions[tid][-1][1]
                self._push(replace(cur, dropped=True, version_ts=ddl["commit_ts"]))
                del self._by_name[(s, t)]

    def _h_create_table(self, ddl: dict) -> None:
        """Spark: a new per-table stream/DataFrame becomes plannable."""
        key = (ddl["schema"], ddl["table"])
        if key in self._by_name:
            raise DDLError(f"table {key[0]}.{key[1]} already exists")
        tid = ddl.get("table_id") or self._next_id
        self._next_id = max(self._next_id, tid) + 1
        cols = tuple(ColumnInfo(**c) for c in ddl["columns"])
        info = TableInfo(tid, key[0], key[1], cols, ddl["commit_ts"])
        self._push(info)
        self._by_name[key] = tid

    def _h_drop_table(self, ddl: dict) -> None:
        cur = self._current(ddl)
        self._push(replace(cur, dropped=True, version_ts=ddl["commit_ts"]))
        del self._by_name[(cur.schema_name, cur.table_name)]

    def _h_truncate_table(self, ddl: dict) -> None:
        """Truncate assigns a NEW physical table id (the reference treats
        truncate as drop+create of the data keyspace, handlers `:241`);
        Spark: storage-sink paths bump tableVersion, state for the old id
        is discarded."""
        cur = self._current(ddl)
        self._push(replace(cur, dropped=True, version_ts=ddl["commit_ts"]))
        new_id = self._next_id
        self._next_id += 1
        info = replace(cur, table_id=new_id, version_ts=ddl["commit_ts"], dropped=False)
        self._versions[new_id] = []
        self._push(info)
        self._by_name[(cur.schema_name, cur.table_name)] = new_id

    def _h_rename_table(self, ddl: dict) -> None:
        """Same table_id, new name (incl. the multi-table form `:391` via
        one event per table); Spark: routing/encoders read the new name
        from the bound version."""
        cur = self._current(ddl)
        new_key = (ddl.get("to_schema", cur.schema_name), ddl["to_table"])
        if new_key in self._by_name:
            raise DDLError(f"target table {new_key[0]}.{new_key[1]} exists")
        self._push(replace(cur, schema_name=new_key[0], table_name=new_key[1],
                           version_ts=ddl["commit_ts"]))
        del self._by_name[(cur.schema_name, cur.table_name)]
        self._by_name[new_key] = cur.table_id

    def _h_add_column(self, ddl: dict) -> None:
        """Spark: rows mounted at older versions carry NULL for the new
        column (see sources/typed.py — version-gated payload fields)."""
        cur = self._current(ddl)
        col = ColumnInfo(**ddl["column"])
        if col.name in cur.column_names():
            raise DDLError(f"column {col.name} exists")
        self._push(replace(cur, columns=cur.columns + (col,),
                           version_ts=ddl["commit_ts"]))

    def _h_drop_column(self, ddl: dict) -> None:
        cur = self._current(ddl)
        name = ddl["column_name"]
        if name not in cur.column_names():
            raise DDLError(f"column {name} missing")
        kept = tuple(c for c in cur.columns if c.name != name)
        if any(c.primary_key for c in cur.columns) and not any(
            c.primary_key for c in kept
        ):
            raise DDLError("cannot drop the handle column")
        self._push(replace(cur, columns=kept, version_ts=ddl["commit_ts"]))

    def _h_modify_column(self, ddl: dict) -> None:
        """Type/nullability change; Spark: a cast in the mount bound to
        versions ≥ this one."""
        cur = self._current(ddl)
        col = ColumnInfo(**ddl["column"])
        if col.name not in cur.column_names():
            raise DDLError(f"column {col.name} missing")
        cols = tuple(col if c.name == col.name else c for c in cur.columns)
        self._push(replace(cur, columns=cols, version_ts=ddl["commit_ts"]))

    def _h_rename_column(self, ddl: dict) -> None:
        cur = self._current(ddl)
        old, new = ddl["from_name"], ddl["to_name"]
        if old not in cur.column_names():
            raise DDLError(f"column {old} missing")
        if new in cur.column_names():
            raise DDLError(f"column {new} exists")
        cols = tuple(
            replace(c, name=new) if c.name == old else c for c in cur.columns
        )
        self._push(replace(cur, columns=cols, version_ts=ddl["commit_ts"]))

    def _h_add_index(self, ddl: dict) -> None:
        """Row shape unchanged — version bump only (consumers may re-plan
        index-value partitioners)."""
        cur = self._current(ddl)
        self._push(replace(cur, version_ts=ddl["commit_ts"]))

    _h_drop_index = _h_add_index

    def _h_exchange_partition(self, ddl: dict) -> None:
        """Partition ↔ table identity swap (handlers `:382`): both ids
        keep their data but swap (schema, table) bindings."""
        a = self._current({"schema": ddl["schema"], "table": ddl["table"]})
        b = self._current({"schema": ddl["with_schema"], "table": ddl["with_table"]})
        ts = ddl["commit_ts"]
        self._push(replace(a, schema_name=b.schema_name, table_name=b.table_name,
                           version_ts=ts))
        self._push(replace(b, schema_name=a.schema_name, table_name=a.table_name,
                           version_ts=ts))
        self._by_name[(a.schema_name, a.table_name)] = b.table_id
        self._by_name[(b.schema_name, b.table_name)] = a.table_id

    def _h_multi_schema_change(self, ddl: dict) -> None:
        """One DDL carrying several sub-actions at one commit_ts
        (handlers `:409`) — applied in order, atomically versioned."""
        for sub in ddl["actions"]:
            sub = dict(sub)
            sub["commit_ts"] = ddl["commit_ts"]
            handler = getattr(self, "_h_" + sub["type"].replace("-", "_"))
            handler(sub)

    # -- data-plane export --------------------------------------------------
    def registry_rows(self) -> list[tuple[int, int, str, str, str]]:
        """(table_id, version_ts, schema, table, columns_ddl) rows for a
        broadcast registry DataFrame (`asof_bind_schema_join`)."""
        rows = []
        for tid, versions in sorted(self._versions.items()):
            for vts, info in versions:
                if not info.dropped:
                    rows.append((tid, vts, info.schema_name, info.table_name,
                                 info.spark_schema_ddl()))
        return rows
