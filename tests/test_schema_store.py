"""SchemaStore (S4/S5): DDL handlers + multi-version as-of lookups.

Mirrors the reference's schema-store behaviors: as-of = largest version
<= ts (`schema_store.go:50-54`), truncate assigns a new physical id,
renames keep the id, drops end visibility, multi-schema-change is
atomic, and the exported registry feeds the broadcast as-of join.
"""

from __future__ import annotations

import pytest

from ticdc_spark.plans.schema_store import DDLError, SchemaStore


def _mk_store() -> SchemaStore:
    st = SchemaStore()
    st.apply_ddl({"type": "create-schema", "schema": "test", "commit_ts": 10})
    st.apply_ddl({
        "type": "create-table", "schema": "test", "table": "t1",
        "table_id": 100, "commit_ts": 20,
        "columns": [
            {"name": "id", "spark_type": "bigint", "nullable": False,
             "primary_key": True},
            {"name": "val", "spark_type": "double"},
        ],
    })
    return st


def test_asof_add_drop_column():
    st = _mk_store()
    st.apply_ddl({"type": "add-column", "schema": "test", "table": "t1",
                  "commit_ts": 30, "column": {"name": "k", "spark_type": "bigint"}})
    st.apply_ddl({"type": "drop-column", "schema": "test", "table": "t1",
                  "commit_ts": 40, "column_name": "val"})
    assert st.get_table_info(100, 25).column_names() == ["id", "val"]
    assert st.get_table_info(100, 35).column_names() == ["id", "val", "k"]
    assert st.get_table_info(100, 45).column_names() == ["id", "k"]
    # before the table existed
    with pytest.raises(DDLError):
        st.get_table_info(100, 15)


def test_truncate_new_physical_id():
    st = _mk_store()
    st.apply_ddl({"type": "truncate-table", "schema": "test", "table": "t1",
                  "commit_ts": 50})
    tables = st.get_all_physical_tables(55)
    assert len(tables) == 1 and tables[0].table_id != 100
    # the old id is dropped as of the truncate, alive before it
    assert st.get_table_info(100, 45).table_name == "t1"
    with pytest.raises(DDLError):
        st.get_table_info(100, 55)


def test_rename_keeps_id_and_history():
    st = _mk_store()
    st.apply_ddl({"type": "rename-table", "schema": "test", "table": "t1",
                  "to_table": "t1_new", "commit_ts": 60})
    assert st.get_table_info(100, 65).table_name == "t1_new"
    assert st.get_table_info(100, 25).table_name == "t1"
    # old name is free again
    st.apply_ddl({"type": "create-table", "schema": "test", "table": "t1",
                  "commit_ts": 70,
                  "columns": [{"name": "id", "spark_type": "bigint",
                               "nullable": False, "primary_key": True}]})
    assert len(st.get_all_physical_tables(75)) == 2


def test_multi_schema_change_atomic():
    st = _mk_store()
    st.apply_ddl({
        "type": "multi-schema-change", "schema": "test", "table": "t1",
        "commit_ts": 80,
        "actions": [
            {"type": "add-column", "schema": "test", "table": "t1",
             "column": {"name": "a", "spark_type": "string"}},
            {"type": "rename-column", "schema": "test", "table": "t1",
             "from_name": "val", "to_name": "v2"},
        ],
    })
    assert st.get_table_info(100, 85).column_names() == ["id", "v2", "a"]
    assert st.get_table_info(100, 79).column_names() == ["id", "val"]


def test_exchange_partition_swaps_physical_ids():
    """Reference semantics (`persist_storage_ddl_handlers.go:382`): the
    named partition and the plain table trade physical keyspaces; both
    keep their logical names."""
    st = _mk_store()
    st.apply_ddl({"type": "create-table", "schema": "test", "table": "plain",
                  "table_id": 200, "commit_ts": 25,
                  "columns": [{"name": "id", "spark_type": "bigint",
                               "nullable": False, "primary_key": True},
                              {"name": "val", "spark_type": "double"}]})
    st.apply_ddl({"type": "alter-table-partitioning", "schema": "test",
                  "table": "t1", "commit_ts": 30, "n_partitions": 2})
    p0 = st.get_table_info(100, 35).partitions[0]
    st.apply_ddl({"type": "exchange-partition", "schema": "test",
                  "table": "t1", "partition_index": 0,
                  "with_schema": "test", "with_table": "plain",
                  "commit_ts": 90})
    after = st.get_table_info(100, 95)
    assert after.partitions[0] == 200  # plain's old keyspace now partition 0
    # plain now lives on the partition's old physical id
    plain = [t for t in st.get_all_physical_tables(95)
             if t.table_name == "plain"]
    assert len(plain) == 1 and plain[0].table_id == p0
    # pre-exchange reads see the original ids
    assert st.get_table_info(200, 40).table_name == "plain"


def test_guards():
    st = _mk_store()
    with pytest.raises(DDLError):
        st.apply_ddl({"type": "drop-column", "schema": "test", "table": "t1",
                      "commit_ts": 30, "column_name": "id"})
    with pytest.raises(DDLError):
        st.apply_ddl({"type": "create-table", "schema": "test", "table": "t1",
                      "commit_ts": 30, "columns": []})
    with pytest.raises(DDLError):
        st.apply_ddl({"type": "alter-nonsense", "schema": "test",
                      "table": "t1", "commit_ts": 31})
    # commit_ts must not regress for one table's versions
    with pytest.raises(DDLError):
        st.apply_ddl({"type": "add-column", "schema": "test", "table": "t1",
                      "commit_ts": 5, "column": {"name": "x", "spark_type": "int"}})
    assert st.get_table_info(100, 99).has_pk_or_not_null_uk


def test_ddl_log_fetch_and_registry_rows():
    st = _mk_store()
    st.apply_ddl({"type": "add-column", "schema": "test", "table": "t1",
                  "table_id": 100, "commit_ts": 30,
                  "column": {"name": "k", "spark_type": "bigint"}})
    evs = st.fetch_table_ddl_events(100, 20, 30)  # (start, end]
    assert [e["commit_ts"] for e in evs] == [30]
    rows = st.registry_rows()
    assert (100, 20, "test", "t1", "id bigint, val double") in rows
    assert (100, 30, "test", "t1", "id bigint, val double, k bigint") in rows


def test_drop_schema_drops_tables():
    st = _mk_store()
    st.apply_ddl({"type": "drop-schema", "schema": "test", "commit_ts": 95})
    assert st.get_all_physical_tables(99) == []
    assert st.get_table_info(100, 90).table_name == "t1"


def test_registry_df_asof_join(spark):
    """The exported registry drives the broadcast as-of join on a real
    changelog frame (J1 general form)."""
    from pyspark.sql import functions as F

    st = _mk_store()
    st.apply_ddl({"type": "add-column", "schema": "test", "table": "t1",
                  "commit_ts": 30, "column": {"name": "k", "spark_type": "bigint"}})
    reg = spark.createDataFrame(
        st.registry_rows(),
        "table_id long, version_ts long, schema_name string, "
        "table_name string, columns_ddl string",
    )
    facts = spark.createDataFrame(
        [(100, 25, 1), (100, 35, 2)], "table_id long, commit_ts long, seq long"
    )
    j = (
        facts.join(F.broadcast(reg.select("table_id", "version_ts", "columns_ddl")),
                   "table_id")
        .filter(F.col("version_ts") <= F.col("commit_ts"))
        .groupBy("table_id", "commit_ts", "seq")
        .agg(F.max_by("columns_ddl", "version_ts").alias("columns_ddl"))
    )
    got = {r["seq"]: r["columns_ddl"] for r in j.collect()}
    assert got[1] == "id bigint, val double"
    assert got[2] == "id bigint, val double, k bigint"


def test_barrier_applies_ddl_live(spark, sf_dir):
    """W3 + S5 integration: a mid-stream ADD COLUMN applies to the live
    SchemaStore exactly once at the barrier; segments before the DDL
    encode the old shape, segments after encode the new column — the
    reference's split-at-ddl_ts semantics (`maintainer/barrier.go:31-41`,
    `basic_dispatcher.go:1000`)."""
    from ticdc_spark.codec import encode_canal_json
    from ticdc_spark.operators.column_selector import select_columns_physical
    from ticdc_spark.sources.typed import orders_changelog
    from ticdc_spark.streaming.barrier import split_batch_at_ddl

    cl = orders_changelog(spark, sf_dir)
    ts_sorted = [r[0] for r in cl.select("commit_ts").orderBy("commit_ts").collect()]
    ddl_ts = ts_sorted[len(ts_sorted) // 2]

    store = SchemaStore()
    store.apply_ddl({
        "type": "create-table", "schema": "tpch", "table": "orders",
        "table_id": 100, "commit_ts": 0,
        "columns": [
            {"name": "okey", "spark_type": "bigint", "nullable": False,
             "primary_key": True},
            {"name": "cust", "spark_type": "bigint"},
            {"name": "price", "spark_type": "double"},
        ],
    })
    pending_ddl = {
        "type": "add-column", "schema": "tpch", "table": "orders",
        "commit_ts": ddl_ts,
        "column": {"name": "odate", "spark_type": "string"},
    }

    seg_samples: list[tuple[int, str, int]] = []

    def flush(df, seg):
        info = store.get_table_info(100, ddl_ts + seg)  # current version
        enc = encode_canal_json(
            select_columns_physical(df, info.column_names(), pk_fields=("okey",)),
            pk_names=("okey",),
        )
        row = enc.select("value").first()
        seg_samples.append((seg, row["value"] if row else "", df.count()))

    applied: list[int] = []
    split_batch_at_ddl(cl, [ddl_ts], flush, lambda ts: (
        store.apply_ddl(pending_ddl), applied.append(ts)))

    assert applied == [ddl_ts]
    assert len(seg_samples) == 2
    assert '"odate":' not in seg_samples[0][1]
    assert '"odate":' in seg_samples[1][1]
    assert seg_samples[0][2] + seg_samples[1][2] == len(ts_sorted)


# -- full 38-action surface (persist_storage_ddl_handlers.go:120-462) -------

def test_version_bump_actions_keep_shape():
    st = _mk_store()
    for i, typ in enumerate(["add-foreign-key", "drop-foreign-key",
                             "rebase-auto-id", "shard-row-id",
                             "add-index", "rename-index",
                             "alter-index-visibility", "drop-index"]):
        st.apply_ddl({"type": typ, "schema": "test", "table": "t1",
                      "commit_ts": 30 + i})
    info = st.get_table_info(100, 100)
    assert info.column_names() == ["id", "val"]
    assert info.version_ts == 37  # every action bumped the version
    assert len(st._versions[100]) == 9


def test_default_value_comment_charset_ttl():
    st = _mk_store()
    st.apply_ddl({"type": "set-default-value", "schema": "test",
                  "table": "t1", "commit_ts": 30,
                  "column_name": "val", "default": "1.5"})
    st.apply_ddl({"type": "modify-table-comment", "schema": "test",
                  "table": "t1", "commit_ts": 31, "comment": "orders"})
    st.apply_ddl({"type": "modify-table-charset-and-collate",
                  "schema": "test", "table": "t1", "commit_ts": 32,
                  "charset": "gbk"})
    st.apply_ddl({"type": "alter-ttl-info", "schema": "test", "table": "t1",
                  "commit_ts": 33, "ttl": "created_at + INTERVAL 90 DAY"})
    info = st.get_table_info(100, 40)
    assert info.columns[1].default == "1.5"
    assert info.comment == "orders" and info.charset == "gbk"
    assert info.ttl == "created_at + INTERVAL 90 DAY"
    st.apply_ddl({"type": "alter-ttl-remove", "schema": "test",
                  "table": "t1", "commit_ts": 34})
    assert st.get_table_info(100, 40).ttl is None
    # as-of before: untouched
    assert st.get_table_info(100, 25).charset == "utf8mb4"


def test_primary_key_add_drop():
    st = _mk_store()
    st.apply_ddl({"type": "drop-primary-key", "schema": "test",
                  "table": "t1", "commit_ts": 30})
    assert not st.get_table_info(100, 35).has_pk_or_not_null_uk
    st.apply_ddl({"type": "add-primary-key", "schema": "test", "table": "t1",
                  "commit_ts": 40, "column_names": ["id"]})
    assert st.get_table_info(100, 45).has_pk_or_not_null_uk


def test_partition_lifecycle():
    st = _mk_store()
    st.apply_ddl({"type": "alter-table-partitioning", "schema": "test",
                  "table": "t1", "commit_ts": 30, "n_partitions": 2})
    p = st.get_table_info(100, 35).partitions
    assert len(p) == 2 and st.get_table_info(100, 35).physical_ids() == p
    st.apply_ddl({"type": "add-table-partition", "schema": "test",
                  "table": "t1", "commit_ts": 40})
    assert len(st.get_table_info(100, 45).partitions) == 3
    st.apply_ddl({"type": "truncate-table-partition", "schema": "test",
                  "table": "t1", "commit_ts": 50, "partition_index": 1})
    p2 = st.get_table_info(100, 55).partitions
    assert p2[0] == p[0] and p2[1] != p[1] and len(p2) == 3
    st.apply_ddl({"type": "drop-table-partition", "schema": "test",
                  "table": "t1", "commit_ts": 60, "partition_index": 0})
    assert len(st.get_table_info(100, 65).partitions) == 2
    st.apply_ddl({"type": "reorganize-partition", "schema": "test",
                  "table": "t1", "commit_ts": 70, "n_partitions": 2})
    p3 = st.get_table_info(100, 75).partitions
    assert set(p3).isdisjoint(set(p2))
    st.apply_ddl({"type": "remove-partitioning", "schema": "test",
                  "table": "t1", "commit_ts": 80})
    assert st.get_table_info(100, 85).physical_ids() == (100,)
    # truncate of a partitioned table reallocates partition ids too
    st.apply_ddl({"type": "alter-table-partitioning", "schema": "test",
                  "table": "t1", "commit_ts": 90, "n_partitions": 2})
    st.apply_ddl({"type": "truncate-table", "schema": "test", "table": "t1",
                  "commit_ts": 95})
    t = st.get_all_physical_tables(99)[0]
    assert t.table_id != 100 and len(t.partitions) == 2


def test_views_and_recover_and_batch():
    st = _mk_store()
    st.apply_ddl({"type": "create-view", "schema": "test", "view": "v1",
                  "commit_ts": 30})
    assert st.views() == [("test", "v1", 30)]
    st.apply_ddl({"type": "drop-view", "schema": "test", "view": "v1",
                  "commit_ts": 31})
    assert st.views() == []
    st.apply_ddl({"type": "drop-table", "schema": "test", "table": "t1",
                  "commit_ts": 40})
    st.apply_ddl({"type": "recover-table", "table_id": 100, "commit_ts": 50})
    assert st.get_table_info(100, 55).table_name == "t1"
    with pytest.raises(DDLError):
        st.get_table_info(100, 45)  # dropped window stays dropped
    st.apply_ddl({"type": "create-tables", "commit_ts": 60, "tables": [
        {"schema": "test", "table": "b1", "table_id": 301,
         "columns": [{"name": "a", "spark_type": "bigint",
                      "nullable": False, "primary_key": True}]},
        {"schema": "test", "table": "b2", "table_id": 302,
         "columns": [{"name": "b", "spark_type": "bigint",
                      "nullable": False, "primary_key": True}]},
    ]})
    assert len(st.get_all_physical_tables(65)) == 3
    # atomic multi-rename: cyclic swap works
    st.apply_ddl({"type": "rename-tables", "commit_ts": 70, "renames": [
        {"schema": "test", "table": "b1", "to_table": "b2"},
        {"schema": "test", "table": "b2", "to_table": "b1"},
    ]})
    assert st.get_table_info(301, 75).table_name == "b2"
    assert st.get_table_info(302, 75).table_name == "b1"
    st.apply_ddl({"type": "modify-schema-charset-and-collate",
                  "schema": "test", "charset": "gbk", "commit_ts": 80})
    assert st._schema_charsets["test"] == "gbk"
