"""Generated-column handling in the MySQL sink (K1).

Reference: the SQL builders skip generated columns in INSERT/REPLACE
column lists (`pkg/sink/sqlmodel/multi_row.go:124-127`) and UPDATE SET
(`pkg/sink/sqlmodel/row_change.go:299-304`), keyed on the TARGET table's
generated set (`row_change_test.go:271-289` — a target column that is
NOT generated still gets the value); batching by handle key is disabled
when the key contains a VIRTUAL generated column
(`pkg/sink/mysql/mysql_writer_dml.go:128-152`); conflict keys over a
STORED generated column still serialize (e2e
`tests/integration_tests/conflict_key_generated_column`).

The live endpoint enforces the write prohibition: any DML naming a
generated column answers MySQL error 3105, so the wire tests here are
load-bearing — remove the skip and they fail.
"""

from __future__ import annotations

import pytest

from ticdc_spark.codec.mysql_wire import MySQLError
from ticdc_spark.sinks.mysql import (batchable_by_handle_key,
                                     multirow_batches, sql_for_rows)
from ticdc_spark.sinks.mysql_client import MySQLConn
from ticdc_spark.sinks.mysql_live import apply_over_wire, start_server

_IMG = "struct<id:bigint,val:double,k:bigint,val2:double>"
_CL_SCHEMA = (
    "schema_name string, table_name string, op string, commit_ts long, "
    f"dml_order int, seq long, before {_IMG}, after {_IMG}"
)

_GEN = frozenset({"val2"})


def _cl(spark, rows):
    return spark.createDataFrame(rows, _CL_SCHEMA)


def test_sql_gen_skips_generated_columns(spark):
    cl = _cl(spark, [
        ("test", "t", "I", 1, 2, 0, None, (1, 1.5, 7, 3.0)),
        ("test", "t", "U", 2, 2, 1, (1, 1.5, 7, 3.0), (1, 2.5, 7, 5.0)),
        ("test", "t", "D", 3, 1, 2, (1, 2.5, 7, 5.0), None),
    ])
    stmts = {r["op"]: r["stmt"]
             for r in sql_for_rows(cl, generated_columns=_GEN).collect()}
    # INSERT: val2 absent from the column list and VALUES (3 values)
    assert stmts["I"] == ("INSERT INTO `test`.`t` (`id`, `val`, `k`) "
                          "VALUES (1, 1.50, 7)")
    # UPDATE: val2 absent from SET; WHERE unchanged
    assert "val2" not in stmts["U"].split("WHERE")[0]
    assert stmts["U"].startswith(
        "UPDATE `test`.`t` SET `id` = 1, `val` = 2.50, `k` = 7 WHERE ")
    # DELETE untouched by the generated set
    assert stmts["D"] == "DELETE FROM `test`.`t` WHERE `id` = 1"


def test_sql_gen_target_not_generated_keeps_column(spark):
    """row_change_test.go:281-289 — source generated but TARGET not:
    the value IS written."""
    cl = _cl(spark, [("test", "t", "I", 1, 2, 0, None, (1, 1.5, 7, 3.0))])
    (row,) = sql_for_rows(cl, generated_columns=frozenset()).collect()
    assert row["stmt"] == ("INSERT INTO `test`.`t` (`id`, `val`, `k`, "
                           "`val2`) VALUES (1, 1.50, 7, 3.00)")


def test_multirow_batches_skip_generated(spark):
    compacted = spark.createDataFrame(
        [("test", "t", 1, "I", None, (1, 1.5, 7, 3.0)),
         ("test", "t", 2, "U", (2, 1.0, 7, 2.0), (2, 9.0, 7, 18.0))],
        "schema_name string, table_name string, pk long, net_op string, "
        f"before {_IMG}, after {_IMG}")
    stmts = {r["stmt_kind"]: r["stmt"] for r in multirow_batches(
        compacted, generated_columns=_GEN).collect()}
    assert stmts["insert"] == ("INSERT INTO `test`.`t` (`id`, `val`, `k`) "
                               "VALUES (1, 1.50, 7)")
    set_part = stmts["update"].split(" WHERE ")[0]
    assert "`val2` = CASE" not in set_part
    assert "`val` = CASE" in set_part


def test_batching_disabled_for_virtual_generated_handle_key(spark):
    assert batchable_by_handle_key(("id",), frozenset({"vg"}))
    assert not batchable_by_handle_key(("vg", "id"), frozenset({"vg"}))
    compacted = spark.createDataFrame(
        [], "schema_name string, table_name string, pk long, "
            f"net_op string, before {_IMG}, after {_IMG}")
    with pytest.raises(ValueError, match="virtual generated"):
        multirow_batches(compacted, pk_fields=("val2",),
                         virtual_generated_columns=_GEN)


def test_live_write_naming_generated_column_is_3105():
    srv = start_server()
    with MySQLConn(srv.host, srv.port, "root", "cdc-secret") as c:
        c.query("CREATE TABLE `test`.`g` (`id` BIGINT PRIMARY KEY, "
                "`val` DOUBLE, `val2` DOUBLE AS (`val` * 2) STORED)")
        c.query("REPLACE INTO `test`.`g` (`id`, `val`) VALUES (1, 2.0)")
        with pytest.raises(MySQLError) as ei:
            c.query("REPLACE INTO `test`.`g` (`id`, `val`, `val2`) "
                    "VALUES (2, 1.0, 9.0)")
        assert ei.value.code == 3105
        rs = c.query("SELECT `id`, `val`, `val2` FROM `test`.`g`")
        assert [tuple(r) for r in rs.rows] == [(1, 2.0, 4.0)]
    srv.stop()


def test_live_apply_without_skip_fails_with_skip_succeeds(spark):
    """The end-to-end proof the skip is load-bearing: the same widened
    changelog fails over the wire without generated_columns and lands
    with it, with val2 computed DOWNSTREAM."""
    rows = [
        ("test", "gt", "I", 1, 2, 0, None, (1, 1.5, 7, 3.0)),
        ("test", "gt", "U", 2, 2, 1, (1, 1.5, 7, 3.0), (1, 2.5, 8, 5.0)),
        ("test", "gt", "I", 1, 2, 2, None, (2, 4.0, 9, 8.0)),
        ("test", "gt", "D", 3, 1, 3, (2, 4.0, 9, 8.0), None),
    ]
    ddl = ("CREATE TABLE `test`.`gt` (`id` BIGINT PRIMARY KEY, "
           "`val` DOUBLE, `k` BIGINT, "
           "`val2` DOUBLE AS (`val` * 2) STORED)")

    srv = start_server()
    with MySQLConn(srv.host, srv.port, "root", "cdc-secret") as c:
        c.query(ddl)
    with pytest.raises(Exception) as ei:
        apply_over_wire(_cl(spark, rows), srv.host, srv.port, "root",
                        "cdc-secret", n_slots=1)
    assert "3105" in str(ei.value)
    srv.stop()

    srv = start_server()
    with MySQLConn(srv.host, srv.port, "root", "cdc-secret") as c:
        c.query(ddl)
    apply_over_wire(_cl(spark, rows), srv.host, srv.port, "root",
                    "cdc-secret", n_slots=1, generated_columns=_GEN)
    with MySQLConn(srv.host, srv.port, "root", "cdc-secret") as c:
        rs = c.query("SELECT `id`, `val`, `k`, `val2` FROM `test`.`gt` "
                     "ORDER BY `id`")
        assert [tuple(r) for r in rs.rows] == [(1, 2.5, 8, 5.0)]
    srv.stop()


def test_live_conflict_key_over_stored_generated_column(spark):
    """e2e `conflict_key_generated_column`: the UNIQUE key is a stored
    generated column; DML never writes it, but DELETE keys on it (value
    from the mounted before image)."""
    rows = [
        ("test", "ck", "I", 1, 2, 0, None, (1, 1.0, 10, 2.0)),
        ("test", "ck", "I", 1, 2, 1, None, (2, 2.0, 20, 4.0)),
        # delete row 1 — WHERE `val2` = 2.00 (the generated UK)
        ("test", "ck", "D", 2, 1, 2, (1, 1.0, 10, 2.0), None),
        # re-insert under the same generated key value
        ("test", "ck", "I", 3, 2, 3, None, (1, 1.0, 99, 2.0)),
    ]
    srv = start_server()
    with MySQLConn(srv.host, srv.port, "root", "cdc-secret") as c:
        c.query("CREATE TABLE `test`.`ck` (`id` BIGINT PRIMARY KEY, "
                "`val` DOUBLE, `k` BIGINT, "
                "`val2` DOUBLE AS (`val` * 2) STORED UNIQUE)")
    apply_over_wire(_cl(spark, rows), srv.host, srv.port, "root",
                    "cdc-secret", n_slots=1, generated_columns=_GEN,
                    pk_fields=("val2",))
    with MySQLConn(srv.host, srv.port, "root", "cdc-secret") as c:
        rs = c.query("SELECT `id`, `val`, `k`, `val2` FROM `test`.`ck` "
                     "ORDER BY `id`")
        assert [tuple(r) for r in rs.rows] == [(1, 1.0, 99, 2.0),
                                               (2, 2.0, 20, 4.0)]
    srv.stop()
