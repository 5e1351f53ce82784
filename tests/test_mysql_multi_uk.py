"""Safe-mode REPLACE against a table with a PK plus a separate UNIQUE
key, over the live wire.

MySQL's REPLACE deletes EVERY row conflicting on ANY unique index of
the new row (not just the PK match) before inserting — so one REPLACE
can remove two rows.  The single-PK tp_* fixtures never exercise this;
this fixture plants a cross-UK conflict and pins the multi-index
delete through the full K1 writer path (sql gen → wire apply →
readback).  sqlite's native REPLACE implements the same all-conflicts
delete (verified here), so the mini-server needs no emulation shim.
"""

from __future__ import annotations

from ticdc_spark.sinks.mysql_client import MySQLConn
from ticdc_spark.sinks.mysql_live import apply_over_wire, start_server

_CL_SCHEMA = (
    "schema_name string, table_name string, op string, commit_ts long, "
    "dml_order int, seq long, "
    "before struct<id:bigint,val:double,k:bigint>, "
    "after struct<id:bigint,val:double,k:bigint>"
)


def _read_all(host, port, user, pw):
    with MySQLConn(host, port, user, pw) as c:
        rs = c.query("SELECT id, val, k FROM `test`.`muk` ORDER BY id")
        return [tuple(r) for r in rs.rows]


def test_live_replace_deletes_all_conflicting_rows(spark):
    srv = start_server()
    with MySQLConn(srv.host, srv.port, "root", "cdc-secret") as c:
        c.query("CREATE TABLE `test`.`muk` (`id` BIGINT PRIMARY KEY, "
                "`val` DOUBLE, `k` BIGINT UNIQUE)")

    rows = [
        # three inserts, then an update of row 1 that moves its UNIQUE k
        # onto row 2's value: the safe-mode REPLACE conflicts with row 1
        # on the PK AND row 2 on the UK -> both must be deleted
        ("test", "muk", "I", 1, 0, 0, None, (1, 1.0, 10)),
        ("test", "muk", "I", 1, 0, 1, None, (2, 2.0, 20)),
        ("test", "muk", "I", 1, 0, 2, None, (3, 3.0, 30)),
        ("test", "muk", "U", 2, 0, 3, (1, 1.0, 10), (1, 9.5, 20)),
    ]
    cl = spark.createDataFrame(rows, _CL_SCHEMA)
    # n_slots=1: the cross-UK conflict spans two PKs, which hash to
    # different slots — per-key slotting can't serialize a cross-key
    # unique conflict, so this fixture forces one slot (the reference's
    # conflict detector hashes every unique key for the same reason)
    apply_over_wire(cl, srv.host, srv.port, "root", "cdc-secret", n_slots=1)

    got = _read_all(srv.host, srv.port, "root", "cdc-secret")
    assert got == [(1, 9.5, 20), (3, 3.0, 30)]  # row 2 gone

    srv.stop()


def test_live_replace_multirow_batch_cross_uk(spark):
    """Same conflict inside ONE multirow REPLACE batch: later tuples in
    the VALUES list win over earlier conflicting tuples (left-to-right
    row application), matching MySQL."""
    srv = start_server()
    with MySQLConn(srv.host, srv.port, "root", "cdc-secret") as c:
        c.query("CREATE TABLE `test`.`muk` (`id` BIGINT PRIMARY KEY, "
                "`val` DOUBLE, `k` BIGINT UNIQUE)")
        c.query("REPLACE INTO `test`.`muk` (`id`, `val`, `k`) VALUES "
                "(1, 1.0, 10), (2, 2.0, 20), (3, 3.0, 10)")
        # (3,_,10) conflicts with (1,_,10) on the UK: row 1 is deleted
    got = _read_all(srv.host, srv.port, "root", "cdc-secret")
    assert got == [(2, 2.0, 20), (3, 3.0, 10)]
    srv.stop()
