"""sync-diff + repair across two LIVE MySQL wire endpoints.

The reference's operational loop: replicate upstream -> downstream, then
sync-diff-inspector verifies and emits fix SQL for any drift
(`pkg/diff` chunk checksums -> row classification -> generateDML).
Here both databases live behind real MySQL-protocol sockets: the
changelog applies to both over the wire, the downstream is then
corrupted over the wire (deletes, value drift, extra rows), the diff
finds every bad chunk, and applying the generated fix SQL over the same
socket makes the re-diff fully clean.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ticdc_spark.operators import split_updates
from ticdc_spark.plans.table_diff import diff_chunks, diff_rows, fix_sql
from ticdc_spark.sinks.mysql_client import MySQLConn
from ticdc_spark.sinks.mysql_live import (
    apply_over_wire,
    create_tables,
    read_state_df,
)
from ticdc_spark.sinks.mysql_server import MiniMySQLServer
from ticdc_spark.sources.changelog import events_changelog

TABLES = ["tp_click", "tp_error", "tp_purchase", "tp_signup", "tp_view"]
USER, PW = "root", "pw"


def _conn(srv):
    return MySQLConn(srv.host, srv.port, USER, PW)


def test_live_sync_diff_finds_and_repairs_drift(spark, sf_dir):
    cl = split_updates(events_changelog(spark, sf_dir))
    with MiniMySQLServer(user=USER, password=PW) as up, \
            MiniMySQLServer(user=USER, password=PW) as down:
        for srv in (up, down):
            create_tables(srv.host, srv.port, USER, PW, TABLES)
            apply_over_wire(cl, srv.host, srv.port, USER, PW)

        # clean replication: every chunk equal before corruption
        up_df = read_state_df(spark, up.host, up.port, USER, PW, TABLES)
        down_df = read_state_df(spark, down.host, down.port, USER, PW, TABLES)
        t = "tp_signup"
        pre = diff_chunks(
            up_df.filter(F.col("table_name") == t).drop("table_name"),
            down_df.filter(F.col("table_name") == t).drop("table_name"),
            "id", ["id", "val", "k"], 128)
        assert pre.filter(~F.col("equal")).count() == 0

        # corrupt the downstream OVER THE WIRE: missing, drifted, extra
        with _conn(down) as c:
            c.execute_batch([
                f"DELETE FROM `test`.`{t}` WHERE `id` % 97 = 0",
                f"UPDATE `test`.`{t}` SET `val` = `val` + 1.0 WHERE `id` % 89 = 3",
                f"REPLACE INTO `test`.`{t}` (`id`, `val`, `k`) VALUES (90000001, 1.25, 7)",
                f"REPLACE INTO `test`.`{t}` (`id`, `val`, `k`) VALUES (90000002, 2.50, 8)",
            ])

        down_df = read_state_df(spark, down.host, down.port, USER, PW, TABLES)
        src = up_df.filter(F.col("table_name") == t).drop("table_name")
        tgt = down_df.filter(F.col("table_name") == t).drop("table_name")

        kinds = {r["kind"] for r in
                 diff_rows(src, tgt, "id", ["id", "val", "k"], 128)
                 .select("kind").distinct().collect()}
        assert kinds == {"missing", "different", "extra"}

        fixes = [r["stmt"] for r in
                 fix_sql(src, tgt, "id", ["id", "val", "k"], 128, "test", t)
                 .collect()]
        assert any(s.startswith("REPLACE INTO") for s in fixes)
        assert any(s.startswith("DELETE FROM") for s in fixes)

        # apply the fix SQL over the same socket, then re-diff clean
        with _conn(down) as c:
            c.execute_batch([s.rstrip(";") for s in fixes])

        tgt2 = (read_state_df(spark, down.host, down.port, USER, PW, TABLES)
                .filter(F.col("table_name") == t).drop("table_name"))
        post = diff_chunks(src, tgt2, "id", ["id", "val", "k"], 128)
        assert post.filter(~F.col("equal")).count() == 0
        # value-exact too, not just checksum-exact
        a = {tuple(r) for r in src.collect()}
        b = {tuple(r) for r in tgt2.collect()}
        assert a == b and len(a) >= 10
