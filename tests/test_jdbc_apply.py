"""End-to-end K1 writer path: changelog → update-split → SQL gen →
slot-ordered apply to a real database (DuckDB) → final state must equal
materialize_state (the sync-diff oracle)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from ticdc_spark.operators import split_updates
from ticdc_spark.sinks.jdbc import apply_ordered, mysql_to_duckdb_dialect
from ticdc_spark.sinks.mysql import materialize_state
from ticdc_spark.sources.changelog import events_changelog

TABLES = ["tp_click", "tp_error", "tp_purchase", "tp_signup", "tp_view"]


def test_safe_mode_apply_matches_materialize(spark, sf_dir):
    cl = split_updates(events_changelog(spark, sf_dir))

    con = duckdb.connect()
    con.execute("CREATE SCHEMA test")
    for t in TABLES:
        con.execute(
            f"CREATE TABLE test.{t} (id BIGINT PRIMARY KEY, val DOUBLE, k BIGINT)"
        )

    n = apply_ordered(cl, lambda s: con.execute(mysql_to_duckdb_dialect(s)),
                      safe_mode=True)
    assert n == cl.count()

    expected = {
        (r["table_name"], r["id"]): (round(r["val"], 6), r["k"])
        for r in materialize_state(cl).collect()
    }
    got = {}
    for t in TABLES:
        for (i, v, k) in con.execute(f"SELECT id, val, k FROM test.{t}").fetchall():
            got[(t, i)] = (round(v, 6), k)
    assert got == expected


def test_compile_changefeed_db_stmts_apply(spark, sf_dir):
    """The sink-URI-dispatched DB tail end to end: compile_changefeed
    (mysql scheme, safe-mode, table atomicity) emits the stmt frame;
    applying it slot-free in (commit_ts, dml_order, seq) order rebuilds
    the same state as materialize_state."""
    from ticdc_spark.pipeline import ChangefeedConfig, compile_changefeed
    from ticdc_spark.sources.changelog import events_changelog

    cl = events_changelog(spark, sf_dir)
    out = compile_changefeed(cl, ChangefeedConfig(
        sink_uri="mysql://root@h:4000/", safe_mode=True,
        transaction_atomicity="table"))

    con = duckdb.connect()
    con.execute("CREATE SCHEMA test")
    for t in TABLES:
        con.execute(
            f"CREATE TABLE test.{t} (id BIGINT PRIMARY KEY, val DOUBLE, k BIGINT)"
        )
    rows = (out.select("commit_ts", "dml_order", "seq", "stmt", "flush_batch")
            .orderBy("commit_ts", "dml_order", "seq").toLocalIterator())
    n = 0
    for r in rows:
        con.execute(mysql_to_duckdb_dialect(r["stmt"]))
        n += 1
    assert n > 0

    expected = {
        (r["table_name"], r["id"]): (round(r["val"], 6), r["k"])
        for r in materialize_state(
            split_updates(events_changelog(spark, sf_dir))).collect()
    }
    got = {}
    for t in TABLES:
        for (i, v, k) in con.execute(f"SELECT id, val, k FROM test.{t}").fetchall():
            got[(t, i)] = (round(v, 6), k)
    assert got == expected


def test_compile_changefeed_multirow_apply(spark, sf_dir):
    """The compacted multirow DB tail against a live DB: seed the
    pre-state (net-U/net-D rows existed downstream before the window),
    apply the batched INSERT/DELETE-IN/UPDATE-CASE-WHEN statements —
    compaction makes key sets disjoint across kinds so cross-kind order
    is free — and diff against materialize_state."""
    from ticdc_spark.operators import compact_changelog
    from ticdc_spark.pipeline import ChangefeedConfig, compile_changefeed
    from ticdc_spark.sources.changelog import events_changelog

    # Restrict to the PK-consistent subset: the synthetic fixture's
    # key-shifting updates (id -> id+1000) can land on an id that other
    # rows legitimately own — a real upstream enforces PK uniqueness, so
    # a live PRIMARY KEY table can't replay that collision. (Safe-mode
    # REPLACE masks it; the batch path surfaces it.)
    cl = events_changelog(spark, sf_dir).filter(
        ~((F.col("op") == "U") & (F.col("before.id") != F.col("after.id"))))
    out = compile_changefeed(cl, ChangefeedConfig(sink_uri="tidb://h/"))

    con = duckdb.connect()
    con.execute("CREATE SCHEMA test")
    for t in TABLES:
        con.execute(
            f"CREATE TABLE test.{t} (id BIGINT PRIMARY KEY, val DOUBLE, k BIGINT)"
        )
    pre = compact_changelog(split_updates(cl)).filter(
        F.col("net_op").isin("U", "D"))
    for r in pre.select("table_name", "before.id", "before.val",
                        "before.k").collect():
        con.execute(
            f"INSERT INTO test.{r['table_name']} VALUES (?, ?, ?)",
            [r["id"], r["val"], r["k"]])

    n = 0
    for r in out.select("stmt").toLocalIterator():
        con.execute(mysql_to_duckdb_dialect(r["stmt"]))
        n += 1
    assert n > 0

    expected = {
        (r["table_name"], r["id"]): (round(r["val"], 6), r["k"])
        for r in materialize_state(split_updates(cl)).collect()
    }
    got = {}
    for t in TABLES:
        for (i, v, k) in con.execute(f"SELECT id, val, k FROM test.{t}").fetchall():
            got[(t, i)] = (round(v, 6), k)
    assert got == expected
