"""End-to-end K1 writer path: changelog → update-split → SQL gen →
slot-ordered apply to a real database (DuckDB) → final state must equal
materialize_state (the sync-diff oracle)."""

from __future__ import annotations

import duckdb
import pytest
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


# -- retry/backoff (pkg/sink/mysql/config.go:77-79) -------------------------

def test_retry_backoff_schedule_and_recovery():
    from ticdc_spark.sinks.jdbc import RetryPolicy, with_retry

    calls, sleeps = [], []
    fails = {"n": 3}

    def flaky(stmt):
        calls.append(stmt)
        if fails["n"] > 0:
            fails["n"] -= 1
            raise RuntimeError("connection reset")

    run = with_retry(flaky, RetryPolicy(max_tries=8, base_delay=0.1,
                                        max_delay=5.0),
                     sleep=sleeps.append)
    run("INSERT 1")
    assert len(calls) == 4  # 3 failures + success
    assert sleeps == [0.1, 0.2, 0.4]  # exponential from BackoffBaseDelay


def test_retry_caps_at_max_delay_and_exhausts():
    from ticdc_spark.sinks.jdbc import RetryPolicy, with_retry

    sleeps = []

    def always_fails(stmt):
        raise RuntimeError("deadlock")

    run = with_retry(always_fails,
                     RetryPolicy(max_tries=8, base_delay=0.1, max_delay=5.0),
                     sleep=sleeps.append)
    with pytest.raises(RuntimeError):
        run("UPDATE x")
    # 7 sleeps between 8 tries; tail capped at BackoffMaxDelay=5s
    assert sleeps == [0.1, 0.2, 0.4, 0.8, 1.6, 3.2, 5.0]


def test_non_retryable_propagates_immediately():
    from ticdc_spark.sinks.jdbc import RetryPolicy, with_retry

    calls = []

    def syntax_error(stmt):
        calls.append(stmt)
        raise ValueError("syntax error")

    run = with_retry(syntax_error, RetryPolicy(),
                     retryable=lambda e: not isinstance(e, ValueError),
                     sleep=lambda s: None)
    with pytest.raises(ValueError):
        run("BOGUS")
    assert len(calls) == 1


def test_txn_retry_rolls_back_whole_batch():
    """Transient failure mid-txn: ROLLBACK, then the WHOLE txn retries —
    the downstream never observes a prefix (atomicity contract)."""
    from ticdc_spark.sinks.jdbc import RetryPolicy, apply_txn_with_retry

    log = []
    fail_once = {"armed": True}

    def execute(stmt):
        log.append(stmt)
        if stmt == "S2" and fail_once["armed"]:
            fail_once["armed"] = False
            raise RuntimeError("lock wait timeout")

    n = apply_txn_with_retry(["S1", "S2", "S3"], execute,
                             RetryPolicy(max_tries=3, base_delay=0.01),
                             sleep=lambda s: None)
    assert n == 3
    assert log == ["BEGIN", "S1", "S2", "ROLLBACK",
                   "BEGIN", "S1", "S2", "S3", "COMMIT"]


def test_apply_ordered_with_retry_against_duckdb(spark, sf_dir):
    """The flaky-connection path against the live DuckDB shim: every
    statement lands exactly once despite injected transient failures."""
    import duckdb

    from ticdc_spark.sinks.jdbc import (
        RetryPolicy,
        apply_ordered,
        mysql_to_duckdb_dialect,
    )
    from ticdc_spark.sources.changelog import events_changelog

    con = duckdb.connect()
    con.execute("CREATE SCHEMA test")
    con.execute("CREATE TABLE test.tp_view (id BIGINT PRIMARY KEY, "
                "val DOUBLE, k BIGINT)")
    cl = events_changelog(spark, sf_dir).filter(
        (F.col("op") == "I") & (F.col("table_name") == "tp_view")
    ).limit(40)
    flake = {"every": 7, "n": 0}

    def execute(stmt):
        flake["n"] += 1
        if flake["n"] % flake["every"] == 0 and flake.pop("armed", True):
            flake["armed"] = False  # re-arm per statement via with_retry
            raise RuntimeError("server has gone away")
        flake["armed"] = True
        con.execute(mysql_to_duckdb_dialect(stmt))

    n = apply_ordered(cl, execute, safe_mode=True,
                      retry=RetryPolicy(max_tries=4, base_delay=0.001),
                      sleep=lambda s: None)
    assert n == 40
    # safe-mode REPLACE upserts: downstream rows = distinct handles
    assert con.execute(
        "SELECT count(*) FROM test.tp_view"
    ).fetchone()[0] == cl.select("pk").distinct().count()
