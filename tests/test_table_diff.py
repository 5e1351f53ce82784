"""sync-diff (`pkg/diff/` TableDiff): chunk fast path, row descent, and
the end-to-end proof — applying the generated fix SQL to a live DuckDB
target makes it byte-equal to the source."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from ticdc_spark.diff_queries import _CHUNK, _COLS, _pair
from ticdc_spark.plans.table_diff import diff_chunks, diff_rows, fix_sql
from ticdc_spark.sinks.jdbc import mysql_to_duckdb_dialect


def test_equal_tables_produce_no_diff(spark, sf_dir):
    src, _ = _pair(spark, sf_dir)
    chunks = diff_chunks(src, src, "k", _COLS, _CHUNK)
    assert chunks.filter(~F.col("equal")).count() == 0
    assert diff_rows(src, src, "k", _COLS, _CHUNK).count() == 0


def test_row_kinds_match_mutations(spark, sf_dir):
    src, tgt = _pair(spark, sf_dir)
    rows = {r["k"]: r["kind"]
            for r in diff_rows(src, tgt, "k", _COLS, _CHUNK).collect()}
    for k, kind in rows.items():
        if kind == "extra":
            assert (k - 10_000_000) % 103 == 0
        elif kind == "missing":
            assert k % 101 == 0
        else:
            # drifted rows are %97, EXCEPT those also deleted (%101
            # wins: a deleted row is missing, not different)
            assert kind == "different" and k % 97 == 0 and k % 101 != 0
    assert set(rows.values()) == {"missing", "extra", "different"}


def test_fix_sql_repairs_target_to_source(spark, sf_dir):
    src, tgt = _pair(spark, sf_dir)
    stmts = [r["stmt"]
             for r in fix_sql(src, tgt, "k", _COLS, _CHUNK,
                              "tpch", "orders").collect()]
    assert stmts

    con = duckdb.connect()
    con.execute("CREATE SCHEMA tpch")
    con.execute(
        "CREATE TABLE tpch.orders (k BIGINT PRIMARY KEY, cust BIGINT, "
        "status VARCHAR, price VARCHAR, odate BIGINT)")
    con.executemany(
        "INSERT INTO tpch.orders VALUES (?, ?, ?, ?, ?)",
        [tuple(r) for r in tgt.select(*_COLS).collect()])

    # DELETE uses an all-column WHERE (generateDML parity) — but the
    # DuckDB shim only needs the dialect translation
    for s in stmts:
        con.execute(mysql_to_duckdb_dialect(s))

    repaired = {tuple(r) for r in
                con.execute("SELECT k, cust, status, price, odate "
                            "FROM tpch.orders").fetchall()}
    source = {tuple(r) for r in src.select(*_COLS).collect()}
    assert repaired == source


def test_checkpoint_resume_skips_proven_chunks(spark, sf_dir, tmp_path):
    from ticdc_spark.plans.table_diff import (
        DiffCheckpoint, diff_chunks, diff_chunks_resumable,
    )

    src, tgt = _pair(spark, sf_dir)
    h = DiffCheckpoint.config_hash_of("k", _COLS, _CHUNK)
    path = str(tmp_path / "diff_ckpt.jsonl")

    ck = DiffCheckpoint(path, h)
    all_chunks = diff_chunks(src, tgt, "k", _COLS, _CHUNK).collect()
    first = diff_chunks_resumable(src, tgt, "k", _COLS, _CHUNK, ck)
    assert first.count() == len(all_chunks)
    n_success = ck.summary()["success"]
    assert ck.summary()["failed"] > 0 and n_success > 0
    assert ck.summary()["state"] == DiffCheckpoint.FAILED

    # resume with a fresh object from disk: proven chunks are skipped
    ck2 = DiffCheckpoint(path, h)
    assert ck2.done_chunks() == ck.done_chunks()
    verdicts = diff_chunks(src, tgt, "k", _COLS, _CHUNK)
    remaining = verdicts.filter(
        ~F.col("chunk_id").isin(sorted(ck2.done_chunks()))).count()
    assert remaining == len(all_chunks) - n_success

    # config change invalidates the checkpoint entirely
    h2 = DiffCheckpoint.config_hash_of("k", _COLS, _CHUNK * 2)
    ck3 = DiffCheckpoint(path, h2)
    assert ck3.done_chunks() == set()
