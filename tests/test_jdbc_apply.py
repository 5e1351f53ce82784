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
