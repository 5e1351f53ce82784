"""Property tests: the compaction/materialize folds vs a naive sequential
interpreter over random changelogs (SURVEY §7.3's recommended strategy
for the 6-case fold)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
)

from ticdc_spark.operators.compaction import compact_changelog
from ticdc_spark.sinks.mysql import materialize_state

PAYLOAD = StructType([
    StructField("id", LongType()),
    StructField("val", DoubleType()),
    StructField("k", LongType()),
])
CHANGELOG_SCHEMA = StructType([
    StructField("schema_name", StringType()),
    StructField("table_name", StringType()),
    StructField("table_id", LongType()),
    StructField("op", StringType()),
    StructField("commit_ts", LongType()),
    StructField("start_ts", LongType()),
    StructField("seq", LongType()),
    StructField("dml_order", IntegerType()),
    StructField("pk", LongType()),
    StructField("before", PAYLOAD),
    StructField("after", PAYLOAD),
])


def random_changelog(rng: random.Random, n_keys: int, n_events: int):
    """Random but *consistent* changelog: per key, ops follow the legal
    lifecycle (I only when absent, U/D only when present)."""
    rows = []
    alive: dict[int, float] = {}
    ts = 1_000_000
    for i in range(n_events):
        pk = rng.randrange(n_keys)
        ts += rng.randrange(1, 50)
        exists = pk in alive
        op = rng.choice(["U", "D"]) if exists else "I"
        val = round(rng.uniform(0, 100), 2)
        before = (pk, alive[pk], pk * 10) if exists else None
        after = (pk, val, pk * 10) if op in ("I", "U") else None
        if op == "D":
            del alive[pk]
        else:
            alive[pk] = val
        rows.append((
            "test", "t", 1, op, ts, ts - 1, i,
            {"D": 1, "U": 2, "I": 3}[op], pk, before, after,
        ))
    return rows, alive


def naive_compact(rows):
    """Sequential reference interpreter of the 6-case fold
    (mysql_writer_dml_batch.go:166-190)."""
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r[8], []).append(r)
    out = {}
    for pk, evs in by_key.items():
        evs.sort(key=lambda r: r[4])
        first, last = evs[0], evs[-1]
        first_op, last_op = first[3], last[3]
        if first_op == "I" and last_op == "D":
            continue
        if first_op == "I":
            net = "I"
        elif last_op == "D":
            net = "D"
        else:
            net = "U"
        out[pk] = (
            net,
            first[9] if net in ("U", "D") else None,   # before image
            last[10] if net in ("I", "U") else None,   # after image
            len(evs),
            last[4],
        )
    return out


@pytest.mark.parametrize("seed", [7, 42, 1337])
def test_compaction_matches_naive_interpreter(spark, seed):
    rng = random.Random(seed)
    rows, _ = random_changelog(rng, n_keys=40, n_events=400)
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    got = {
        r["pk"]: (
            r["net_op"],
            tuple(r["before"]) if r["before"] else None,
            tuple(r["after"]) if r["after"] else None,
            r["n_events"],
            r["commit_ts"],
        )
        for r in compact_changelog(df).collect()
    }
    expected = naive_compact(rows)
    assert got == expected


@pytest.mark.parametrize("seed", [3, 99])
def test_materialize_matches_sequential_apply(spark, seed):
    """Final state from the fold == state from applying events one by one."""
    rng = random.Random(seed)
    rows, alive = random_changelog(rng, n_keys=30, n_events=500)
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    got = {r["id"]: r["val"] for r in materialize_state(df).collect()}
    assert got == alive


def test_compaction_idempotent_on_compacted(spark):
    """Compacting an already-compacted changelog is a fixpoint (each key
    has exactly one event, so first==last)."""
    rng = random.Random(11)
    rows, _ = random_changelog(rng, n_keys=20, n_events=200)
    df = spark.createDataFrame(rows, CHANGELOG_SCHEMA)
    once = compact_changelog(df)
    # Re-shape the compacted output back into changelog form.
    again_input = once.select(
        F.lit("test").alias("schema_name"),
        F.lit("t").alias("table_name"),
        F.lit(1).cast("long").alias("table_id"),
        F.col("net_op").alias("op"),
        "commit_ts",
        (F.col("commit_ts") - 1).alias("start_ts"),
        F.col("pk").alias("seq"),
        F.when(F.col("net_op") == "D", 1)
        .when(F.col("net_op") == "U", 2)
        .otherwise(3).alias("dml_order"),
        "pk", "before", "after",
    )
    twice = compact_changelog(again_input)
    a = {r["pk"]: (r["net_op"], r["before"], r["after"]) for r in once.collect()}
    b = {r["pk"]: (r["net_op"], r["before"], r["after"]) for r in twice.collect()}
    assert a == b
