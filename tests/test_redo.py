"""K6 redo: writer file naming, meta aggregation, applier replay order.

Mirrors the reference's test strategy for `pkg/redo` + `pkg/applier`:
file-name golden shapes (`pkg/redo/config_test.go:26-80` ParseLogFileName
cases), meta max-aggregation (`redo_meta.go:40-50`), and the applier
splitter's deferred-insert ordering (`pkg/applier/splitter.go:31-57` —
the insert half of a handle-key-changing update must emit after every
delete/update of the same transaction).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from ticdc_spark.sinks.redo import (
    quartile_bounds,
    redo_apply_stream,
    redo_log_files,
    redo_meta,
    redo_window,
    split_updates_deferred,
)
from ticdc_spark.sources.changelog import events_changelog

_IMG = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("val", T.DoubleType()),
    T.StructField("k", T.LongType()),
])
_CL_SCHEMA = T.StructType([
    T.StructField("schema_name", T.StringType()),
    T.StructField("table_name", T.StringType()),
    T.StructField("table_id", T.LongType()),
    T.StructField("op", T.StringType()),
    T.StructField("commit_ts", T.LongType()),
    T.StructField("start_ts", T.LongType()),
    T.StructField("seq", T.LongType()),
    T.StructField("dml_order", T.IntegerType()),
    T.StructField("pk", T.LongType()),
    T.StructField("before", _IMG),
    T.StructField("after", _IMG),
])


def _row(op, commit_ts, seq, dml_order, before, after):
    return ("test", "t1", 1, op, commit_ts, commit_ts - 10, seq, dml_order,
            (after or before)[0], before, after)


def test_deferred_insert_emits_last_in_txn(spark):
    """One txn (shared commit_ts=100) holds: U(in-place), U(key-change),
    D. Reference order: D(split) and the other events in dml order, the
    split-born INSERT strictly last in the txn."""
    rows = [
        _row("U", 100, 1, 2, (1, 2.0, 1), (1, 3.0, 1)),       # in-place
        _row("U", 100, 2, 2, (2, 2.0, 1), (9, 2.0, 1)),       # key change
        _row("D", 100, 3, 1, (3, 1.0, 1), None),
        _row("I", 200, 4, 3, None, (4, 1.0, 1)),              # next txn
    ]
    cl = spark.createDataFrame(rows, _CL_SCHEMA)
    split = split_updates_deferred(cl)
    ddl = spark.createDataFrame([], T.StructType([
        T.StructField("schema_name", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("commit_ts", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("query", T.StringType()),
    ]))
    ordered = redo_apply_stream(split, ddl).orderBy("apply_rank").collect()
    ops = [(r.op, r.split_phase) for r in ordered]
    # txn@100: D(split of seq2), D(seq3), U(seq1) — all phase 0, dml order
    # — then the deferred I (phase 1); txn@200 after.
    assert ops == [("D", 0), ("D", 0), ("U", 0), ("I", 1), ("I", 0)]
    assert [r.apply_rank for r in ordered] == [1, 2, 3, 4, 5]


def test_ddl_applies_after_equal_ts_rows(spark):
    """shouldApplyDDL (`redo.go:180-190`): rows at commitTs == ddl ts
    apply first."""
    rows = [
        _row("I", 100, 1, 3, None, (1, 1.0, 1)),
        _row("I", 101, 2, 3, None, (2, 1.0, 1)),
    ]
    cl = spark.createDataFrame(rows, _CL_SCHEMA)
    ddl = spark.createDataFrame(
        [("test", "t1", 100, 50, "ALTER TABLE test.t1 ADD COLUMN c INT")],
        "schema_name string, table_name string, commit_ts long, seq long, query string",
    )
    ordered = redo_apply_stream(split_updates_deferred(cl), ddl) \
        .orderBy("apply_rank").collect()
    assert [(r.op, r.is_ddl) for r in ordered] == [
        ("I", 0), ("DDL", 1), ("I", 0)]


def test_file_name_shape_and_rotation(spark):
    """V1 layout captureID_changefeedID_row_maxCommitTs_uuid.log
    (`config.go:274`); the name's ts is the max commit ts WITHIN the
    file, and rotation starts a new file every rows_per_file."""
    rows = [_row("I", 100 + i, i, 3, None, (i, 1.0, 1)) for i in range(5)]
    cl = spark.createDataFrame(rows, _CL_SCHEMA)
    out = redo_log_files(cl, rows_per_file=2).orderBy("seq").collect()
    import re

    names = [r.file_name for r in out]
    for n in names:
        assert re.fullmatch(r"cp_cf_row_\d+_[0-9a-f]{8}\.log", n)
    # rows 0,1 → file(max=101); 2,3 → file(max=103); 4 → file(max=104)
    assert [n.split("_")[3] for n in names] == ["101", "101", "103", "103", "104"]
    # a rotated file's name differs from its neighbor's
    assert names[0] == names[1] and names[1] != names[2]
    # records are valid JSON with the redo row envelope
    import json

    rec = json.loads(out[0].value)
    assert rec["type"] == "row" and rec["row"]["commitTs"] == 100
    assert rec["row"]["columns"][0]["id"] == "0"
    assert rec["row"]["preColumns"] is None


def test_meta_max_aggregation(spark):
    """resolvedTs = max commit ts flushed; meta name per
    RedoMetaFileFormat (`config.go:279-281`)."""
    rows = [_row("I", 100 + i, i, 3, None, (i, 1.0, 1)) for i in range(3)]
    cl = spark.createDataFrame(rows, _CL_SCHEMA)
    m = redo_meta(cl, checkpoint_ts=95).collect()[0]
    assert (m.checkpoint_ts, m.resolved_ts) == (95, 102)
    import re

    assert re.fullmatch(r"cp_ks_cf_meta_[0-9a-f]{8}\.meta", m.file_name)


def test_replay_window_half_open(spark, sf_dir):
    """reader.go:205-215: checkpoint_ts < commit_ts <= resolved_ts."""
    cl = events_changelog(spark, sf_dir)
    bounds = quartile_bounds(cl)
    b = bounds.collect()[0]
    got = redo_window(cl, bounds).agg(
        F.min("commit_ts"), F.max("commit_ts")).collect()[0]
    assert got[0] > b.checkpoint_ts
    assert got[1] <= b.resolved_ts
    # and the window is non-trivial at every SF
    assert redo_window(cl, bounds).count() > 0
