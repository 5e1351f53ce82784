"""MySQL writer batching caps from config (round 7):
max-multi-update-row(-size), enable-batch-dml, enable-multi-statement,
enable-cache-prepared-statement — `pkg/sink/mysql/config.go:49-85,
181-228`, `mysql_writer_dml_batch.go:575-649`,
`mysql_writer_dml_exec.go:58`."""

from __future__ import annotations

from pyspark.sql import functions as F

from ticdc_spark.config import mysql_batch_options, parse_changefeed_config
from ticdc_spark.sinks.mysql import multirow_batches


def _compacted(spark, n=10, text="x"):
    rows = spark.range(n)
    before = F.struct(
        F.col("id").cast("long").alias("id"),
        F.lit(1.0).alias("val"), F.lit(1).cast("long").alias("k"))
    after = F.struct(
        F.col("id").cast("long").alias("id"),
        F.lit(2.0).alias("val"), F.lit(2).cast("long").alias("k"))
    return rows.select(
        F.lit("test").alias("schema_name"), F.lit("t").alias("table_name"),
        F.col("id").cast("long").alias("pk"), F.lit("U").alias("net_op"),
        before.alias("before"), after.alias("after"))


def test_update_chunks_close_at_max_multi_update_row(spark):
    out = multirow_batches(_compacted(spark, 10), max_multi_update_row=2)
    rows = out.collect()
    # 10 updates at cap 2 -> 5 statements of 2 rows each
    assert len(rows) == 5
    assert all(r.n_rows == 2 for r in rows)
    assert all(r.stmt.startswith("UPDATE") for r in rows)
    assert sorted(r.batch_seq for r in rows) == [0, 1, 2, 3, 4]


def test_insert_delete_chunk_at_max_txn_row_not_update_cap(spark):
    ins = _compacted(spark, 10).withColumn("net_op", F.lit("I"))
    out = multirow_batches(ins, max_txn_row=4, max_multi_update_row=2)
    rows = out.collect()
    # inserts chunk at MaxTxnRow (4): 4+4+2
    assert sorted(r.n_rows for r in rows) == [2, 4, 4]


def test_size_cap_falls_back_to_per_row_updates(spark):
    # rendered row payload is ~ "(id, 2.00, 2)" > 4 bytes -> every chunk
    # trips the size gate and emits independent per-row UPDATEs
    out = multirow_batches(_compacted(spark, 4), max_multi_update_row=2,
                           max_multi_update_row_size=4)
    rows = out.collect()
    assert len(rows) == 4
    assert all(r.n_rows == 1 for r in rows)
    assert all(" CASE " not in r.stmt for r in rows)
    assert all(r.stmt.startswith("UPDATE `test`.`t` SET `id` = ")
               for r in rows)
    assert all(" WHERE `id` = " in r.stmt for r in rows)
    # big cap -> back to CASE form
    out2 = multirow_batches(_compacted(spark, 4), max_multi_update_row=2,
                            max_multi_update_row_size=8192)
    assert all(" CASE " in r.stmt for r in out2.collect())


def test_mysql_batch_options_defaults_and_clamps():
    cfg = parse_changefeed_config('sink-uri = "mysql://u:p@h:4000/"\n')
    o = mysql_batch_options(cfg)
    assert o == {"max_txn_row": 256, "max_multi_update_row": 40,
                 "max_multi_update_row_size": 1024,
                 "enable_batch_dml": True, "enable_multi_statement": True,
                 "enable_cache_prepared_statement": True}
    cfg2 = parse_changefeed_config(
        'sink-uri = "mysql://u:p@h:4000/?max-multi-update-row=9999'
        '&max-multi-update-row-size=99999"\n'
        "[sink.mysql-config]\nenable-batch-dml = false\n"
        "enable-multi-statement = false\n"
        "enable-cache-prepared-statement = false\n")
    o2 = mysql_batch_options(cfg2)
    # clamps: maxMaxMultiUpdateRowCount=256, maxMaxMultiUpdateRowSize=8192
    assert o2["max_multi_update_row"] == 256
    assert o2["max_multi_update_row_size"] == 8192
    assert o2["enable_batch_dml"] is False
    assert o2["enable_multi_statement"] is False
    assert o2["enable_cache_prepared_statement"] is False


def test_uri_caps_route_into_mysql_config():
    cfg = parse_changefeed_config(
        'sink-uri = "mysql://u:p@h:4000/?max-multi-update-row=80'
        '&max-multi-update-row-size=512"\n')
    assert cfg.mysql_config["max-multi-update-row"] == 80
    assert cfg.mysql_config["max-multi-update-row-size"] == 512
    o = mysql_batch_options(cfg)
    assert o["max_multi_update_row"] == 80
    assert o["max_multi_update_row_size"] == 512


def test_enable_batch_dml_false_selects_per_row_writer(spark):
    from ticdc_spark.pipeline import compile_sink_tail
    from ticdc_spark.sources.changelog import events_changelog

    cl = events_changelog(spark, "/root/testdata/sf0.001")
    cfg = parse_changefeed_config(
        'sink-uri = "mysql://u:p@h:4000/"\n'
        "[sink.mysql-config]\nenable-batch-dml = false\n")
    stmts = compile_sink_tail(cl, cfg)
    sample = [r.stmt for r in stmts.limit(20).collect()]
    # per-row writer: no multi-row VALUES lists, no CASE batches
    assert all("),(" not in s and " CASE " not in s for s in sample)
    cfg_on = parse_changefeed_config('sink-uri = "mysql://u:p@h:4000/"\n')
    batched = compile_sink_tail(cl, cfg_on)
    assert "batch_seq" in batched.columns


def test_apply_stmt_frame_multi_stmt_toggle(spark):
    """Both execution modes produce identical downstream state."""
    from ticdc_spark.sinks.mysql_live import (apply_stmt_frame,
                                              create_tables, read_state_df,
                                              start_server)

    for multi in (True, False):
        srv = start_server()
        create_tables(srv.host, srv.port, "root", "cdc-secret", ["t"])
        stmts = multirow_batches(_compacted(spark, 4).withColumn(
            "net_op", F.lit("I")))
        apply_stmt_frame(stmts, srv.host, srv.port, "root", "cdc-secret",
                         multi_stmt=multi)
        got = read_state_df(spark, srv.host, srv.port, "root",
                            "cdc-secret", ["t"])
        assert got.count() == 4
        srv.stop()


def test_prepared_cache_disabled_still_correct(spark):
    """enable-cache-prepared-statement=false: prepare/execute/close per
    statement — same downstream state, no cached handles left open."""
    from ticdc_spark.sources.changelog import events_changelog, scale_out
    from ticdc_spark.operators import split_updates
    from ticdc_spark.sinks.mysql import materialize_state
    from ticdc_spark.sinks.mysql_live import mysql_live_apply_prepared

    cl = split_updates(scale_out(
        events_changelog(spark, "/root/testdata/sf0.001")))
    tables = ["tp_click", "tp_error", "tp_purchase", "tp_signup", "tp_view"]
    got = mysql_live_apply_prepared(cl, tables, cache_prepared=False)
    exp = materialize_state(cl).select("table_name", "id", "val", "k")
    assert (got.exceptAll(exp).count() == 0
            and exp.exceptAll(got).count() == 0)


def test_size_zero_disables_multirow_update_end_to_end(spark):
    """ADVICE r7: getMaxMultiUpdateRowSize accepts 0 — multi-row
    UPDATE off (`pkg/sink/mysql/config.go:599-621` rejects only <0);
    0 must survive the URI parse AND mysql_batch_options so the
    size*len gate forces per-row UPDATEs."""
    cfg = parse_changefeed_config(
        'sink-uri = "mysql://u:p@h:4000/?max-multi-update-row-size=0"\n')
    o = mysql_batch_options(cfg)
    assert o["max_multi_update_row_size"] == 0
    out = multirow_batches(
        _compacted(spark, 4), max_multi_update_row=2,
        max_multi_update_row_size=o["max_multi_update_row_size"])
    rows = out.collect()
    assert len(rows) == 4 and all(r.n_rows == 1 for r in rows)
    assert all(" CASE " not in r.stmt for r in rows)


def test_size_negative_rejected_zero_accepted_in_uri():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="greater than or equal to 0"):
        parse_changefeed_config(
            'sink-uri = "mysql://u:p@h:4000/?max-multi-update-row-size=-1"\n')
    # TOML path: explicit 0 also passes through (merge semantics)
    cfg = parse_changefeed_config(
        'sink-uri = "mysql://u:p@h:4000/"\n'
        '[sink.mysql-config]\nmax-multi-update-row-size = 0\n')
    assert mysql_batch_options(cfg)["max_multi_update_row_size"] == 0


def test_prepared_arrow_boundary_keeps_exact_param_types(spark):
    """The prepared writer's executor boundary is mapInArrow (opt r8):
    nullable long/double columns must cross as exact Python ints /
    floats / None — a pandas boundary would NaN-promote int64 to
    float64 and flip the COM_STMT_EXECUTE arg tags (_param_type tags
    by Python type).  Pin the extraction the writer uses."""
    df = spark.createDataFrame(
        [("t", "I", None, 7, 1.5, 9), ("t", "D", 3, None, None, None)],
        "table_name string, op string, b_id long, a_id long, "
        "a_val double, a_k long")

    def probe(batches):
        import pyarrow as pa
        seen = []
        for b in batches:
            cols = [b.column(nm).to_pylist()
                    for nm in ("table_name", "op", "b_id", "a_id",
                               "a_val", "a_k")]
            seen.extend(zip(*cols))
        names = [",".join(type(v).__name__ for v in row) for row in seen]
        yield pa.RecordBatch.from_pydict({"types": names})

    got = {r.types for r in
           df.repartition(1).mapInArrow(probe, "types string").collect()}
    assert got == {"str,str,NoneType,int,float,int",
                   "str,str,int,NoneType,NoneType,NoneType"}
