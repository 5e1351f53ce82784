"""canal-json ``output-row-key`` (`pkg/config/sink.go:457` CodecConfig;
encoder `canal_json_encoder.go:340-345`) and CSV ``output-handle-key``
(`pkg/config/sink.go:287`; encoder warn-only no-op,
`csv/csv_message.go:136-141,344-347`)."""

from __future__ import annotations

import base64
import json

import pytest
from pyspark.sql import functions as F

from ticdc_spark.codec.canal_json import encode_canal_json
from ticdc_spark.codec.csv_codec import csv_encode_kwargs
from ticdc_spark.codec.rowcodec import encode_record_key
from ticdc_spark.config import parse_changefeed_config

_CL_SCHEMA = (
    "schema_name string, table_name string, op string, commit_ts long, "
    "start_ts long, seq long, dml_order long, table_id long, pk long, "
    "before struct<id:bigint,v:string>, after struct<id:bigint,v:string>"
)


def _frame(spark):
    return spark.createDataFrame(
        [("s", "t", "I", 100, 99, 0, 3, 55, 7, None, (7, "x")),
         ("s", "t", "U", 101, 99, 0, 2, 55, 7, (7, "x"), (7, "y")),
         ("s", "t", "D", 102, 99, 0, 1, 55, 8, (8, "y"), None)],
        _CL_SCHEMA)


def test_rowkey_matches_record_key_codec(spark):
    out = encode_canal_json(_frame(spark), tidb_extension=True,
                            output_row_key=True).select("op", "value")
    for r in out.collect():
        d = json.loads(r.value)
        handle = 8 if r.op == "D" else 7
        assert base64.b64decode(d["_tidb"]["rowkey"]) == \
            encode_record_key(55, handle)
        assert set(d["_tidb"]) == {"commitTs", "rowkey"}


def test_rowkey_gated_on_tidb_extension(spark):
    # `canal_json_encoder.go:340`: only when BOTH flags are on
    plain = encode_canal_json(_frame(spark), tidb_extension=True,
                              output_row_key=False)
    assert all("rowkey" not in r.value for r in plain.collect())
    no_ext = encode_canal_json(_frame(spark), tidb_extension=False,
                               output_row_key=True)
    assert all("_tidb" not in r.value for r in no_ext.collect())


def test_rowkey_requires_table_id_column(spark):
    df = _frame(spark).drop("table_id")
    with pytest.raises(ValueError, match="table_id"):
        encode_canal_json(df, tidb_extension=True, output_row_key=True)


def test_output_row_key_parses_from_toml_and_uri():
    cfg = parse_changefeed_config(
        'sink-uri = "kafka://h:9092/cdc?protocol=canal-json"\n'
        "[sink.kafka-config.codec-config]\n"
        "enable-tidb-extension = true\n"
        "output-row-key = true\n")
    assert cfg.tidb_extension and cfg.output_row_key
    # URI param overrides the file (mergeConfig+Apply order,
    # `codec/common/config.go:195-212`)
    cfg2 = parse_changefeed_config(
        'sink-uri = "kafka://h:9092/cdc?protocol=canal-json'
        '&output-row-key=false"\n'
        "[sink.kafka-config.codec-config]\n"
        "output-row-key = true\n")
    assert not cfg2.output_row_key
    cfg3 = parse_changefeed_config(
        'sink-uri = "kafka://h:9092/cdc?protocol=canal-json'
        '&enable-tidb-extension=true&output-row-key=true"\n')
    assert cfg3.tidb_extension and cfg3.output_row_key


def test_pipeline_encodes_rowkey_from_toml(spark):
    from ticdc_spark.pipeline import build_pipeline

    cfg = parse_changefeed_config(
        'sink-uri = "kafka://h:9092/cdc?protocol=canal-json"\n'
        "[sink.kafka-config.codec-config]\n"
        "enable-tidb-extension = true\n"
        "output-row-key = true\n")
    out = build_pipeline(_frame(spark), cfg)
    vals = [r.value for r in out.select("value").collect()]
    assert vals and all('"rowkey":"' in v for v in vals)


def test_csv_output_handle_key_warns_and_is_noop(spark):
    # the reference encoder warns and emits NOTHING for this key —
    # the emit line is commented out (`csv_message.go:136-141,344-347`)
    from ticdc_spark.codec.csv_codec import encode_csv

    img = F.struct(F.lit(7).cast("long").alias("id"),
                   F.lit("x").alias("txt"))
    cl = spark.range(1).select(
        F.lit("s").alias("schema_name"), F.lit("t").alias("table_name"),
        F.lit("I").alias("op"), F.lit(100).cast("long").alias("commit_ts"),
        F.lit(0).cast("long").alias("seq"),
        F.lit(None).cast("struct<id:bigint,txt:string>").alias("before"),
        img.alias("after"))
    with pytest.warns(UserWarning, match="not support output handle key"):
        kw = csv_encode_kwargs({"output-handle-key": True})
    base = encode_csv(cl).select("value").collect()[0].value
    keyed = encode_csv(cl, **kw).select("value").collect()[0].value
    assert base == keyed  # output unchanged
