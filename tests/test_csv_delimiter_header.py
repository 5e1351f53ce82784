"""[sink.csv] delimiter / null / output-field-header parity
(`pkg/config/sink.go:270-345`, `csv/csv_message.go:209-243,417-446`,
`csv/csv_encoder.go:46-48`) and the reference spelling of
delete-only-output-handle-key-columns (`sink.go:167`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ticdc_spark.codec.csv_codec import csv_header, encode_csv
from ticdc_spark.config import parse_changefeed_config

SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("txt", StringType()),
])


def _one_row(spark, txt):
    img = F.struct(F.lit(7).cast("long").alias("id"), F.lit(txt).alias("txt"))
    return spark.range(1).select(
        F.lit("s").alias("schema_name"), F.lit("t").alias("table_name"),
        F.lit("I").alias("op"), F.lit(100).cast("long").alias("commit_ts"),
        F.lit(0).cast("long").alias("seq"),
        F.lit(None).cast(SCHEMA).alias("before"), img.alias("after"),
    )


def test_multichar_delimiter_escapes_full_match_only(spark):
    # '||' escapes per char; a LONE '|' stays bare
    # (`csv_message.go:215,230-236` HasPrefix scan)
    out = encode_csv(_one_row(spark, "a|b||c"), quote=None,
                     delimiter="||").select("value").collect()[0].value
    assert out == "I||t||s||100||7||a|b\\|\\|c"


def test_custom_null_token(spark):
    img = F.struct(F.lit(7).cast("long").alias("id"),
                   F.lit(None).cast("string").alias("txt"))
    cl = spark.range(1).select(
        F.lit("s").alias("schema_name"), F.lit("t").alias("table_name"),
        F.lit("I").alias("op"), F.lit(100).cast("long").alias("commit_ts"),
        F.lit(0).cast("long").alias("seq"),
        F.lit(None).cast(SCHEMA).alias("before"), img.alias("after"),
    )
    out = encode_csv(cl, quote=None, delimiter=";",
                     null_token="MYNULL").select("value").collect()[0].value
    assert out == "I;t;s;100;7;MYNULL"


def test_csv_header_layout():
    # `csv_message.go:421-446` — meta names, then payload column names
    assert csv_header(SCHEMA, delimiter="|", terminator="\n") == (
        "ticdc-meta$operation|ticdc-meta$table|ticdc-meta$schema|"
        "ticdc-meta$commit-ts|id|txt\n")
    assert csv_header(SCHEMA, include_commit_ts=False,
                      output_old_value=True, terminator="\r\n") == (
        "ticdc-meta$operation,ticdc-meta$table,ticdc-meta$schema,"
        "ticdc-meta$is-update,id,txt\r\n")


def test_put_files_prepends_header(spark, tmp_path):
    from ticdc_spark.sinks.s3_client import S3Client
    from ticdc_spark.sinks.s3_live import BUCKET, put_files
    from ticdc_spark.sinks.s3_server import MiniS3Server

    with MiniS3Server() as srv:
        files = _one_row(spark, "x").select(
            F.lit("s/t/1").alias("path"), F.lit("CDC1.csv").alias("file_name"),
            F.lit("I,t,s,100,7,x").alias("value"), "commit_ts", "seq",
        )
        hdr = csv_header(SCHEMA, terminator="\n")
        put_files(files, srv.endpoint, srv.access_key, srv.secret_key,
                  header=hdr)
        c = S3Client(srv.endpoint, srv.access_key, srv.secret_key)
        body = c.get_object(BUCKET, "s/t/1/CDC1.csv").decode()
        c.close()
    assert body == hdr + "I,t,s,100,7,x\n"


def test_reference_spelling_of_delete_only_handle_key():
    cfg = parse_changefeed_config(
        "[sink]\ndelete-only-output-handle-key-columns = true\n")
    assert cfg.delete_only_output_handle_key is True


def test_csv_protocol_rejects_delete_only_handle_key():
    with pytest.raises(ValueError, match="CSV protocol always output"):
        parse_changefeed_config(
            '[sink]\nprotocol = "csv"\n'
            "delete-only-output-handle-key-columns = true\n")


@pytest.mark.parametrize("toml, msg", [
    ('[sink.csv]\ndelimiter = ""\n', "delimiter cannot be empty"),
    ('[sink.csv]\ndelimiter = "::::"\n', "more than three characters"),
    ('[sink.csv]\ndelimiter = "a\\n"\n', "line break"),
    ('[sink.csv]\nquote = "ab"\n', "more than one character"),
    ('[sink.csv]\nquote = "|"\ndelimiter = "||"\n', "common characters"),
    ('[sink.csv]\nbinary-encoding-method = "utf8"\n', "hex or base64"),
])
def test_csv_config_validation(toml, msg):
    with pytest.raises(ValueError, match=msg):
        parse_changefeed_config(f'[sink]\nprotocol = "csv"\n{toml}')
