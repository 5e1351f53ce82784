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


# ---------------------------------------------------------------- round 7


def test_backslash_delimiter_single_pass_escape(spark):
    """ADVICE r6: a backslash-containing delimiter must not re-match
    inside already-escaped text.  Reference single-pass semantics
    (`csv_message.go:209-243`): data 'a\\b' with delimiter '\\' encodes
    'a\\\\b' (ONE escape), not quadruple."""
    out = encode_csv(_one_row(spark, "a\\b"), quote=None,
                     delimiter="\\").select("value").collect()[0].value
    assert out == "I\\t\\s\\100\\7\\a\\\\b"


def test_delimiter_colliding_with_escape_output(spark):
    """Delimiter 'rn' must match only RAW text: a literal CR followed
    by 'n' escapes to \\r + n with the delimiter untouched (the
    reference scans the raw value; a chained replace would re-match
    the escaped output)."""
    out = encode_csv(_one_row(spark, "\rn"), quote=None,
                     delimiter=";").select("value").collect()[0].value
    assert out == "I;t;s;100;7;\\rn"
    out2 = encode_csv(_one_row(spark, "\rn"), quote=None,
                      delimiter="rn").select("value").collect()[0].value
    # the precise reference rendering: raw CR+'n' has no 'rn' substring
    # (CR is \x0D), so only the CR escapes — the escaped output "\rn"
    # must NOT be re-matched as a delimiter
    assert out2 == "Irntrnsrn100rn7rn" + "\\rn"


def test_literal_rn_data_with_rn_delimiter(spark):
    # literal "rn" IS the delimiter in raw text -> per-char escape
    out = encode_csv(_one_row(spark, "arnb"), quote=None,
                     delimiter="rn").select("value").collect()[0].value
    assert out == "Irntrnsrn100rn7rna\\r\\nb"


def test_output_field_header_from_toml_to_live_storage(spark):
    """ADVICE r6 (medium): [sink.csv] output-field-header = true in the
    TOML must reach the storage files — pipeline-level test over the
    live S3 endpoint: every data file opens with the header line, and
    the consumer replay still matches."""
    from ticdc_spark.pipeline import storage_file_header
    from ticdc_spark.sinks.s3_client import S3Client
    from ticdc_spark.sinks.s3_live import BUCKET, storage_live_roundtrip

    cfg = parse_changefeed_config(
        'sink-uri = "s3://bucket/prefix?protocol=csv"\n'
        "[sink]\nprotocol = \"csv\"\n[sink.csv]\n"
        "output-field-header = true\n")
    cl = _one_row(spark, "hello").withColumn(
        "commit_ts", F.lit(1 << 18).cast("long"))
    # payload schema of this fixture
    hdr = storage_file_header(cfg, SCHEMA, line_terminator="\n")
    assert hdr == ("ticdc-meta$operation,ticdc-meta$table,"
                   "ticdc-meta$schema,ticdc-meta$commit-ts,id,txt\n")

    from ticdc_spark.sinks import s3_live as s3l

    n_before = len(s3l._LIVE_SERVERS)
    state = storage_live_roundtrip(cl, cfg=cfg)
    rows = state.collect()
    assert len(rows) == 1  # header line skipped by the consumer
    srv = s3l._LIVE_SERVERS[n_before]
    c = S3Client(srv.endpoint, srv.access_key, srv.secret_key)
    keys = [k for k, _ in c.list_objects(BUCKET)]
    assert keys, "no data files written"
    for k in keys:
        body = c.get_object(BUCKET, k).decode()
        assert body.startswith(hdr), f"{k} missing header: {body[:80]!r}"
    c.close()


def test_output_field_header_off_by_default(spark):
    from ticdc_spark.pipeline import storage_file_header

    cfg = parse_changefeed_config('sink-uri = "s3://b/p?protocol=csv"\n')
    assert storage_file_header(cfg, SCHEMA) is None
    cfg2 = parse_changefeed_config(
        'sink-uri = "s3://b/p"\n[sink]\nprotocol = "canal-json"\n'
        "[sink.csv]\noutput-field-header = true\n")
    assert storage_file_header(cfg2, SCHEMA) is None  # not csv


def test_private_use_codepoint_survives_escape(spark):
    """ADVICE r7: the old U+E000-sentinel rewrite corrupted a datum
    that legitimately contains that private-use codepoint ('ab'
    with delimiter '|' round-tripped as 'a|b').  The sentinel-free
    split/array_join construction leaves it untouched."""
    out = encode_csv(_one_row(spark, "ab|c"), quote=None,
                     delimiter="|").select("value").collect()[0].value
    assert out == "I|t|s|100|7|ab\\|c"


def test_regex_metachar_delimiter_split_is_literal(spark):
    # delimiter '.' must split literally, not as regex any-char
    out = encode_csv(_one_row(spark, "a.b cd"), quote=None,
                     delimiter=".").select("value").collect()[0].value
    assert out == "I.t.s.100.7.a\\.b cd"
