"""Native avro protocol (`pkg/sink/codec/avro/arvo.go`): schema shape,
extension fields, delete tombstone/marker semantics, and the pipeline
integration."""

from __future__ import annotations

import json

import pytest

from ticdc_spark.codec.avro_protocol import (
    DELETE_BYTE,
    TIDB_COMMIT_TS,
    TIDB_OP,
    TIDB_PHYSICAL_TIME,
    avro_namespace,
    decode_message,
    encode_row_key,
    encode_row_value,
    table_key_schema,
    table_value_schema,
)
from ticdc_spark.codec.schema_registry import (
    ConfluentSchemaManager,
    InMemoryConfluentRegistry,
    InMemoryTransport,
)


def _manager():
    return ConfluentSchemaManager(
        "http://registry.local",
        transport=InMemoryTransport(InMemoryConfluentRegistry()))


def test_value_schema_shape():
    s = table_value_schema("db", "tbl")
    assert s["name"] == "tbl" and s["namespace"] == "default.db"
    by = {f["name"]: f for f in s["fields"]}
    # not-null handle column: bare type with tidb_type parameters
    assert by["id"]["type"] == {
        "type": "long", "connect.parameters": {"tidb_type": "BIGINT"}}
    assert "default" not in by["id"]
    # nullable, no column default: ["null", T] + default null
    assert by["val"]["type"][0] == "null"
    assert by["val"]["default"] is None
    # extension fields with defaults (schemaWithExtension)
    assert by[TIDB_OP]["default"] == ""
    assert by[TIDB_COMMIT_TS]["type"] == "long"
    assert by[TIDB_PHYSICAL_TIME]["default"] == 0
    # key schema carries only the handle columns
    k = table_key_schema("db", "tbl")
    assert [f["name"] for f in k["fields"]] == ["id"]


def test_nullable_with_default_orders_union_type_first():
    cols = ({"name": "x", "avro": "long", "tidb_type": "BIGINT",
             "default": 7},)
    s = table_value_schema("d", "t", cols, tidb_extension=False)
    f = s["fields"][0]
    assert f["type"][0]["type"] == "long" and f["type"][1] == "null"
    assert f["default"] == 7


def test_insert_value_roundtrip_with_extension():
    mgr = _manager()
    row = {"id": 5, "val": 1.5, "k": None}
    blob = encode_row_value(mgr, "tp", "db", "tbl", row, "I",
                            400 << 18 | 7)
    assert blob[0] == 0
    native = decode_message(mgr, "tp-value", blob)
    assert native["id"] == 5 and native["val"] == 1.5
    assert native["k"] is None
    assert native[TIDB_OP] == "c"
    assert native[TIDB_COMMIT_TS] == (400 << 18 | 7)
    assert native[TIDB_PHYSICAL_TIME] == 400  # ExtractPhysical = ts>>18
    key = encode_row_key(mgr, "tp", "db", "tbl", row)
    assert decode_message(mgr, "tp-key", key) == {"id": 5}


def test_delete_semantics():
    mgr = _manager()
    row = {"id": 9, "val": None, "k": 1}
    # default: tombstone (encodeValue returns nil)
    assert encode_row_value(mgr, "tp", "db", "tbl", row, "D", 123) is None
    # extension + watermark: the 9-byte delete marker
    blob = encode_row_value(mgr, "tp", "db", "tbl", row, "D", 123,
                            avro_enable_watermark=True)
    assert blob == bytes([DELETE_BYTE]) + (123).to_bytes(8, "big")
    assert decode_message(mgr, "tp-value", blob) == \
        {"_delete_commit_ts": 123}
    assert decode_message(mgr, "tp-value", None) is None


def test_registered_schema_json_matches_reference_layout():
    mgr = _manager()
    encode_row_value(mgr, "tp2", "db", "tbl", {"id": 1, "val": 0.5,
                                               "k": 2}, "I", 10)
    schema, _ = mgr.get_cached_or_register("tp2-value", 1,
                                           lambda: pytest.fail("cached"))
    parsed = json.loads(schema)
    assert parsed["type"] == "record"
    assert parsed["namespace"] == "default.db"
    assert [f["name"] for f in parsed["fields"]] == [
        "id", "val", "k", TIDB_OP, TIDB_COMMIT_TS, TIDB_PHYSICAL_TIME]


def test_namespace_sanitization():
    assert avro_namespace("default", "my-db") == "default.my_db"
    assert avro_namespace("ks", "") == "ks"


def test_pipeline_avro_protocol(spark, sf_dir):
    from ticdc_spark.pipeline import ChangefeedConfig, build_pipeline
    from ticdc_spark.sinks.kafka import kafka_frame
    from ticdc_spark.sources.changelog import events_changelog

    cl = events_changelog(spark, sf_dir)
    cfg = ChangefeedConfig(
        protocol="avro",
        dispatchers=[{"matcher": ["*.*"], "partition": "index-value",
                      "topic": "cdc_{schema}_{table}"}],
    )
    out = build_pipeline(cl, cfg)
    types = dict(out.dtypes)
    assert types["key"] == "binary" and types["value"] == "binary"
    kafka_frame(out)  # plan-time contract
    rows = out.select("op", "key", "value").limit(50).collect()
    assert rows
    for r in rows:
        assert r["key"][:1] == b"\x00"
        if r["op"] == "D":
            assert r["value"] is None  # tombstone
        else:
            assert r["value"][:1] == b"\x00"


def test_checkpoint_and_ddl_events():
    from ticdc_spark.codec.avro_protocol import (
        decode_event,
        encode_checkpoint,
        encode_ddl,
    )

    assert encode_checkpoint(5, avro_enable_watermark=False) is None
    cp = encode_checkpoint(1 << 40)
    assert cp == b"\x02" + (1 << 40).to_bytes(8, "big")
    assert decode_event(cp) == ("checkpoint", 1 << 40)

    assert encode_ddl("q", 3, "d", "t", 9, tidb_extension=False) is None
    ddl = encode_ddl("CREATE TABLE t (a int)", 3, "db", "t", 77)
    assert ddl[0] == 1
    kind, doc = decode_event(ddl)
    assert kind == "ddl"
    assert doc == {"query": "CREATE TABLE t (a int)", "type": 3,
                   "schema": "db", "table": "t", "commitTs": 77}

    assert decode_event(b"")[0] == "tombstone"
    assert decode_event(b"\x03" + (9).to_bytes(8, "big")) == ("delete", 9)
    assert decode_event(b"\x00abcd")[0] == "row"
