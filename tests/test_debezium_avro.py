"""Debezium Avro encoder/decoder (`pkg/sink/codec/debezium/avro.go`,
`avro_decoder.go`) — schema conversion goldens, hand-derived binary
goldens, and full roundtrips over one field of every §1.3 type family.
"""

from __future__ import annotations

import json
import struct

import pytest

from ticdc_spark.codec.debezium_avro import (
    DECIMAL_CONNECT_NAME,
    ConnectToAvro,
    avro_decode,
    avro_encode,
    avro_native_to_connect_payload,
    avro_to_connect_schema,
    collect_named_schemas,
    decode_debezium_avro_payload,
    encode_debezium_avro_payload,
    sanitize_name,
    subject_for,
)
from ticdc_spark.codec.schema_registry import (
    ConfluentSchemaManager,
    InMemoryConfluentRegistry,
    InMemoryTransport,
)


def _manager() -> ConfluentSchemaManager:
    reg = InMemoryConfluentRegistry()
    return ConfluentSchemaManager("http://registry.local",
                                  transport=InMemoryTransport(reg))


def _field(ftype: str, fname: str, optional=False, **extra) -> dict:
    d = {"type": ftype, "optional": optional, "field": fname}
    d.update(extra)
    return d


# --- schema conversion (toAvroSchema) ---------------------------------------

def test_struct_to_record_with_namespace_and_optional_union():
    schema = {
        "type": "struct", "name": "db.tbl.Key", "optional": False,
        "fields": [_field("int64", "id"),
                   _field("string", "note", optional=True)],
    }
    avro = ConnectToAvro().to_avro_schema(schema)
    assert avro["type"] == "record" and avro["name"] == "Key"
    assert avro["namespace"] == "db.tbl"
    assert avro["connect.name"] == "db.tbl.Key"
    f_id, f_note = avro["fields"]
    assert f_id == {"name": "id", "type": "long", "connect.field": "id"}
    assert f_note["type"] == ["null", "string"]
    assert f_note["default"] is None


def test_named_schema_dedup_second_use_is_reference():
    value_struct = {
        "type": "struct", "name": "c.s.t.Value", "optional": True,
        "fields": [_field("int64", "id")],
    }
    env = {
        "type": "struct", "name": "c.s.t.Envelope", "optional": False,
        "version": 1,
        "fields": [dict(value_struct, field="before"),
                   dict(value_struct, field="after"),
                   _field("string", "op")],
    }
    avro = ConnectToAvro().to_avro_schema(env)
    before, after, _ = avro["fields"]
    assert isinstance(before["type"][1], dict)       # first use: defined
    assert after["type"][1] == "c.s.t.Value"         # second: reference
    assert avro["connect.version"] == 1


def test_int8_int16_carry_connect_type():
    avro = ConnectToAvro().to_avro_schema(_field("int8", "t"))
    assert avro == {"type": "int", "connect.type": "int8"}
    avro16 = ConnectToAvro().to_avro_schema(_field("int16", "s"))
    assert avro16["connect.type"] == "int16"


def test_decimal_schema_conversion():
    dec = _field("bytes", "d", name=DECIMAL_CONNECT_NAME, version=1,
                 parameters={"precision": "10", "scale": "2"})
    avro = ConnectToAvro().to_avro_schema(dec)
    assert avro["logicalType"] == "decimal"
    assert avro["precision"] == 10 and avro["scale"] == 2
    assert avro["connect.name"] == DECIMAL_CONNECT_NAME


def test_logical_named_primitive_keeps_metadata():
    date = _field("int32", "d", name="io.debezium.time.Date", version=1)
    avro = ConnectToAvro().to_avro_schema(date)
    assert avro == {"type": "int", "connect.name": "io.debezium.time.Date",
                    "connect.version": 1}


def test_sanitize_name():
    assert sanitize_name("a-b.c") == "a_b_c"
    assert sanitize_name("1col") == "_1col"
    assert subject_for("topic", "-key") == "topic-key"
    assert subject_for("", "-value", "db.t.Envelope") == "db.t.Envelope"
    assert subject_for("", "-value") == "debezium-value"


# --- binary goldens (hand-derived from the Avro spec) ------------------------

def test_record_binary_golden():
    schema = ConnectToAvro().to_avro_schema({
        "type": "struct", "name": "g.Rec", "optional": False,
        "fields": [_field("int64", "a"),
                   _field("string", "s", optional=True),
                   _field("boolean", "b")],
    })
    named = collect_named_schemas(schema)
    buf = avro_encode({"a": 3, "s": "hi", "b": True}, schema, named)
    # long 3 → zigzag 6 → 0x06 | union branch 1 → 0x02 | len 2 → 0x04,
    # "hi" | bool true → 0x01
    assert buf == b"\x06\x02\x04hi\x01"
    buf_null = avro_encode({"a": -1, "s": None, "b": False}, schema, named)
    # long -1 → zigzag 1 → 0x01 | branch 0 (null) → 0x00 | false 0x00
    assert buf_null == b"\x01\x00\x00"


def test_decimal_binary_golden():
    dec = ConnectToAvro().to_avro_schema(
        _field("bytes", "d", name=DECIMAL_CONNECT_NAME,
               parameters={"precision": "10", "scale": "2"}))
    # "-12.50" → unscaled -1250 → 2 bytes two's complement fb1e,
    # length 2 → zigzag 4
    assert avro_encode("-12.50", dec, {}) == b"\x04\xfb\x1e"
    v, pos = avro_decode(b"\x04\xfb\x1e", 0, dec, {})
    assert v == "-12.50" and pos == 3


def test_float_double_binary():
    assert avro_encode(1.5, "float", {}) == struct.pack("<f", 1.5)
    assert avro_encode(1.5, "double", {}) == struct.pack("<d", 1.5)


# --- roundtrip over every §1.3 type family -----------------------------------

_ALL_TYPE_FIELDS = [
    _field("int8", "c_tiny"),
    _field("int16", "c_short"),
    _field("int32", "c_int"),
    _field("int64", "c_bigint"),
    _field("float", "c_float"),
    _field("double", "c_double"),
    _field("boolean", "c_bit1"),
    _field("string", "c_varchar", optional=True),
    _field("bytes", "c_binary", optional=True),
    _field("bytes", "c_decimal", name=DECIMAL_CONNECT_NAME, version=1,
           parameters={"precision": "12", "scale": "3"}),
    _field("int32", "c_date", name="io.debezium.time.Date", version=1),
    _field("int64", "c_datetime", name="io.debezium.time.Timestamp",
           version=1),
    _field("string", "c_timestamp", name="io.debezium.time.ZonedTimestamp",
           version=1),
    _field("int64", "c_time", name="io.debezium.time.MicroTime",
           version=1),
    _field("string", "c_enum", name="io.debezium.data.Enum", version=1,
           parameters={"allowed": "a,b,c"}),
    _field("string", "c_set", name="io.debezium.data.EnumSet", version=1,
           parameters={"allowed": "x,y"}),
    _field("bytes", "c_bits", name="io.debezium.data.Bits", version=1,
           parameters={"length": "6"}, optional=True),
    _field("int32", "c_year"),
    _field("string", "c_json", optional=True),
]

_ALL_TYPE_PAYLOAD = {
    "c_tiny": 1, "c_short": -2, "c_int": 70000, "c_bigint": 1 << 40,
    "c_float": 0.5, "c_double": -2.25, "c_bit1": True,
    "c_varchar": "text 中文", "c_binary": "AQID",          # base64 bytes
    "c_decimal": "12345.678",
    "c_date": 19700, "c_datetime": 1700000000123,
    "c_timestamp": "2023-11-14T22:13:20Z",
    "c_time": 3600000000,
    "c_enum": "b", "c_set": "x,y", "c_bits": "IA==",
    "c_year": 2024, "c_json": '{"a": 1}',
}


def test_all_types_payload_roundtrip():
    message = {
        "schema": {"type": "struct", "name": "c.db.t.Key",
                   "optional": False, "fields": _ALL_TYPE_FIELDS},
        "payload": _ALL_TYPE_PAYLOAD,
    }
    mgr = _manager()
    data = encode_debezium_avro_payload(message, "topic", "-key", mgr)
    assert data[0] == 0 and len(data) > 5
    out = decode_debezium_avro_payload(data, mgr, "topic-key")
    assert out["payload"] == _ALL_TYPE_PAYLOAD
    # connect schema reconstructed from avro metadata: spot-check fields
    by_field = {f["field"]: f for f in out["schema"]["fields"]}
    assert by_field["c_tiny"]["type"] == "int8"
    assert by_field["c_decimal"]["name"] == DECIMAL_CONNECT_NAME
    assert by_field["c_decimal"]["parameters"]["scale"] == "3"
    assert by_field["c_date"]["name"] == "io.debezium.time.Date"
    assert by_field["c_varchar"]["optional"] is True
    assert by_field["c_enum"]["parameters"]["allowed"] == "a,b,c"


def test_envelope_roundtrip_with_null_before():
    row_fields = [_field("int64", "id"),
                  _field("double", "val", optional=True)]
    value_schema = {"type": "struct", "name": "c.db.t.Value",
                    "optional": True, "fields": row_fields}
    env = {
        "type": "struct", "name": "c.db.t.Envelope", "optional": False,
        "version": 1,
        "fields": [dict(value_schema, field="before"),
                   dict(value_schema, field="after"),
                   _field("string", "op"),
                   _field("int64", "ts_ms")],
    }
    payload = {"before": None, "after": {"id": 7, "val": 1.5},
               "op": "c", "ts_ms": 123}
    mgr = _manager()
    data = encode_debezium_avro_payload(
        {"schema": env, "payload": payload}, "t2", "-value", mgr)
    out = decode_debezium_avro_payload(data, mgr, "t2-value")
    assert out["payload"] == payload
    # the before/after structs share one named schema; decode resolves
    # the reference
    fields = {f["field"]: f for f in out["schema"]["fields"]}
    assert fields["before"]["fields"] == fields["after"]["fields"]
    assert fields["before"]["optional"] and fields["after"]["optional"]


def test_schema_registered_once_per_subject():
    mgr = _manager()
    msg = {"schema": {"type": "struct", "name": "x.Key",
                      "optional": False, "fields": [_field("int64", "id")]},
           "payload": {"id": 1}}
    d1 = encode_debezium_avro_payload(msg, "tp", "-key", mgr)
    d2 = encode_debezium_avro_payload(
        {"schema": msg["schema"], "payload": {"id": 2}}, "tp", "-key", mgr)
    assert d1[:5] == d2[:5]  # same schema id header


def test_registered_schema_is_valid_avro_json():
    mgr = _manager()
    msg = {"schema": {"type": "struct", "name": "c.db.t.Key",
                      "optional": False, "fields": _ALL_TYPE_FIELDS},
           "payload": _ALL_TYPE_PAYLOAD}
    encode_debezium_avro_payload(msg, "tp3", "-key", mgr)
    schema, _ = mgr.get_cached_or_register("tp3-key", 1,
                                           lambda: pytest.fail("cached"))
    parsed = json.loads(schema)
    assert parsed["type"] == "record"
    names = [f["name"] for f in parsed["fields"]]
    assert names == [sanitize_name(f["field"]) for f in _ALL_TYPE_FIELDS]


def test_bad_envelope_rejected():
    mgr = _manager()
    with pytest.raises(ValueError):
        decode_debezium_avro_payload(b"\x01\x00\x00\x00\x01", mgr, "s")
    with pytest.raises(ValueError):
        decode_debezium_avro_payload(b"\x00\x00", mgr, "s")


# --- pipeline protocol integration -------------------------------------------

def test_pipeline_debezium_avro_protocol(spark, sf_dir):
    """protocol=debezium-avro (config.ProtocolDebeziumAvro) flows
    through build_pipeline and lands as a broker-ready binary frame."""
    from ticdc_spark.pipeline import ChangefeedConfig, build_pipeline
    from ticdc_spark.sinks.kafka import kafka_frame
    from ticdc_spark.sources.changelog import events_changelog

    cl = events_changelog(spark, sf_dir)
    cfg = ChangefeedConfig(
        protocol="debezium-avro",
        dispatchers=[{"matcher": ["*.*"], "partition": "index-value",
                      "topic": "cdc_{schema}_{table}"}],
    )
    out = build_pipeline(cl, cfg)
    types = dict(out.dtypes)
    assert types["key"] == "binary" and types["value"] == "binary"
    frame = kafka_frame(out)  # plan-time contract validation
    rows = frame.limit(5).collect()
    assert rows and all(r["value"][:1] == b"\x00" for r in rows)
    # the frame decodes back through the registry-metadata-only decoder
    from ticdc_spark.codec.debezium_avro import (
        decode_debezium_avro_payload,
        encode_debezium_avro_payload,  # noqa: F401 (same manager API)
    )
    from ticdc_spark.codec.schema_registry import (
        ConfluentSchemaManager,
        InMemoryConfluentRegistry,
        InMemoryTransport,
    )
    import json as _json

    from ticdc_spark.codec.debezium import (
        encode_debezium_full,
        encode_debezium_key,
    )
    one = (encode_debezium_key(
        encode_debezium_full(cl, disable_schema=False),
        disable_schema=False)
        .select("schema_name", "table_name", "key", "value")
        .limit(1).collect()[0])
    mgr = ConfluentSchemaManager(
        "http://r.local",
        transport=InMemoryTransport(InMemoryConfluentRegistry()))
    topic = f"ticdc-spark.{one['schema_name']}.{one['table_name']}"
    blob = encode_debezium_avro_payload(
        _json.loads(one["value"]), topic, "-value", mgr)
    back = decode_debezium_avro_payload(blob, mgr, topic + "-value")
    assert back["payload"]["op"] in ("c", "u", "d")


def test_avro_watermark_gating_and_roundtrip(spark):
    """encoder.go:41-49: debezium-avro watermarks are skipped unless
    enable-tidb-extension AND avro-enable-watermark; when on, the frame
    decodes back via the schema-name subject."""
    from ticdc_spark.codec.debezium_avro import debezium_avro_watermarks

    wm = spark.createDataFrame([(1704067200000000,)], "resolved_ts long")
    # gated off (either flag missing) -> no messages
    assert debezium_avro_watermarks(wm, tidb_extension=True).count() == 0
    assert debezium_avro_watermarks(
        wm, avro_enable_watermark=True).count() == 0

    rows = debezium_avro_watermarks(
        wm, tidb_extension=True, avro_enable_watermark=True).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["key"][:1] == b"\x00" and r["value"][:1] == b"\x00"
    # decode the value via a fresh manager replaying the registration
    import json as _json

    from ticdc_spark.codec.debezium import debezium_watermark_messages
    from ticdc_spark.codec.debezium_avro import (
        decode_debezium_avro_payload,
        encode_debezium_avro_payload,
    )

    msg = _json.loads(debezium_watermark_messages(
        wm, disable_schema=False).collect()[0]["value"])
    mgr = _manager()
    blob = encode_debezium_avro_payload(msg, "", "-value", mgr)
    assert blob == bytes(r["value"])
    subject = msg["schema"]["name"]
    back = decode_debezium_avro_payload(blob, mgr, subject)
    assert back["payload"]["op"] == "m"
    assert back["payload"]["source"]["commit_ts"] == 1704067200000000


def test_compiled_codecs_match_interpreters_exactly():
    """The per-schema compiled closures (guide §4.5) must be
    byte/value-identical to the reference interpreters on every branch:
    unions, records, arrays, decimals, bytes, all primitives."""
    from decimal import Decimal

    from ticdc_spark.codec.debezium_avro import (
        ConnectToAvro,
        avro_decode,
        avro_encode,
        avro_native_to_connect_payload,
        collect_named_schemas,
        compile_avro_decoder,
        compile_avro_encoder,
        compile_connect_to_native,
    )

    schema = {
        "type": "record", "name": "T", "namespace": "ns", "fields": [
            {"name": "i", "type": "long"},
            {"name": "s", "type": ["null", "string"], "default": None},
            {"name": "f", "type": ["null", "double"], "default": None},
            {"name": "b", "type": ["null", "boolean"], "default": None},
            {"name": "raw", "type": ["null", "bytes"], "default": None},
            {"name": "dec", "type": ["null", {
                "type": "bytes", "logicalType": "decimal",
                "precision": 10, "scale": 2}], "default": None},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
        ],
    }
    named = collect_named_schemas(schema)
    enc_c = compile_avro_encoder(schema, named)
    dec_c = compile_avro_decoder(schema, named)
    dec_connect = compile_avro_decoder(schema, named, to_connect=True)
    values = [
        {"i": 7, "s": "héllo", "f": 2.5, "b": True, "raw": b"\x00\xff",
         "dec": Decimal("12.34"), "arr": [1, -2, 3]},
        {"i": -1, "s": None, "f": None, "b": False, "raw": None,
         "dec": None, "arr": []},
        {"i": 0, "s": "", "f": -0.0, "b": None, "raw": b"",
         "dec": Decimal("-0.05"), "arr": [0]},
    ]
    for v in values:
        ref = avro_encode(v, schema, named)
        assert enc_c(v) == ref  # byte-exact
        ref_native, ref_pos = avro_decode(ref, 0, schema, named)
        got_native, got_pos = dec_c(ref, 0)
        assert (got_native, got_pos) == (ref_native, ref_pos)
        # fused connect view == interpreter pipeline
        ref_payload = avro_native_to_connect_payload(schema, ref_native,
                                                     named)
        got_payload, _ = dec_connect(ref, 0)
        assert got_payload == ref_payload

    # compiled to_native == ConnectToAvro().to_native
    cschema = {
        "type": "struct", "fields": [
            {"field": "a-b", "type": "int64"},
            {"field": "s", "type": "string", "optional": True},
            {"field": "d", "type": "bytes", "optional": True,
             "name": "org.apache.kafka.connect.data.Decimal",
             "parameters": {"scale": "2"}},
            {"field": "xs", "type": "array",
             "items": {"type": "int32"}, "optional": True},
        ],
    }
    to_native_c = compile_connect_to_native(cschema)
    for payload in [
        {"a-b": 5, "s": "x", "d": "1.25", "xs": [1, 2]},
        {"a-b": 5, "s": None, "d": None, "xs": None},
    ]:
        assert (to_native_c(payload)
                == ConnectToAvro().to_native(cschema, payload))
