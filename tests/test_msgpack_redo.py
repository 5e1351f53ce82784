"""Redo v2 msgpack codec (codec/msgpack_redo.py): byte pins from the
generated Go encoders, frame alignment, lenient decode."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ticdc_spark.codec.msgpack_redo import (
    _Reader,
    frame_records,
    marshal_redo_dml,
    mp_int,
    mp_str,
    mp_uint,
    unframe_records,
    unmarshal_redo_log,
)


def _row(**kw):
    base = dict(
        start_ts=100, commit_ts=101,
        table={"schema": "test", "table": "t1", "table_id": 7,
               "is_partition": False},
        columns=[{"value": 5, "flag": 0}],
        pre_columns=None,
    )
    base.update(kw)
    return base


def test_record_envelope_and_generated_byte_pins():
    b = marshal_redo_dml(_row())
    # version framing (`codec.go:36-40,80-86`)
    assert b[:4] == b"\xff\xff\x00\x02"
    # RedoLog map header + "row" key — the exact bytes the generated
    # encoder appends (`redo_gen.go:2413-2415`: 0x83, 0xa3, 'row')
    assert b[4:9] == bytes([0x83, 0xA3]) + b"row"
    # trailing "type": 0xa4 'type' 0x01 (`redo_gen.go:2448-2453`)
    assert b.endswith(bytes([0xA4]) + b"type" + b"\x01")
    # "ddl" key before it: 0xa3 'ddl' nil
    assert bytes([0xA3]) + b"ddl" + b"\xc0" in b


def test_unmarshal_structure():
    doc = unmarshal_redo_log(marshal_redo_dml(_row()))
    assert doc["type"] == 1 and doc["ddl"] is None
    inner = doc["row"]["row"]
    assert inner["start-ts"] == 100 and inner["commit-ts"] == 101
    assert inner["table"] == {"db-name": "test", "tbl-name": "t1",
                              "tbl-id": 7, "is-partition": False}
    assert doc["row"]["columns"] == [
        {"column": 5, "value-is-empty-bytes": False, "flag": 0}]
    assert doc["row"]["pre-columns"] is None


def test_int_uint_encodings_match_msgp_families():
    # tinylib minimal encodings: fixint, then signed/unsigned families
    assert mp_int(5) == b"\x05"
    assert mp_int(-3) == b"\xfd"
    assert mp_int(200) == b"\xd1\x00\xc8"      # int16 (signed family)
    assert mp_uint(200) == b"\xcc\xc8"         # uint8
    assert mp_uint(1 << 40) == b"\xcf" + (1 << 40).to_bytes(8, "big")
    assert mp_str("row") == b"\xa3row"


def test_frame_alignment_and_roundtrip():
    recs = [b"x" * n for n in (1, 7, 8, 9, 40)]
    framed = frame_records(recs)
    assert len(framed) % 8 == 0
    assert unframe_records(framed) == recs
    with pytest.raises(ValueError, match="incomplete"):
        unframe_records(framed[:-3])


@settings(max_examples=50, deadline=None)
@given(
    sts=st.integers(0, 2**63 - 1), cts=st.integers(0, 2**63 - 1),
    vals=st.lists(
        st.one_of(st.none(), st.integers(-2**62, 2**62), st.text(max_size=8),
                  st.booleans(), st.binary(max_size=8)),
        max_size=6),
    flag=st.integers(0, 2**62),
)
def test_fuzz_roundtrip(sts, cts, vals, flag):
    row = _row(start_ts=sts, commit_ts=cts,
               columns=[{"value": v, "flag": flag} for v in vals])
    doc = unmarshal_redo_log(marshal_redo_dml(row))
    got = [c["column"] for c in doc["row"]["columns"]]
    assert got == list(vals)
    assert doc["row"]["row"]["start-ts"] == sts


def test_reader_accepts_any_valid_family():
    # a non-minimal uint32 encoding of 5 still reads as 5
    r = _Reader(b"\xce\x00\x00\x00\x05")
    assert r.read() == 5


def test_ddl_arm_roundtrip_and_pins():
    from ticdc_spark.codec.msgpack_redo import marshal_redo_ddl

    b = marshal_redo_ddl({
        "start_ts": 9, "commit_ts": 10,
        "query": "ALTER TABLE t1 ADD COLUMN c INT",
        "action_type": 5,
        "table": {"schema": "test", "table": "t1", "table_id": 7},
        "columns": [{"name": "c", "origin_default": None,
                     "type": 3, "version": 1}],
        "blocked_tables": {"influence_type": 0, "table_ids": [7]},
        "need_added_tables": [8, 9],
    })
    assert b[:4] == b"\xff\xff\x00\x02"
    doc = unmarshal_redo_log(b)
    assert doc["type"] == 2 and doc["row"] is None
    d = doc["ddl"]
    assert d["type"] == 5
    assert d["table-name"]["tbl-name"] == "t1"
    assert d["table-schema-store"] is None
    inner = d["ddl"]
    assert inner["query"].startswith("ALTER TABLE")
    assert inner["columns"] == [{"name": "c", "origin_default": None,
                                 "type": 3, "version": 1}]
    assert inner["blocked-tables"] == {
        "influence-type": 0, "tables": [7], "schema": 0}
    # the reference tag really is underscored (`redo.go:84`)
    assert inner["need_added_tables"] == [{"table": 8}, {"table": 9}]
    assert inner["need-dropped-tables"] is None
