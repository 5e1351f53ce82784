"""Chunk codec + binary JSON + BatchDMLEvent payload frames.

Layout source: TiDB ``pkg/util/chunk/codec.go`` (column framing),
``pkg/types/json_binary.go`` (binary JSON grammar), and
`pkg/common/event/dml_event.go:241-330` (batch framing around the
chunk buffer).  Golden vectors are hand-derived from those public
layouts, byte by byte.
"""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ticdc_spark.codec.binary_json import (
    binary_to_json,
    json_to_binary,
    render_json,
)
from ticdc_spark.codec.chunk_codec import (
    TYPE_BLOB,
    TYPE_DOUBLE,
    TYPE_DURATION,
    TYPE_ENUM,
    TYPE_FLOAT,
    TYPE_JSON,
    TYPE_LONG,
    TYPE_LONGLONG,
    TYPE_NEWDECIMAL,
    TYPE_VARCHAR,
    ChunkCodec,
    mydecimal_from_struct,
    mydecimal_struct,
)
from ticdc_spark.codec.control_events import (
    ROW_TYPE_DELETE,
    ROW_TYPE_INSERT,
    ROW_TYPE_UPDATE,
    DMLEventMeta,
)
from ticdc_spark.codec.dml_event import (
    BatchDMLEvent,
    decode_batch_dml_event,
    encode_batch_dml_event,
    iter_row_changes,
)


# --- golden column layouts (codec.go encodeColumn) -------------------------

def test_fixed_column_no_nulls_golden():
    codec = ChunkCodec([TYPE_LONGLONG])
    buf = codec.encode([[1, 2, -3]])
    # length=3 LE | nullCount=0 LE | 3 x int64 LE, no bitmap/offsets
    assert buf == (struct.pack("<II", 3, 0)
                   + struct.pack("<qqq", 1, 2, -3))


def test_fixed_column_with_nulls_golden():
    codec = ChunkCodec([TYPE_LONGLONG])
    buf = codec.encode([[7, None, 9]])
    # bitmap: rows 0,2 not-null -> bits 0 and 2 -> 0b101 = 0x05
    assert buf == (struct.pack("<II", 3, 1) + b"\x05"
                   + struct.pack("<qqq", 7, 0, 9))


def test_var_column_golden():
    codec = ChunkCodec([TYPE_VARCHAR])
    buf = codec.encode([["ab", None, "cdef"]])
    # offsets (4 x i64): 0, 2, 2, 6 — null row occupies nothing
    assert buf == (struct.pack("<II", 3, 1) + b"\x05"
                   + struct.pack("<4q", 0, 2, 2, 6) + b"abcdef")


def test_float_is_4_bytes_double_is_8():
    codec = ChunkCodec([TYPE_FLOAT, TYPE_DOUBLE])
    buf = codec.encode([[1.5], [2.5]])
    assert buf == (struct.pack("<II", 1, 0) + struct.pack("<f", 1.5)
                   + struct.pack("<II", 1, 0) + struct.pack("<d", 2.5))


def test_unsigned_longlong_roundtrip():
    codec = ChunkCodec([TYPE_LONGLONG], unsigned=[True])
    v = (1 << 64) - 5
    cols, rest = codec.decode(codec.encode([[v]]))
    assert cols == [[v]] and rest == b""


def test_enum_name_value_layout():
    codec = ChunkCodec([TYPE_ENUM])
    buf = codec.encode([[(2, "green")]])
    assert buf == (struct.pack("<II", 1, 0)
                   + struct.pack("<2q", 0, 13)
                   + struct.pack("<Q", 2) + b"green")
    cols, _ = codec.decode(buf)
    assert cols == [[(2, "green")]]


def test_duration_nanoseconds():
    codec = ChunkCodec([TYPE_DURATION])
    ns = -(3 * 3600 + 25 * 60) * 10**9
    cols, _ = codec.decode(codec.encode([[ns]]))
    assert cols == [[ns]]


def test_multi_column_roundtrip_with_trailing_bytes():
    codec = ChunkCodec([TYPE_LONG, TYPE_VARCHAR, TYPE_DOUBLE])
    cols_in = [[1, None, 3], ["x", "yy", None], [0.5, -1.25, None]]
    blob = codec.encode(cols_in) + b"TRAILER"
    cols, rest = codec.decode(blob)
    # string columns decode to raw bytes (charset handling lives above)
    assert cols == [[1, None, 3], [b"x", b"yy", None],
                    [0.5, -1.25, None]]
    assert rest == b"TRAILER"


def test_truncated_buffer_raises():
    codec = ChunkCodec([TYPE_LONGLONG])
    buf = codec.encode([[1, 2]])
    with pytest.raises(ValueError):
        codec.decode(buf[:-3])


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.integers(-(1 << 63), (1 << 63) - 1)),
                max_size=40),
       st.lists(st.one_of(st.none(), st.text(max_size=12)), max_size=40))
def test_chunk_roundtrip_fuzz(ints, texts):
    n = max(len(ints), len(texts), 1)
    ints = (ints + [None] * n)[:n]
    texts = (texts + [None] * n)[:n]
    codec = ChunkCodec([TYPE_LONGLONG, TYPE_BLOB])
    cols, rest = codec.decode(codec.encode(
        [ints, [t.encode() if t is not None else None for t in texts]]))
    assert rest == b""
    assert cols[0] == ints
    assert cols[1] == [t.encode() if t is not None else None
                       for t in texts]


# --- MyDecimal struct image -------------------------------------------------

def test_mydecimal_struct_golden():
    b = mydecimal_struct("-1234567890.5")
    # digitsInt=10, digitsFrac=1, resultFrac=1, negative=1
    assert b[:4] == bytes([10, 1, 1, 1])
    words = struct.unpack("<9i", b[4:])
    # int part right-aligned: lead word "1", then "234567890";
    # frac "5" left-aligned zero-padded: 500000000
    assert words[:3] == (1, 234567890, 500000000)
    assert words[3:] == (0,) * 6
    assert mydecimal_from_struct(b) == "-1234567890.5"


def test_mydecimal_roundtrip_canonical():
    for s in ["0", "1", "-7", "12.3400", "-0.001",
              "999999999999999999.999999999"]:
        out = mydecimal_from_struct(mydecimal_struct(s))
        # canonical form: integer leading zeros stripped ("" -> "0")
        neg = s.startswith("-")
        body = s.lstrip("-")
        ip, _, fp = body.partition(".")
        ip = ip.lstrip("0") or "0"
        want = ("-" if neg and (ip != "0" or fp.strip("0")) else "") + ip \
            + ("." + fp if "." in body else "")
        assert out == want


# --- binary JSON ------------------------------------------------------------

def test_json_scalar_goldens():
    assert json_to_binary(None) == b"\x04\x00"
    assert json_to_binary(True) == b"\x04\x01"
    assert json_to_binary(False) == b"\x04\x02"
    assert json_to_binary(5) == b"\x09" + struct.pack("<q", 5)
    assert json_to_binary((1 << 63) + 1) == \
        b"\x0a" + struct.pack("<Q", (1 << 63) + 1)
    assert json_to_binary(2.5) == b"\x0b" + struct.pack("<d", 2.5)
    assert json_to_binary("hi") == b"\x0c\x02hi"


def test_json_array_golden():
    doc = json_to_binary([1, "ab", None])
    # type 0x03 | count=3 | size | entries 5B each | data
    assert doc[0] == 0x03
    count, size = struct.unpack_from("<II", doc, 1)
    assert count == 3
    data_start = 8 + 5 * 3
    # entry 0: int64 at data_start
    assert doc[1 + 8] == 0x09
    assert struct.unpack_from("<I", doc, 1 + 9)[0] == data_start
    # entry 1: string at data_start+8
    assert doc[1 + 13] == 0x0C
    assert struct.unpack_from("<I", doc, 1 + 14)[0] == data_start + 8
    # entry 2: literal nil inlined
    assert doc[1 + 18] == 0x04 and doc[1 + 19] == 0x00
    assert size == len(doc) - 1
    assert binary_to_json(doc) == [1, "ab", None]


def test_json_object_key_order_and_roundtrip():
    obj = {"bb": 1, "a": 2, "ccc": [True, {"k": None}], "z": 0.5}
    doc = json_to_binary(obj)
    assert doc[0] == 0x01
    assert binary_to_json(doc) == obj
    # keys sorted by (length, bytes): a, z, bb, ccc
    count, size = struct.unpack_from("<II", doc, 1)
    assert count == 4 and size == len(doc) - 1
    koff, klen = struct.unpack_from("<IH", doc, 1 + 8)
    assert doc[1 + koff:1 + koff + klen] == b"a"


def test_json_nested_depth_roundtrip():
    obj = {"a": [{"b": [1, [2, [3, "deep"]]]}], "n": None}
    assert binary_to_json(json_to_binary(obj)) == obj


def test_render_json():
    assert render_json({"bb": [1, None], "a": True}) == \
        '{"a": true, "bb": [1, null]}'


# --- BatchDMLEvent with chunk payload ---------------------------------------

def _meta(table_id, start_ts, commit_ts, row_types, seq=1):
    return DMLEventMeta(
        dispatcher_id=(table_id, 0), physical_table_id=table_id,
        start_ts=start_ts, commit_ts=commit_ts, seq=seq, epoch=1,
        length=len(row_types), approximate_size=64 * len(row_types),
        previous_total_offset=0, row_types=tuple(row_types),
        row_keys=())


def test_batch_dml_event_roundtrip():
    codec = ChunkCodec([TYPE_LONGLONG, TYPE_DOUBLE, TYPE_VARCHAR])
    events = (
        _meta(1, 10, 11, [ROW_TYPE_INSERT, ROW_TYPE_UPDATE]),  # 3 phys
        _meta(1, 12, 13, [ROW_TYPE_DELETE]),                   # 1 phys
    )
    cols = ((1, 2, 2, 3),
            (0.5, 1.0, 2.0, None),
            ("a", "pre", "post", "gone"))
    blob = encode_batch_dml_event(BatchDMLEvent(events, cols), codec)
    out = decode_batch_dml_event(blob, codec)
    assert out.events == events
    assert out.columns == ((1, 2, 2, 3), (0.5, 1.0, 2.0, None),
                           (b"a", b"pre", b"post", b"gone"))
    changes = list(iter_row_changes(out))
    assert changes == [
        (0, ROW_TYPE_INSERT, None, (1, 0.5, b"a")),
        (0, ROW_TYPE_UPDATE, (2, 1.0, b"pre"), (2, 2.0, b"post")),
        (1, ROW_TYPE_DELETE, (3, None, b"gone"), None),
    ]


def test_batch_dml_event_header_golden():
    codec = ChunkCodec([TYPE_LONGLONG])
    blob = encode_batch_dml_event(
        BatchDMLEvent((_meta(5, 1, 2, [ROW_TYPE_INSERT]),), ((42,),)),
        codec)
    # envelope: magic | type=1 (BatchDMLEvent) | version=1 | len
    assert blob[:4] == b"\xda\x7a\x6a\x6a"
    assert struct.unpack(">HH", blob[4:8]) == (1, 1)
    # payload starts with DMLEventCount u64 BE
    assert struct.unpack(">Q", blob[16:24])[0] == 1


def test_batch_dml_event_row_count_mismatch_raises():
    codec = ChunkCodec([TYPE_LONGLONG])
    events = (_meta(1, 1, 2, [ROW_TYPE_UPDATE]),)  # implies 2 phys rows
    blob = encode_batch_dml_event(BatchDMLEvent(events, ((7,),)), codec)
    with pytest.raises(ValueError):
        decode_batch_dml_event(blob, codec)


def test_batch_dml_event_json_column():
    codec = ChunkCodec([TYPE_LONGLONG, TYPE_JSON])
    doc = json_to_binary({"a": 1, "b": [None, "x"]})
    events = (_meta(9, 1, 2, [ROW_TYPE_INSERT, ROW_TYPE_INSERT]),)
    blob = encode_batch_dml_event(
        BatchDMLEvent(events, ((1, 2), (doc, None))), codec)
    out = decode_batch_dml_event(blob, codec)
    assert out.columns[1][0] == doc
    assert binary_to_json(out.columns[1][0]) == {"a": 1, "b": [None, "x"]}
    assert out.columns[1][1] is None


def test_decimal_column_in_chunk():
    codec = ChunkCodec([TYPE_NEWDECIMAL])
    cols, _ = codec.decode(codec.encode([["-12.50", None, "3"]]))
    assert cols == [["-12.50", None, "3"]]
