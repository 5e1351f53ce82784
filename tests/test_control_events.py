"""Control-event wire codecs (codec/control_events.py): golden bytes
and roundtrips for the six remaining envelope payload types."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ticdc_spark.codec.control_events import (
    DMLEventMeta,
    DropEvent,
    HandshakeEvent,
    SyncPointEvent,
    decode_dml_event_meta,
    decode_drop_event,
    decode_handshake_event,
    decode_not_reusable_event,
    decode_ready_event,
    decode_sync_point_event,
    encode_dml_event_meta,
    encode_drop_event,
    encode_handshake_event,
    encode_not_reusable_event,
    encode_ready_event,
    encode_sync_point_event,
)

_GID = (0x1122334455667788, 0x99AABBCCDDEEFF00)
_GID_HEX = "8877665544332211" + "00ffeeddccbbaa99"


def test_sync_point_golden():
    b = encode_sync_point_event(SyncPointEvent(2, 3, 0x0102, _GID))
    assert b.hex() == ("da7a6a6a" "0005" "0001" "0000000000000028"
                       "0000000000000002" "0000000000000003"
                       "0000000000000102" + _GID_HEX)
    assert decode_sync_point_event(b) == SyncPointEvent(2, 3, 0x0102, _GID)


def test_ready_and_not_reusable_golden():
    b = encode_ready_event(_GID)
    assert b.hex() == "da7a6a6a" "0006" "0001" "0000000000000010" + _GID_HEX
    assert decode_ready_event(b) == _GID
    b2 = encode_not_reusable_event(_GID)
    assert b2.hex() == "da7a6a6a" "0008" "0001" "0000000000000010" + _GID_HEX
    assert decode_not_reusable_event(b2) == _GID


def test_drop_golden():
    e = DropEvent(_GID, 7, 9, 11)
    b = encode_drop_event(e)
    assert b.hex() == ("da7a6a6a" "0009" "0001" "0000000000000028"
                       + _GID_HEX + "0000000000000007"
                       "0000000000000009" "000000000000000b")
    assert decode_drop_event(b) == e


def test_handshake_roundtrip_with_table_info():
    e = HandshakeEvent(100, 1, 2, _GID, b'{"cols":["id","val"]}')
    assert decode_handshake_event(encode_handshake_event(e)) == e


def test_dml_meta_golden_and_minimum():
    e = DMLEventMeta(_GID, 5, 10, 11, 1, 2, length=3,
                     approximate_size=999, previous_total_offset=4,
                     row_types=(1, 0, 2), row_keys=(b"k1", b"key2"))
    b = encode_dml_event_meta(e)
    assert decode_dml_event_meta(b) == e
    # payload floor: 16 + 40 + 4+8+4 + 4 + 4 = 80 (`dml_event.go:950-957`)
    empty = encode_dml_event_meta(DMLEventMeta(_GID, 0, 0, 0, 0, 0, 0, 0, 0))
    assert len(empty) == 16 + 80
    from ticdc_spark.codec.event_header import TYPE_DML_EVENT, marshal_event
    with pytest.raises(ValueError, match="minimum"):
        # consistent header, payload one byte under the 80-byte floor
        decode_dml_event_meta(marshal_event(TYPE_DML_EVENT, 1, b"\x00" * 79))


def test_dml_meta_trailing_bytes_rejected():
    e = DMLEventMeta(_GID, 1, 1, 1, 1, 1, 1, 1, 1)
    b = bytearray(encode_dml_event_meta(e))
    b[8:16] = (int.from_bytes(b[8:16], "big") + 1).to_bytes(8, "big")
    with pytest.raises(ValueError):
        decode_dml_event_meta(bytes(b) + b"\x00")


@settings(max_examples=50, deadline=None)
@given(
    tid=st.integers(0, 2**63 - 1), sts=st.integers(0, 2**63 - 1),
    seq=st.integers(0, 2**63 - 1),
    rts=st.lists(st.integers(0, 2), max_size=20),
    keys=st.lists(st.binary(max_size=40), max_size=10),
)
def test_dml_meta_fuzz_roundtrip(tid, sts, seq, rts, keys):
    e = DMLEventMeta((tid, seq), tid, sts, sts + 1, seq, 1,
                     len(rts), 12345, 0, tuple(rts), tuple(keys))
    assert decode_dml_event_meta(encode_dml_event_meta(e)) == e


def test_dml_meta_codec_matches_query_hex(spark, sf_dir):
    """The in-query hex algebra and the Python codec agree
    byte-for-byte on the same txn metadata."""
    from ticdc_spark.queries import QUERIES

    rows = QUERIES["dml_event_frames"](spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        d = decode_dml_event_meta(bytes.fromhex(r["frame_hex"]))
        assert d.dispatcher_id == (r["table_id"], 0)
        assert d.physical_table_id == r["table_id"]
        assert d.commit_ts == r["commit_ts"]
        assert d.start_ts == r["start_ts"]
        assert d.length == r["length"] == len(d.row_types)
        assert d.approximate_size == r["approx_size"]
        assert d.row_keys == ()


def test_payload_length_strictness():
    """Trailing garbage and short payloads both raise ValueError (the
    codec-family contract), never struct.error."""
    from ticdc_spark.codec.event_header import (
        TYPE_DML_EVENT,
        TYPE_DROP_EVENT,
        TYPE_READY_EVENT,
        TYPE_SYNC_POINT_EVENT,
        marshal_event,
    )

    for mk, typ, good in [
        (decode_sync_point_event, TYPE_SYNC_POINT_EVENT, 40),
        (decode_drop_event, TYPE_DROP_EVENT, 40),
        (decode_ready_event, TYPE_READY_EVENT, 16),
    ]:
        with pytest.raises(ValueError):
            mk(marshal_event(typ, 1, b"\x00" * (good + 4)))  # garbage tail
        with pytest.raises(ValueError):
            mk(marshal_event(typ, 1, b"\x00" * (good - 10)))  # short
    # DML variable sections: n_row_keys promises more than present
    bad = marshal_event(TYPE_DML_EVENT, 1,
                        b"\x00" * 72 + b"\x00\x00\x00\x00"
                        + b"\x00\x00\x00\x02" + b"\x00\x00\x00\x02" + b"k")
    with pytest.raises(ValueError):
        decode_dml_event_meta(bad)
