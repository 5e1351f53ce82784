"""Internal event wire header (16-byte envelope, big-endian)."""

from __future__ import annotations

import pytest

from ticdc_spark.codec.event_header import (
    EVENT_MAGIC,
    TYPE_DDL_EVENT,
    TYPE_DML_EVENT,
    marshal_event,
    unmarshal_event,
)


def test_header_bytes_golden():
    blob = marshal_event(TYPE_DDL_EVENT, 1, b"payload!")
    # MAGIC | TYPE=2 | VER=1 | LEN=8, all big-endian (design doc layout)
    assert blob[:4] == bytes([0xDA, 0x7A, 0x6A, 0x6A])
    assert blob[4:6] == bytes([0x00, 0x02])
    assert blob[6:8] == bytes([0x00, 0x01])
    assert blob[8:16] == (8).to_bytes(8, "big")
    assert blob[16:] == b"payload!"


def test_roundtrip_and_type_check():
    blob = marshal_event(TYPE_DML_EVENT, 0, b"\x00\x01\x02" * 100)
    t, v, payload = unmarshal_event(blob, expected_type=TYPE_DML_EVENT)
    assert (t, v) == (TYPE_DML_EVENT, 0)
    assert payload == b"\x00\x01\x02" * 100
    with pytest.raises(ValueError):
        unmarshal_event(blob, expected_type=TYPE_DDL_EVENT)


def test_validation_errors():
    with pytest.raises(ValueError):
        unmarshal_event(b"short")
    with pytest.raises(ValueError):
        unmarshal_event(b"XXXX" + bytes(12))          # bad magic
    blob = marshal_event(TYPE_DML_EVENT, 0, b"abc")
    with pytest.raises(ValueError):
        unmarshal_event(blob[:-1])                    # truncated payload
    assert EVENT_MAGIC == b"\xda\x7a\x6a\x6a"
