"""ResolvedEvent/BatchResolvedEvent codec (codec/resolved_event.py):
golden bytes, batch walk, truncation rejection."""

from __future__ import annotations

import pytest

from ticdc_spark.codec.resolved_event import (
    EVENT_SIZE_V1,
    ResolvedEvent,
    decode_batch,
    decode_resolved_event,
    encode_batch,
    encode_resolved_event,
)


def test_golden_bytes():
    e = ResolvedEvent(resolved_ts=0x0102030405060708, epoch=1, seq=2,
                      dispatcher_id=(0x1122334455667788, 0))
    b = encode_resolved_event(e)
    assert len(b) == EVENT_SIZE_V1 == 56
    assert b.hex() == (
        "da7a6a6a" "0003" "0001" "0000000000000028"   # header
        "0102030405060708"                             # resolved_ts BE
        "0000000000000001"                             # epoch BE
        "0000000000000002"                             # seq BE
        "8877665544332211" "0000000000000000"          # gid low LE, high LE
    )
    assert decode_resolved_event(b) == e


def test_batch_roundtrip_and_empty():
    evs = [ResolvedEvent(100 + i, 1, i, (i, i * 7)) for i in range(5)]
    assert decode_batch(encode_batch(evs)) == evs
    assert encode_batch([]) == b""
    assert decode_batch(b"") == []


def test_batch_truncation_rejected():
    b = encode_batch([ResolvedEvent(1, 1, 1, (1, 1))])
    with pytest.raises(ValueError, match="incomplete"):
        decode_batch(b[:-1] )
    with pytest.raises(ValueError, match="incomplete"):
        decode_batch(b + b"\xda\x7a")


def test_wrong_type_rejected():
    b = bytearray(encode_batch([ResolvedEvent(1, 1, 1, (1, 1))]))
    b[5] = 9  # type -> DropEvent
    with pytest.raises(ValueError):
        decode_batch(bytes(b))


def test_codec_matches_query_hex(spark, sf_dir):
    """The Python codec and the in-query hex algebra must agree
    byte-for-byte on the same dispatcher state."""
    from ticdc_spark.queries import QUERIES

    rows = QUERIES["batch_resolved_codec"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        e = ResolvedEvent(r["dec_resolved_ts"], r["dec_epoch"],
                          r["dec_seq"], (r["table_id"], 0))
        assert encode_resolved_event(e).hex() == r["event_hex"]
        assert r["header_ok"] and r["roundtrip_ok"]
