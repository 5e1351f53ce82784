"""Event-service control-event wire codecs, completing the unified
envelope family (``codec/event_header.py``; payload layouts from
`pkg/common/event/`):

- SyncPointEvent v1 (`sync_point_event.go:162-186`):
  ``seq u64 | epoch u64 | commit_ts u64 | gid(16)``
- HandshakeEvent v1 (`handshake_event.go:144-177`):
  ``resolved_ts u64 | seq u64 | epoch u64 | gid(16) | table_info...``
  (table-info bytes opaque here — the schema document rides as-is)
- ReadyEvent / NotReusableEvent v1 (`ready_event.go:130-141`,
  `not_reusable_event.go:130-141`): ``gid(16)``
- DropEvent v1 (`drop_event.go:140-163`):
  ``gid(16) | dropped_seq u64 | dropped_commit_ts u64 | dropped_epoch u64``
- DMLEvent v1 METADATA (`dml_event.go:883-948`): the wire frame carries
  txn metadata + per-row types + row keys; the column data itself
  travels as the mounted chunk, so this codec is the event-service
  framing, not a row encoder:
  ``gid(16) | table_id u64 | start_ts u64 | commit_ts u64 | seq u64 |
  epoch u64 | length u32 | approx_size u64 | prev_total_offset u32 |
  n_row_types u32 | row_type u8 * | n_row_keys u32 |
  (key_len u32 | key bytes) *``

All numerics big-endian; GIDs 16-byte little-endian pairs (the
``common.GID`` layout shared with the heartbeat/congestion codecs).
RowType: delete=0, insert=1, update=2 (`pkg/common/types.go:349-357`).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from ticdc_spark.codec.congestion_control import gid_marshal, gid_unmarshal
from ticdc_spark.codec.event_header import (
    TYPE_DML_EVENT,
    TYPE_DROP_EVENT,
    TYPE_HANDSHAKE_EVENT,
    TYPE_NOT_REUSABLE_EVENT,
    TYPE_READY_EVENT,
    TYPE_SYNC_POINT_EVENT,
    marshal_event,
    unmarshal_event,
)

ROW_TYPE_DELETE, ROW_TYPE_INSERT, ROW_TYPE_UPDATE = 0, 1, 2
OP_TO_ROW_TYPE = {"D": ROW_TYPE_DELETE, "I": ROW_TYPE_INSERT,
                  "U": ROW_TYPE_UPDATE}
_V1 = 1



def _expect_len(p: bytes, want: int, name: str) -> None:
    if len(p) != want:
        raise ValueError(
            f"{name} v1 payload must be {want} bytes, got {len(p)}")


@dataclass(frozen=True)
class SyncPointEvent:
    seq: int
    epoch: int
    commit_ts: int
    dispatcher_id: tuple[int, int]


def encode_sync_point_event(e: SyncPointEvent) -> bytes:
    return marshal_event(
        TYPE_SYNC_POINT_EVENT, _V1,
        struct.pack(">QQQ", e.seq, e.epoch, e.commit_ts)
        + gid_marshal(*e.dispatcher_id))


def decode_sync_point_event(data: bytes) -> SyncPointEvent:
    _, _, p = unmarshal_event(data, expected_type=TYPE_SYNC_POINT_EVENT)
    _expect_len(p, 40, "SyncPointEvent")
    seq, epoch, ts = struct.unpack(">QQQ", p[:24])
    return SyncPointEvent(seq, epoch, ts, gid_unmarshal(p[24:40]))


@dataclass(frozen=True)
class HandshakeEvent:
    resolved_ts: int
    seq: int
    epoch: int
    dispatcher_id: tuple[int, int]
    table_info: bytes = b""


def encode_handshake_event(e: HandshakeEvent) -> bytes:
    return marshal_event(
        TYPE_HANDSHAKE_EVENT, _V1,
        struct.pack(">QQQ", e.resolved_ts, e.seq, e.epoch)
        + gid_marshal(*e.dispatcher_id) + e.table_info)


def decode_handshake_event(data: bytes) -> HandshakeEvent:
    _, _, p = unmarshal_event(data, expected_type=TYPE_HANDSHAKE_EVENT)
    if len(p) < 40:
        raise ValueError(
            f"HandshakeEvent v1 payload must be >= 40 bytes, got {len(p)}")
    ts, seq, epoch = struct.unpack(">QQQ", p[:24])
    return HandshakeEvent(ts, seq, epoch, gid_unmarshal(p[24:40]), p[40:])


def encode_ready_event(dispatcher_id: tuple[int, int]) -> bytes:
    return marshal_event(TYPE_READY_EVENT, _V1, gid_marshal(*dispatcher_id))


def decode_ready_event(data: bytes) -> tuple[int, int]:
    _, _, p = unmarshal_event(data, expected_type=TYPE_READY_EVENT)
    _expect_len(p, 16, "ReadyEvent")
    return gid_unmarshal(p[:16])


def encode_not_reusable_event(dispatcher_id: tuple[int, int]) -> bytes:
    return marshal_event(
        TYPE_NOT_REUSABLE_EVENT, _V1, gid_marshal(*dispatcher_id))


def decode_not_reusable_event(data: bytes) -> tuple[int, int]:
    _, _, p = unmarshal_event(data, expected_type=TYPE_NOT_REUSABLE_EVENT)
    _expect_len(p, 16, "NotReusableEvent")
    return gid_unmarshal(p[:16])


@dataclass(frozen=True)
class DropEvent:
    dispatcher_id: tuple[int, int]
    dropped_seq: int
    dropped_commit_ts: int
    dropped_epoch: int


def encode_drop_event(e: DropEvent) -> bytes:
    return marshal_event(
        TYPE_DROP_EVENT, _V1,
        gid_marshal(*e.dispatcher_id)
        + struct.pack(">QQQ", e.dropped_seq, e.dropped_commit_ts,
                      e.dropped_epoch))


def decode_drop_event(data: bytes) -> DropEvent:
    _, _, p = unmarshal_event(data, expected_type=TYPE_DROP_EVENT)
    _expect_len(p, 40, "DropEvent")
    seq, ts, epoch = struct.unpack(">QQQ", p[16:40])
    return DropEvent(gid_unmarshal(p[:16]), seq, ts, epoch)


@dataclass(frozen=True)
class DMLEventMeta:
    dispatcher_id: tuple[int, int]
    physical_table_id: int
    start_ts: int
    commit_ts: int
    seq: int
    epoch: int
    length: int
    approximate_size: int
    previous_total_offset: int
    row_types: tuple[int, ...] = ()
    row_keys: tuple[bytes, ...] = field(default=())


def encode_dml_event_meta(e: DMLEventMeta) -> bytes:
    p = bytearray(gid_marshal(*e.dispatcher_id))
    p += struct.pack(">QQQQQ", e.physical_table_id, e.start_ts,
                     e.commit_ts, e.seq, e.epoch)
    p += struct.pack(">IQI", e.length, e.approximate_size,
                     e.previous_total_offset)
    p += struct.pack(">I", len(e.row_types)) + bytes(e.row_types)
    p += struct.pack(">I", len(e.row_keys))
    for k in e.row_keys:
        p += struct.pack(">I", len(k)) + k
    return marshal_event(TYPE_DML_EVENT, _V1, bytes(p))


def decode_dml_event_meta(data: bytes) -> DMLEventMeta:
    _, _, p = unmarshal_event(data, expected_type=TYPE_DML_EVENT)
    if len(p) < 80:
        raise ValueError("DMLEvent v1 payload shorter than the minimum")
    gid = gid_unmarshal(p[:16])
    tid, sts, cts, seq, epoch = struct.unpack(">QQQQQ", p[16:56])
    length, approx, prev = struct.unpack(">IQI", p[56:72])
    off = 72
    (n_rt,) = struct.unpack(">I", p[off:off + 4])
    off += 4
    if off + n_rt + 4 > len(p):
        raise ValueError("DMLEvent row-type section exceeds payload")
    row_types = tuple(p[off:off + n_rt])
    off += n_rt
    (n_rk,) = struct.unpack(">I", p[off:off + 4])
    off += 4
    keys = []
    for _ in range(n_rk):
        if off + 4 > len(p):
            raise ValueError("DMLEvent row-key header exceeds payload")
        (kl,) = struct.unpack(">I", p[off:off + 4])
        off += 4
        if off + kl > len(p):
            raise ValueError("DMLEvent row-key bytes exceed payload")
        keys.append(bytes(p[off:off + kl]))
        off += kl
    if off != len(p):
        raise ValueError(f"trailing bytes in DMLEvent payload: "
                         f"{len(p) - off}")
    return DMLEventMeta(gid, tid, sts, cts, seq, epoch, length, approx,
                        prev, row_types, tuple(keys))
