"""ResolvedEvent / BatchResolvedEvent wire codec
(`pkg/common/event/resolved_ts_event.go`).

v1 payload (40 bytes): ``resolvedTs u64 BE | epoch u64 BE | seq u64 BE
| dispatcherID GID(16, LE low|high)`` (`encodeV1 :232-262`), wrapped in
the unified 16-byte event header (``codec/event_header.py``).  A batch
is the plain concatenation of whole events; the decoder walks headers
(`BatchResolvedEvent.Unmarshal :92-125`).  The resolved event is the
watermark message of the event service — a dispatcher's promise that
no DML below ``resolved_ts`` remains.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from ticdc_spark.codec.congestion_control import gid_marshal, gid_unmarshal
from ticdc_spark.codec.event_header import (
    HEADER_SIZE,
    TYPE_RESOLVED_EVENT,
    marshal_event,
    unmarshal_event,
)

RESOLVED_EVENT_VERSION1 = 1
_PAYLOAD_V1 = 40
EVENT_SIZE_V1 = HEADER_SIZE + _PAYLOAD_V1


@dataclass(frozen=True)
class ResolvedEvent:
    resolved_ts: int
    epoch: int
    seq: int
    dispatcher_id: tuple[int, int]  # (low, high)
    version: int = RESOLVED_EVENT_VERSION1


def encode_resolved_event(e: ResolvedEvent) -> bytes:
    if e.version != RESOLVED_EVENT_VERSION1:
        raise ValueError(f"unsupported ResolvedEvent version: {e.version}")
    payload = struct.pack(">QQQ", e.resolved_ts, e.epoch, e.seq) \
        + gid_marshal(*e.dispatcher_id)
    return marshal_event(TYPE_RESOLVED_EVENT, e.version, payload)


def decode_resolved_event(data: bytes) -> ResolvedEvent:
    _, version, payload = unmarshal_event(
        data, expected_type=TYPE_RESOLVED_EVENT)
    if version != RESOLVED_EVENT_VERSION1:
        raise ValueError(f"unsupported ResolvedEvent version: {version}")
    if len(payload) != _PAYLOAD_V1:
        raise ValueError(f"v1 payload must be {_PAYLOAD_V1} bytes, "
                         f"got {len(payload)}")
    ts, epoch, seq = struct.unpack(">QQQ", payload[:24])
    return ResolvedEvent(ts, epoch, seq, gid_unmarshal(payload[24:40]))


def encode_batch(events: list[ResolvedEvent]) -> bytes:
    """BatchResolvedEvent.Marshal: empty batch -> empty bytes."""
    return b"".join(encode_resolved_event(e) for e in events)


def decode_batch(data: bytes) -> list[ResolvedEvent]:
    """Walk headers; reject truncated frames like the reference."""
    out: list[ResolvedEvent] = []
    off = 0
    n = len(data)
    while off < n:
        if off + HEADER_SIZE > n:
            raise ValueError(f"incomplete header at offset {off}")
        (plen,) = struct.unpack(">Q", data[off + 8:off + 16])
        end = off + HEADER_SIZE + plen
        if end > n:
            raise ValueError(f"incomplete event at offset {off}")
        out.append(decode_resolved_event(data[off:end]))
        off = end
    return out
