"""CongestionControl event codec — the wire message the adaptive
scan-window controller consumes (`pkg/common/event/congestion_control.go`).

Layouts (numbers big-endian except GID, which is two LE u64s,
`pkg/common/types.go:119-129`):

- ``AvailableMemory`` v1: ``gid(16) | available u64 | dispatcher_count
  u32 | {dispatcher_gid(16) | available u64}*``; v2 inserts
  ``usage_ratio float64-bits`` after ``available``.
- ``CongestionControl`` payload: ``cluster_id u64 | changefeed_count
  u32 | AvailableMemory*``; v2 appends an optional release-entry tail
  ``count u32 | {gid(16) | release_count u32}*`` (only written when at
  least one changefeed reported releases).
- On the wire the payload rides the unified 16-byte event header
  (`codec/event_header.py`, type 10).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from ticdc_spark.codec.event_header import (
    TYPE_CONGESTION_CONTROL,
    marshal_event,
    unmarshal_event,
)

V1 = 1
V2 = 2


def gid_marshal(low: int, high: int) -> bytes:
    return struct.pack("<QQ", low, high)


def gid_unmarshal(b: bytes) -> tuple[int, int]:
    return struct.unpack("<QQ", b)


@dataclass
class AvailableMemory:
    gid: tuple[int, int]
    available: int
    usage_ratio: float = 0.0
    dispatcher_available: list = field(default_factory=list)
    memory_release_count: int = 0

    def marshal(self, version: int) -> bytes:
        out = bytearray(gid_marshal(*self.gid))
        out += struct.pack(">Q", self.available)
        if version == V2:
            out += struct.pack(">d", self.usage_ratio)
        out += struct.pack(">I", len(self.dispatcher_available))
        for d_gid, avail in self.dispatcher_available:
            out += gid_marshal(*d_gid)
            out += struct.pack(">Q", avail)
        return bytes(out)


@dataclass
class CongestionControl:
    cluster_id: int
    availables: list
    version: int = V1

    def marshal(self) -> bytes:
        payload = bytearray(struct.pack(">QI", self.cluster_id,
                                        len(self.availables)))
        for item in self.availables:
            payload += item.marshal(self.version)
        if self.version == V2:
            with_rel = [a for a in self.availables
                        if a.memory_release_count > 0]
            if with_rel:
                payload += struct.pack(">I", len(with_rel))
                for a in with_rel:
                    payload += gid_marshal(*a.gid)
                    payload += struct.pack(">I", a.memory_release_count)
        return marshal_event(TYPE_CONGESTION_CONTROL, self.version,
                             bytes(payload))


def unmarshal_congestion_control(data: bytes) -> CongestionControl:
    _, version, payload = unmarshal_event(
        data, expected_type=TYPE_CONGESTION_CONTROL)
    off = 0
    cluster_id, n = struct.unpack_from(">QI", payload, off)
    off += 12
    availables = []
    for _ in range(n):
        gid = gid_unmarshal(payload[off:off + 16])
        off += 16
        (available,) = struct.unpack_from(">Q", payload, off)
        off += 8
        ratio = 0.0
        if version == V2:
            (ratio,) = struct.unpack_from(">d", payload, off)
            off += 8
        (d_count,) = struct.unpack_from(">I", payload, off)
        off += 4
        dispatchers = []
        for _ in range(d_count):
            d_gid = gid_unmarshal(payload[off:off + 16])
            off += 16
            (avail,) = struct.unpack_from(">Q", payload, off)
            off += 8
            dispatchers.append((d_gid, avail))
        availables.append(AvailableMemory(
            gid=gid, available=available, usage_ratio=ratio,
            dispatcher_available=dispatchers))
    if version == V2 and off < len(payload):
        (rel_n,) = struct.unpack_from(">I", payload, off)
        off += 4
        by_gid = {a.gid: a for a in availables}
        for _ in range(rel_n):
            gid = gid_unmarshal(payload[off:off + 16])
            off += 16
            (cnt,) = struct.unpack_from(">I", payload, off)
            off += 4
            if gid in by_gid:
                by_gid[gid].memory_release_count = cnt
    if off != len(payload):
        raise ValueError("trailing bytes in CongestionControl payload")
    return CongestionControl(cluster_id=cluster_id, availables=availables,
                             version=version)
