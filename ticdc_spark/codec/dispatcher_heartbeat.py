"""DispatcherHeartbeat / response wire codec
(`pkg/common/event/dispatcher_heartbeat.go`).

Dispatchers report per-dispatcher checkpoint progress upstream; the
event service answers with per-dispatcher states (normal/removed —
the removed signal is how a dispatcher learns its subscription died).
Layouts (BE numerics, LE 16-byte GIDs):

- heartbeat v1 payload: ``cluster_id u64 | count u32 |
  {gid(16) | checkpoint_ts u64}*`` (legacy progress, `:188-204`);
- heartbeat v2 progress entries carry ``version byte`` + ``epoch u64``
  (`:75-83`, epoch dedups replays after dispatcher re-creation);
- response v1: ``cluster_id u64 | count u32 | {gid(16) | state u8}*``
  (`:389-399`), states normal=0 / removed=1 (`:250-255`).
- type ids 11/12 on the unified event header.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from ticdc_spark.codec.congestion_control import gid_marshal, gid_unmarshal
from ticdc_spark.codec.event_header import (
    TYPE_DISPATCHER_HEARTBEAT,
    TYPE_DISPATCHER_HEARTBEAT_RESPONSE,
    marshal_event,
    unmarshal_event,
)

HEARTBEAT_V1 = 1
HEARTBEAT_V2 = 2
DS_STATE_NORMAL = 0
DS_STATE_REMOVED = 1


@dataclass
class DispatcherProgress:
    dispatcher_id: tuple[int, int]
    checkpoint_ts: int
    epoch: int = 0


@dataclass
class DispatcherHeartbeat:
    cluster_id: int
    progresses: list
    version: int = HEARTBEAT_V2

    def marshal(self) -> bytes:
        payload = bytearray(struct.pack(">QI", self.cluster_id,
                                        len(self.progresses)))
        for p in self.progresses:
            if self.version == HEARTBEAT_V1:
                payload += gid_marshal(*p.dispatcher_id)
                payload += struct.pack(">Q", p.checkpoint_ts)
            else:
                payload += bytes([1])  # DispatcherProgressVersion1
                payload += gid_marshal(*p.dispatcher_id)
                payload += struct.pack(">QQ", p.checkpoint_ts, p.epoch)
        return marshal_event(TYPE_DISPATCHER_HEARTBEAT, self.version,
                             bytes(payload))


def unmarshal_heartbeat(data: bytes) -> DispatcherHeartbeat:
    _, version, payload = unmarshal_event(
        data, expected_type=TYPE_DISPATCHER_HEARTBEAT)
    cluster_id, n = struct.unpack_from(">QI", payload, 0)
    off = 12
    out = []
    for _ in range(n):
        if version == HEARTBEAT_V1:
            gid = gid_unmarshal(payload[off:off + 16])
            off += 16
            (ckpt,) = struct.unpack_from(">Q", payload, off)
            off += 8
            out.append(DispatcherProgress(gid, ckpt))
        else:
            pv = payload[off]
            off += 1
            if pv != 1:
                raise ValueError(f"unsupported DispatcherProgress version {pv}")
            gid = gid_unmarshal(payload[off:off + 16])
            off += 16
            ckpt, epoch = struct.unpack_from(">QQ", payload, off)
            off += 16
            out.append(DispatcherProgress(gid, ckpt, epoch))
    if off != len(payload):
        raise ValueError("trailing bytes in heartbeat payload")
    return DispatcherHeartbeat(cluster_id, out, version)


@dataclass
class DispatcherHeartbeatResponse:
    cluster_id: int
    states: list = field(default_factory=list)  # [(gid, state_byte)]
    version: int = 1

    def marshal(self) -> bytes:
        payload = bytearray(struct.pack(">QI", self.cluster_id,
                                        len(self.states)))
        for gid, state in self.states:
            payload += gid_marshal(*gid)
            payload += bytes([state])
        return marshal_event(TYPE_DISPATCHER_HEARTBEAT_RESPONSE,
                             self.version, bytes(payload))


def unmarshal_heartbeat_response(data: bytes) -> DispatcherHeartbeatResponse:
    _, version, payload = unmarshal_event(
        data, expected_type=TYPE_DISPATCHER_HEARTBEAT_RESPONSE)
    cluster_id, n = struct.unpack_from(">QI", payload, 0)
    off = 12
    states = []
    for _ in range(n):
        gid = gid_unmarshal(payload[off:off + 16])
        off += 16
        states.append((gid, payload[off]))
        off += 1
    if off != len(payload):
        raise ValueError("trailing bytes in heartbeat response payload")
    return DispatcherHeartbeatResponse(cluster_id, states, version)
