"""Internal event wire header — the unified serialization envelope
every inter-node event carries (`docs/design/2025-11-09-ticdc-event-
encoding-architecture.md`, `pkg/common/event` MarshalEventWithHeader /
ValidateAndExtractPayload).

16-byte header, all big-endian:
``MAGIC(4)=0xDA7A6A6A | TYPE(2) | VERSION(2) | PAYLOAD_LEN(8)``
followed by the payload.  The messaging fabric itself is scoped out
(Spark's driver/shuffle replaces it), but the envelope is the on-wire
artifact a mixed deployment would exchange, so it is implemented
byte-for-byte.
"""

from __future__ import annotations

import struct

EVENT_MAGIC = b"\xda\x7a\x6a\x6a"
HEADER_SIZE = 16

# Type ids per the design doc's event-type table.
TYPE_DML_EVENT = 0
TYPE_BATCH_DML_EVENT = 1
TYPE_DDL_EVENT = 2
TYPE_RESOLVED_EVENT = 3
TYPE_BATCH_RESOLVED_EVENT = 4
TYPE_SYNC_POINT_EVENT = 5
TYPE_READY_EVENT = 6
TYPE_HANDSHAKE_EVENT = 7
TYPE_NOT_REUSABLE_EVENT = 8
TYPE_DROP_EVENT = 9
TYPE_CONGESTION_CONTROL = 10
TYPE_DISPATCHER_HEARTBEAT = 11
TYPE_DISPATCHER_HEARTBEAT_RESPONSE = 12

TYPE_NAMES = {
    TYPE_DML_EVENT: "DMLEvent",
    TYPE_BATCH_DML_EVENT: "BatchDMLEvent",
    TYPE_DDL_EVENT: "DDLEvent",
    TYPE_RESOLVED_EVENT: "ResolvedEvent",
    TYPE_BATCH_RESOLVED_EVENT: "BatchResolvedEvent",
    TYPE_SYNC_POINT_EVENT: "SyncPointEvent",
    TYPE_READY_EVENT: "ReadyEvent",
    TYPE_HANDSHAKE_EVENT: "HandshakeEvent",
    TYPE_NOT_REUSABLE_EVENT: "NotReusableEvent",
    TYPE_DROP_EVENT: "DropEvent",
    TYPE_CONGESTION_CONTROL: "CongestionControl",
    TYPE_DISPATCHER_HEARTBEAT: "DispatcherHeartbeat",
    TYPE_DISPATCHER_HEARTBEAT_RESPONSE: "DispatcherHeartbeatResponse",
}


def marshal_event(event_type: int, version: int, payload: bytes) -> bytes:
    """MarshalEventWithHeader: header + payload."""
    if not 0 <= event_type <= 0xFFFF:
        raise ValueError("event type out of uint16 range")
    if not 0 <= version <= 0xFFFF:
        raise ValueError("version out of uint16 range")
    return (EVENT_MAGIC
            + struct.pack(">HHQ", event_type, version, len(payload))
            + payload)


def unmarshal_event(data: bytes,
                    expected_type: int | None = None
                    ) -> tuple[int, int, bytes]:
    """ValidateAndExtractPayload: (type, version, payload); validates
    magic, completeness, and optionally the expected type."""
    if len(data) < HEADER_SIZE:
        raise ValueError("data shorter than event header")
    if data[:4] != EVENT_MAGIC:
        raise ValueError("bad event magic")
    event_type, version, n = struct.unpack(">HHQ", data[4:HEADER_SIZE])
    if expected_type is not None and event_type != expected_type:
        raise ValueError(
            f"expected event type {expected_type} "
            f"({TYPE_NAMES.get(expected_type, '?')}), got {event_type}")
    payload = data[HEADER_SIZE:]
    if len(payload) != n:
        raise ValueError(
            f"payload length mismatch: header says {n}, have {len(payload)}")
    return event_type, version, payload
