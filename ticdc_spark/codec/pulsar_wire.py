"""Pulsar binary protocol — byte codec for the produce/consume subset.

From the public spec (pulsar.apache.org "Developing a binary protocol
client") and the public PulsarApi.proto wire layout:

- simple frame:  [totalSize u32 BE][commandSize u32 BE][BaseCommand pb]
- payload frame: ... BaseCommand pb, then
                 [magic 0x0e01][crc32c u32 BE over the rest]
                 [metadataSize u32 BE][MessageMetadata pb][payload]
- protobuf wire format: varint tags (field<<3|wire), wire 0 = varint,
  2 = length-delimited (the only two PulsarApi uses here)

Commands implemented: CONNECT/CONNECTED, PRODUCER/PRODUCER_SUCCESS,
SEND/SEND_RECEIPT, SUBSCRIBE/SUCCESS, FLOW, MESSAGE, ACK, ERROR,
PING/PONG, CLOSE_PRODUCER. Field numbers follow PulsarApi.proto, where
BaseCommand sub-command field numbers equal their Type enum values.

Reference behavior reproduced: `pkg/sink/pulsar` drives the Go client
speaking these frames. All from the public spec; the protobuf codec here
is a purpose-built dict encoder, not a generated stub.
"""

from __future__ import annotations

import struct

from ticdc_spark.codec.kafka_wire import crc32c

# ---------------------------------------------------------------- protobuf


def _uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def pb_encode(fields: dict[int, object]) -> bytes:
    """{field_number: value} -> protobuf bytes. int -> varint; bytes/str/
    nested-dict -> length-delimited; list -> repeated."""
    out = bytearray()
    for num in sorted(fields):
        v = fields[num]
        if v is None:
            continue
        for item in v if isinstance(v, list) else [v]:
            if isinstance(item, bool):
                item = int(item)
            if isinstance(item, int):
                if item < 0:  # int32/int64 negatives ride as 64-bit varints
                    item &= (1 << 64) - 1
                out += _uvarint((num << 3) | 0)
                out += _uvarint(item)
            else:
                if isinstance(item, dict):
                    item = pb_encode(item)
                elif isinstance(item, str):
                    item = item.encode("utf-8")
                out += _uvarint((num << 3) | 2)
                out += _uvarint(len(item)) + item
    return bytes(out)


def pb_decode(buf: bytes) -> dict[int, list]:
    """protobuf bytes -> {field_number: [raw values]} (varints as int,
    length-delimited as bytes; caller interprets types/nesting)."""
    out: dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _read_uvarint(buf, pos)
        num, wire = tag >> 3, tag & 0x07
        if wire == 0:
            v, pos = _read_uvarint(buf, pos)
        elif wire == 2:
            n, pos = _read_uvarint(buf, pos)
            v = buf[pos : pos + n]
            pos += n
        elif wire == 5:
            v = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        elif wire == 1:
            v = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        else:
            raise ValueError(f"unsupported protobuf wire type {wire}")
        out.setdefault(num, []).append(v)
    return out


def pb_one(msg: dict[int, list], num: int, default=None):
    vs = msg.get(num)
    return vs[0] if vs else default


def pb_str(msg: dict[int, list], num: int, default: str | None = None):
    v = pb_one(msg, num)
    return v.decode("utf-8") if isinstance(v, bytes) else default


# ---------------------------------------------------------------- commands
# BaseCommand.Type values == sub-command field numbers (PulsarApi.proto)

CONNECT = 2
CONNECTED = 3
SUBSCRIBE = 4
PRODUCER = 5
SEND = 6
SEND_RECEIPT = 7
SEND_ERROR = 8
MESSAGE = 9
ACK = 10
FLOW = 11
SUCCESS = 13
ERROR = 14
CLOSE_PRODUCER = 15
CLOSE_CONSUMER = 16
PRODUCER_SUCCESS = 17
PING = 18
PONG = 19
GET_LAST_MESSAGE_ID = 29
GET_LAST_MESSAGE_ID_RESPONSE = 30

PROTOCOL_VERSION = 15


def base_command(cmd_type: int, body: dict | None = None) -> bytes:
    fields: dict[int, object] = {1: cmd_type}
    if body is not None:
        fields[cmd_type] = body
    return pb_encode(fields)


def parse_base_command(buf: bytes) -> tuple[int, dict[int, list]]:
    msg = pb_decode(buf)
    cmd_type = pb_one(msg, 1)
    sub = pb_one(msg, cmd_type)
    return cmd_type, pb_decode(sub) if isinstance(sub, bytes) else {}


# -- command builders (field numbers from PulsarApi.proto)


def cmd_connect(client_version: str = "ticdc-spark",
                auth_method_name: str | None = None,
                auth_data: bytes | None = None) -> bytes:
    fields: dict[int, object] = {1: client_version, 4: PROTOCOL_VERSION}
    if auth_method_name is not None:
        fields[5] = auth_method_name  # CommandConnect.auth_method_name
        fields[3] = auth_data or b""  # CommandConnect.auth_data
    return base_command(CONNECT, fields)


def cmd_connected(server_version: str = "ticdc-spark-mini") -> bytes:
    return base_command(CONNECTED, {1: server_version, 2: PROTOCOL_VERSION})


def cmd_producer(topic: str, producer_id: int, request_id: int) -> bytes:
    return base_command(PRODUCER, {1: topic, 2: producer_id, 3: request_id})


def cmd_producer_success(request_id: int, producer_name: str) -> bytes:
    return base_command(PRODUCER_SUCCESS, {1: request_id, 2: producer_name})


def cmd_send(producer_id: int, sequence_id: int) -> bytes:
    return base_command(SEND, {1: producer_id, 2: sequence_id})


def cmd_send_receipt(producer_id: int, sequence_id: int, ledger_id: int, entry_id: int) -> bytes:
    return base_command(
        SEND_RECEIPT, {1: producer_id, 2: sequence_id, 3: {1: ledger_id, 2: entry_id}}
    )


def cmd_subscribe(topic: str, subscription: str, consumer_id: int, request_id: int) -> bytes:
    # subType=3: 0 = Exclusive
    return base_command(
        SUBSCRIBE, {1: topic, 2: subscription, 3: 0, 4: consumer_id, 5: request_id}
    )


def cmd_success(request_id: int) -> bytes:
    return base_command(SUCCESS, {1: request_id})


def cmd_flow(consumer_id: int, permits: int) -> bytes:
    return base_command(FLOW, {1: consumer_id, 2: permits})


def cmd_message(consumer_id: int, ledger_id: int, entry_id: int) -> bytes:
    return base_command(MESSAGE, {1: consumer_id, 2: {1: ledger_id, 2: entry_id}})


def cmd_error(request_id: int, message: str) -> bytes:
    # error code 2 = UnknownError in ServerError enum
    return base_command(ERROR, {1: request_id, 2: 2, 3: message})


def cmd_get_last_message_id(consumer_id: int, request_id: int) -> bytes:
    return base_command(GET_LAST_MESSAGE_ID, {1: consumer_id, 2: request_id})


def cmd_get_last_message_id_response(request_id: int, ledger_id: int, entry_id: int) -> bytes:
    # entry_id -1 (as unsigned varint) means "topic empty", like a real broker
    return base_command(
        GET_LAST_MESSAGE_ID_RESPONSE, {1: {1: ledger_id, 2: entry_id}, 2: request_id}
    )


def cmd_ping() -> bytes:
    return base_command(PING, {})


def cmd_pong() -> bytes:
    return base_command(PONG, {})


# ---------------------------------------------------------------- metadata


def message_metadata(
    producer_name: str,
    sequence_id: int,
    publish_time: int,
    partition_key: str | None = None,
    properties: list[tuple[str, str]] | None = None,
) -> bytes:
    fields: dict[int, object] = {1: producer_name, 2: sequence_id, 3: publish_time}
    if properties:
        fields[4] = [{1: k, 2: v} for k, v in properties]
    if partition_key is not None:
        fields[6] = partition_key
    return pb_encode(fields)


def parse_message_metadata(buf: bytes) -> dict:
    msg = pb_decode(buf)
    props = []
    for kv in msg.get(4, []):
        kvd = pb_decode(kv)
        props.append((pb_str(kvd, 1), pb_str(kvd, 2)))
    return {
        "producer_name": pb_str(msg, 1),
        "sequence_id": pb_one(msg, 2),
        "publish_time": pb_one(msg, 3),
        "partition_key": pb_str(msg, 6),
        "properties": props,
        "num_messages_in_batch": pb_one(msg, 11),
    }


# -- batch messages: MessageMetadata.num_messages_in_batch = 11; the payload
# is then a sequence of [singleMetadataSize u32 BE][SingleMessageMetadata pb]
# [payload bytes], with SingleMessageMetadata carrying the per-message
# partition key (field 2) and required payload_size (field 3). The real
# client batches by default; a batch occupies ONE broker entry.


def batch_message_metadata(producer_name: str, sequence_id: int, publish_time: int, n: int) -> bytes:
    return pb_encode({1: producer_name, 2: sequence_id, 3: publish_time, 11: n})


def encode_batch_payload(items: list[tuple[bytes, str | None]]) -> bytes:
    out = bytearray()
    for payload, key in items:
        smd: dict[int, object] = {3: len(payload)}
        if key is not None:
            smd[2] = key
        smd_b = pb_encode(smd)
        out += struct.pack(">I", len(smd_b)) + smd_b + payload
    return bytes(out)


def parse_batch_payload(payload: bytes, n: int) -> list[tuple[bytes, str | None]]:
    out = []
    pos = 0
    for _ in range(n):
        (size,) = struct.unpack_from(">I", payload, pos)
        smd = pb_decode(payload[pos + 4 : pos + 4 + size])
        pos += 4 + size
        psize = pb_one(smd, 3, 0)
        out.append((payload[pos : pos + psize], pb_str(smd, 2)))
        pos += psize
    if pos != len(payload):
        raise ValueError("trailing bytes after batch payload")
    return out


# ---------------------------------------------------------------- framing

MAGIC = b"\x0e\x01"


def frame_simple(command: bytes) -> bytes:
    return struct.pack(">II", 4 + len(command), len(command)) + command


def frame_payload(command: bytes, metadata: bytes, payload: bytes) -> bytes:
    checked = struct.pack(">I", len(metadata)) + metadata + payload
    return frame_payload_precrc(command, crc32c(checked), checked)


def frame_payload_precrc(command: bytes, crc: int, checked: bytes) -> bytes:
    """Frame with a known-good CRC over ``checked`` = [mdSize][md][payload]
    — the CRC doesn't cover the command, so a broker can cache it at
    append time and re-frame per consumer without re-hashing."""
    body = (
        struct.pack(">I", len(command)) + command
        + MAGIC + struct.pack(">I", crc) + checked
    )
    return struct.pack(">I", len(body)) + body


def parse_frame(body: bytes) -> tuple[bytes, bytes | None, bytes | None]:
    """body = one frame minus the leading totalSize.
    -> (command, metadata|None, payload|None); verifies crc32c."""
    command, metadata, payload, _, _ = parse_frame_raw(body)
    return command, metadata, payload


def parse_frame_raw(
    body: bytes,
) -> tuple[bytes, bytes | None, bytes | None, int, bytes | None]:
    """Like parse_frame but also returns (crc, checked) so a broker can
    cache the verified section and re-frame without re-hashing."""
    (cmd_size,) = struct.unpack_from(">I", body, 0)
    command = body[4 : 4 + cmd_size]
    pos = 4 + cmd_size
    if pos == len(body):
        return command, None, None, 0, None
    if body[pos : pos + 2] != MAGIC:
        raise ValueError("bad payload magic")
    (crc,) = struct.unpack_from(">I", body, pos + 2)
    checked = body[pos + 6 :]
    actual = crc32c(checked)
    if crc != actual:
        raise ValueError(f"pulsar frame crc mismatch: {crc:#x} != {actual:#x}")
    (md_size,) = struct.unpack_from(">I", checked, 0)
    metadata = checked[4 : 4 + md_size]
    payload = checked[4 + md_size :]
    return command, metadata, payload, crc, checked
