"""Redo-log v2 wire format — MessagePack-encoded ``RedoLog`` records
with the reference's version prefix and the etcd-WAL-style frame
envelope, interoperable with `pkg/redo`:

- record  = ``0xffff | version u16 BE (=2) | msgp(RedoLog)``
  (`pkg/redo/codec/codec.go:36-86` — the 0xffff prefix distinguishes
  v2+ from the legacy v1 stream)
- file    = sequence of frames: ``lenField u64 LE | record | pad``,
  where pad aligns the record to 8 bytes and the pad count rides in
  the length's top byte as ``0x80|padBytes``
  (`pkg/redo/writer/writer.go:77-85`, `writer/file/file.go:249-259`)
- msgp layout exactly as the generated encoders
  (`pkg/common/event/redo_gen.go`): RedoLog is a 3-map
  ``{row, ddl, type}``; the DML arm nests DMLEventInRedoLog
  (map: start-ts, commit-ts, table, columns, pre-columns,
  index-columns) plus per-side ``RedoColumnValue`` lists
  ``{column, value-is-empty-bytes, flag}``.

The writer emits minimal msgpack encodings; the reader is lenient
(accepts any valid family for a type), which is also how tinylib's
generated readers behave — so files interoperate in both directions
even where two writers pick different (valid) integer widths.
"""

from __future__ import annotations

import struct
from typing import Any

VERSION_PREFIX = b"\xff\xff"
LATEST_VERSION = 2

# ---------------------------------------------------------------------------
# minimal msgpack primitives
# ---------------------------------------------------------------------------


def mp_nil() -> bytes:
    return b"\xc0"


def mp_bool(v: bool) -> bytes:
    return b"\xc3" if v else b"\xc2"


def mp_int(i: int) -> bytes:
    """tinylib WriteInt64: fixint for [-32, 127], then the smallest
    SIGNED family."""
    if 0 <= i <= 0x7F:
        return bytes([i])
    if -32 <= i < 0:
        return struct.pack("b", i)
    if -0x80 <= i <= 0x7F:
        return b"\xd0" + struct.pack("b", i)
    if -0x8000 <= i <= 0x7FFF:
        return b"\xd1" + struct.pack(">h", i)
    if -0x8000_0000 <= i <= 0x7FFF_FFFF:
        return b"\xd2" + struct.pack(">i", i)
    return b"\xd3" + struct.pack(">q", i)


def mp_uint(i: int) -> bytes:
    """tinylib WriteUint64: fixint then the smallest UNSIGNED family."""
    if i <= 0x7F:
        return bytes([i])
    if i <= 0xFF:
        return b"\xcc" + bytes([i])
    if i <= 0xFFFF:
        return b"\xcd" + struct.pack(">H", i)
    if i <= 0xFFFF_FFFF:
        return b"\xce" + struct.pack(">I", i)
    return b"\xcf" + struct.pack(">Q", i)


def mp_float(f: float) -> bytes:
    return b"\xcb" + struct.pack(">d", f)


def mp_str(s: str) -> bytes:
    b = s.encode("utf-8")
    n = len(b)
    if n <= 31:
        return bytes([0xA0 | n]) + b
    if n <= 0xFF:
        return b"\xd9" + bytes([n]) + b
    if n <= 0xFFFF:
        return b"\xda" + struct.pack(">H", n) + b
    return b"\xdb" + struct.pack(">I", n) + b


def mp_bin(b: bytes) -> bytes:
    n = len(b)
    if n <= 0xFF:
        return b"\xc4" + bytes([n]) + b
    if n <= 0xFFFF:
        return b"\xc5" + struct.pack(">H", n) + b
    return b"\xc6" + struct.pack(">I", n) + b


def mp_array_header(n: int) -> bytes:
    if n <= 15:
        return bytes([0x90 | n])
    if n <= 0xFFFF:
        return b"\xdc" + struct.pack(">H", n)
    return b"\xdd" + struct.pack(">I", n)


def mp_map_header(n: int) -> bytes:
    if n <= 15:
        return bytes([0x80 | n])
    if n <= 0xFFFF:
        return b"\xde" + struct.pack(">H", n)
    return b"\xdf" + struct.pack(">I", n)


def mp_any(v: Any) -> bytes:
    """WriteIntf for the ``any``-typed column values."""
    if v is None:
        return mp_nil()
    if isinstance(v, bool):
        return mp_bool(v)
    if isinstance(v, int):
        return mp_int(v)
    if isinstance(v, float):
        return mp_float(v)
    if isinstance(v, str):
        return mp_str(v)
    if isinstance(v, (bytes, bytearray)):
        return mp_bin(bytes(v))
    raise TypeError(f"unsupported msgpack value type: {type(v)}")


class _Reader:
    """Lenient msgpack reader (any valid family accepted per type)."""

    def __init__(self, b: bytes, pos: int = 0) -> None:
        self.b = b
        self.pos = pos

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.b):
            raise ValueError("msgpack: short buffer")
        out = self.b[self.pos:self.pos + n]
        self.pos += n
        return out

    def read(self) -> Any:
        # hot paths (fixint / fixstr / fixmap / nil / common families)
        # inlined with local aliases — the per-token call overhead
        # dominates WAL decode otherwise
        b = self.b
        pos = self.pos
        if pos >= len(b):
            raise ValueError("msgpack: short buffer")
        t = b[pos]
        pos += 1
        if t <= 0x7F:
            self.pos = pos
            return t
        if 0xA0 <= t <= 0xBF:
            n = t & 0x1F
            end = pos + n
            if end > len(b):
                raise ValueError("msgpack: short buffer")
            self.pos = end
            return b[pos:end].decode("utf-8")
        if 0x80 <= t <= 0x8F:
            self.pos = pos
            return self._map(t & 0x0F)
        if 0x90 <= t <= 0x9F:
            self.pos = pos
            return self._array(t & 0x0F)
        if t == 0xC0:
            self.pos = pos
            return None
        if t >= 0xE0:
            self.pos = pos
            return t - 0x100
        if t == 0xC2 or t == 0xC3:
            self.pos = pos
            return t == 0xC3
        self.pos = pos
        if t in (0xC4, 0xC5, 0xC6):
            n = int.from_bytes(
                self._take(1 << (t - 0xC4)), "big")
            return self._take(n)
        if t == 0xCA:
            return struct.unpack(">f", self._take(4))[0]
        if t == 0xCB:
            return struct.unpack(">d", self._take(8))[0]
        if t in (0xCC, 0xCD, 0xCE, 0xCF):
            return int.from_bytes(self._take(1 << (t - 0xCC)), "big")
        if t in (0xD0, 0xD1, 0xD2, 0xD3):
            n = 1 << (t - 0xD0)
            return int.from_bytes(self._take(n), "big", signed=True)
        if t in (0xD9, 0xDA, 0xDB):
            n = int.from_bytes(self._take(1 << (t - 0xD9)), "big")
            return self._take(n).decode("utf-8")
        if t == 0xDC:
            return self._array(int.from_bytes(self._take(2), "big"))
        if t == 0xDD:
            return self._array(int.from_bytes(self._take(4), "big"))
        if t == 0xDE:
            return self._map(int.from_bytes(self._take(2), "big"))
        if t == 0xDF:
            return self._map(int.from_bytes(self._take(4), "big"))
        raise ValueError(f"msgpack: unsupported type byte 0x{t:02x}")

    def _array(self, n: int) -> list:
        return [self.read() for _ in range(n)]

    def _map(self, n: int) -> dict:
        out = {}
        for _ in range(n):
            k = self.read()
            out[k] = self.read()
        return out


# ---------------------------------------------------------------------------
# RedoLog marshal (field order mirrors redo_gen.go exactly)
# ---------------------------------------------------------------------------


# hot-path key constants (the generated Go encoders append these same
# literal byte runs — e.g. 0xa3'row'); hoisting them out of the per-row
# marshal loop is a ~3x throughput win on the WAL encode path
_K_DB = mp_str("db-name")
_K_TBL = mp_str("tbl-name")
_K_TID = mp_str("tbl-id")
_K_ISP = mp_str("is-partition")
_K_COLUMN = mp_str("column")
_K_VIEB = mp_str("value-is-empty-bytes")
_K_FLAG = mp_str("flag")
_K_STS = mp_str("start-ts")
_K_CTS = mp_str("commit-ts")
_K_TABLE = mp_str("table")
_K_COLS = mp_str("columns")
_K_PRE = mp_str("pre-columns")
_K_IDX = mp_str("index-columns")
_K_ROW = mp_str("row")
_K_DDL = mp_str("ddl")
_K_TYPE = mp_str("type")
_HDR3 = mp_map_header(3)
_HDR6 = mp_map_header(6)


def _table_name(t: dict | None) -> bytes:
    if t is None:
        return mp_nil()
    return (mp_map_header(4)
            + _K_DB + mp_str(t.get("schema", ""))
            + _K_TBL + mp_str(t.get("table", ""))
            + _K_TID + mp_int(int(t.get("table_id", 0)))
            + _K_ISP + mp_bool(bool(t.get("is_partition"))))


def _col_values(vals: list[dict] | None) -> bytes:
    if vals is None:
        return mp_nil()
    out = [mp_array_header(len(vals))]
    for v in vals:
        out.append(_HDR3 + _K_COLUMN + mp_any(v.get("value"))
                   + _K_VIEB
                   + mp_bool(bool(v.get("value_is_empty_bytes")))
                   + _K_FLAG + mp_uint(int(v.get("flag", 0))))
    return b"".join(out)


def marshal_redo_dml(row: dict) -> bytes:
    """``row`` keys: start_ts, commit_ts, table {schema, table,
    table_id, is_partition}, columns / pre_columns (lists of
    {value, flag, value_is_empty_bytes} or None)."""
    dml_inner = (
        _HDR6
        + _K_STS + mp_uint(int(row["start_ts"]))
        + _K_CTS + mp_uint(int(row["commit_ts"]))
        + _K_TABLE + _table_name(row.get("table"))
        # DMLEventInRedoLog.Columns/PreColumns ([]*RedoColumn metadata)
        # are nil on the DML write path (`redo.go:135-205` fills only
        # the value lists); index-columns likewise may be nil
        + _K_COLS + b"\xc0" + _K_PRE + b"\xc0" + _K_IDX + b"\xc0"
    )
    redo_row = (
        _HDR3
        + _K_ROW + dml_inner
        + _K_COLS + _col_values(row.get("columns"))
        + _K_PRE + _col_values(row.get("pre_columns"))
    )
    body = (
        _HDR3
        + _K_ROW + redo_row
        + _K_DDL + b"\xc0"
        + _K_TYPE + b"\x01"       # RedoLogTypeRow
    )
    return VERSION_PREFIX + struct.pack(">H", LATEST_VERSION) + body


def unmarshal_redo_log(b: bytes) -> dict:
    if len(b) < 4 or b[:2] != VERSION_PREFIX:
        raise ValueError("redo v2 record must start with 0xffff")
    (version,) = struct.unpack(">H", b[2:4])
    if version != LATEST_VERSION:
        raise ValueError(f"unsupported redo codec version: {version}")
    r = _Reader(b, 4)
    doc = r.read()
    if r.pos != len(b):
        raise ValueError(f"trailing bytes in redo record: {len(b) - r.pos}")
    return doc


# ---------------------------------------------------------------------------
# file framing
# ---------------------------------------------------------------------------


def encode_frame_size(n: int) -> tuple[int, int]:
    pad = (8 - (n % 8)) % 8
    len_field = n
    if pad:
        len_field |= (0x80 | pad) << 56
    return len_field, pad


def frame_records(records: list[bytes]) -> bytes:
    out = bytearray()
    for rec in records:
        len_field, pad = encode_frame_size(len(rec))
        out += struct.pack("<Q", len_field)
        out += rec
        out += b"\x00" * pad
    return bytes(out)


def unframe_records(data: bytes) -> list[bytes]:
    out = []
    off = 0
    n = len(data)
    while off < n:
        if off + 8 > n:
            raise ValueError(f"incomplete frame length at offset {off}")
        (len_field,) = struct.unpack_from("<Q", data, off)
        off += 8
        # reference decodeFrameSize (`reader/file.go:372-379`): record
        # size masks ALL top 8 bits; pad is the low 3 of the top byte
        # when the sign bit is set
        size = len_field & ~(0xFF << 56)
        pad = (len_field >> 56) & 0x7 if (len_field >> 63) else 0
        if off + size + pad > n:
            raise ValueError(f"incomplete frame at offset {off}")
        out.append(data[off:off + size])
        off += size + pad
    return out


# ---------------------------------------------------------------------------
# DDL arm (`redo_gen.go:1711-1746` RedoDDLEvent, redo.go:75-105
# DDLEventInRedoLog / ColumnInfo; interface.go:146-188 InfluencedTables
# / SchemaTableName / Table msg tags)
# ---------------------------------------------------------------------------


def _influenced_tables(it: dict | None) -> bytes:
    if it is None:
        return mp_nil()
    tids = it.get("table_ids")
    body = mp_map_header(3) + mp_str("influence-type") + mp_int(
        int(it.get("influence_type", 0)))
    body += mp_str("tables")
    if tids is None:
        body += mp_nil()
    else:
        body += mp_array_header(len(tids))
        for t in tids:
            body += mp_int(int(t))
    body += mp_str("schema") + mp_int(int(it.get("schema_id", 0)))
    return body


def marshal_redo_ddl(ddl: dict) -> bytes:
    """``ddl`` keys: start_ts, commit_ts, query, action_type (byte),
    table {schema, table, table_id, is_partition}, and optionally
    columns [{name, origin_default, type, version}], blocked_tables
    {influence_type, table_ids, schema_id}, blocked_table_names
    [{schema, table}], need_dropped_tables, need_added_tables
    [table_id]."""
    cols = ddl.get("columns")
    if cols is None:
        cols_b = mp_nil()
    else:
        cols_b = mp_array_header(len(cols))
        for c in cols:
            cols_b += (mp_map_header(4)
                       + mp_str("name") + mp_str(c["name"])
                       + mp_str("origin_default")
                       + mp_any(c.get("origin_default"))
                       + mp_str("type") + mp_uint(int(c.get("type", 0)))
                       + mp_str("version") + mp_uint(int(c.get("version", 0))))
    btn = ddl.get("blocked_table_names")
    if btn is None:
        btn_b = mp_nil()
    else:
        btn_b = mp_array_header(len(btn))
        for t in btn:
            btn_b += (mp_map_header(2)
                      + mp_str("schema-name") + mp_str(t["schema"])
                      + mp_str("table-name") + mp_str(t["table"]))
    nat = ddl.get("need_added_tables")
    if nat is None:
        nat_b = mp_nil()
    else:
        nat_b = mp_array_header(len(nat))
        for tid in nat:
            nat_b += mp_map_header(1) + mp_str("table") + mp_int(int(tid))
    inner = (
        mp_map_header(8)
        + mp_str("start-ts") + mp_uint(int(ddl["start_ts"]))
        + mp_str("commit-ts") + mp_uint(int(ddl["commit_ts"]))
        + mp_str("query") + mp_str(ddl.get("query", ""))
        + mp_str("columns") + cols_b
        + mp_str("blocked-tables")
        + _influenced_tables(ddl.get("blocked_tables"))
        + mp_str("blocked-table-names") + btn_b
        + mp_str("need-dropped-tables")
        + _influenced_tables(ddl.get("need_dropped_tables"))
        + mp_str("need_added_tables") + nat_b   # underscore tag, sic
    )
    redo_ddl = (
        mp_map_header(4)
        + mp_str("ddl") + inner
        + mp_str("type") + mp_uint(int(ddl.get("action_type", 0)))
        + mp_str("table-name")
        + _table_name(ddl.get("table") or {})
        + mp_str("table-schema-store") + mp_nil()
    )
    body = (
        mp_map_header(3)
        + mp_str("row") + mp_nil()
        + mp_str("ddl") + redo_ddl
        + mp_str("type") + mp_int(2)       # RedoLogTypeDDL
    )
    return VERSION_PREFIX + struct.pack(">H", LATEST_VERSION) + body
