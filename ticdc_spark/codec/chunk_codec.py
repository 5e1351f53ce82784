"""TiDB chunk codec — the columnar payload format DML wire frames carry.

The reference ships full row data between nodes by appending a
chunk-codec buffer after the per-event metadata frames
(`pkg/common/event/dml_event.go:241-273` encode, `:299-320` decode via
``chunk.NewCodec(tableInfo.GetFieldSlice())``).  The codec itself is
TiDB's ``pkg/util/chunk/codec.go`` (public Apache-2.0 source); this
module re-implements that byte layout in pure Python so a
BatchDMLEvent frame produced here carries the mounted rows, not just
the envelope.

Per-column layout (all integers little-endian, matching codec.go
``encodeColumn``/``decodeColumn``):

``length u32 | nullCount u32 | [nullBitmap ceil(length/8) bytes if
nullCount>0] | [offsets i64 x (length+1) if var-elem] | data``

- nullBitmap: bit i (LSB-first within each byte) is 1 when row i is
  NOT null (column.go's ``appendNullBitmap``).  When nullCount==0 the
  bitmap is omitted and the decoder treats every row as not-null.
- Fixed element widths (column.go ``getFixedLen``): float 4; tiny/
  short/int24/long/longlong/double/year/duration 8; date/datetime/
  timestamp 8 (``types.Time`` wraps a single packed uint64 core time);
  NEWDECIMAL 40 (``types.MyDecimalStructSize`` — the in-memory
  MyDecimal struct); everything else var-length with an offsets table
  whose entry i+1 is the END of value i (data region relative).
- Fixed-width NULL rows still occupy a zero-filled slot; var-length
  NULL rows occupy nothing (offsets repeat).

Value encodings inside ``data``:

- integer family: int64/uint64 LE (the chunk always widens to 8).
- float: float32 LE; double: float64 LE.
- date/datetime/timestamp: packed core-time uint64 LE
  (``codec/rowcodec.py pack_datetime``).
- duration: int64 nanoseconds LE.
- NEWDECIMAL: the 40-byte MyDecimal struct image — ``digitsInt u8 |
  digitsFrac u8 | resultFrac u8 | negative u8 | wordBuf int32 x 9 LE``
  with base-10^9 word groups, integer part right-aligned into leading
  words, fraction left-aligned and right-zero-padded.  Values are
  canonicalized (leading integer zeros stripped) before encoding;
  round-trip is exact on the canonical form.
- enum/set: ``appendNameValue`` — value u64 LE + name bytes.
- json: TiDB binary JSON (``codec/binary_json.py``): type-code byte +
  value bytes.
- strings/blobs/bit: raw bytes.
"""

from __future__ import annotations

import struct

# MySQL protocol column type ids (public wire protocol constants).
TYPE_TINY = 1
TYPE_SHORT = 2
TYPE_LONG = 3
TYPE_FLOAT = 4
TYPE_DOUBLE = 5
TYPE_NULL = 6
TYPE_TIMESTAMP = 7
TYPE_LONGLONG = 8
TYPE_INT24 = 9
TYPE_DATE = 10
TYPE_DURATION = 11
TYPE_DATETIME = 12
TYPE_YEAR = 13
TYPE_VARCHAR = 15
TYPE_BIT = 16
TYPE_JSON = 0xF5
TYPE_NEWDECIMAL = 0xF6
TYPE_ENUM = 0xF7
TYPE_SET = 0xF8
TYPE_TINYBLOB = 0xF9
TYPE_MEDIUMBLOB = 0xFA
TYPE_LONGBLOB = 0xFB
TYPE_BLOB = 0xFC
TYPE_VARSTRING = 0xFD
TYPE_STRING = 0xFE

_INT8_TYPES = frozenset({TYPE_TINY, TYPE_SHORT, TYPE_INT24, TYPE_LONG,
                         TYPE_LONGLONG, TYPE_YEAR})
_TIME_TYPES = frozenset({TYPE_DATE, TYPE_DATETIME, TYPE_TIMESTAMP})
VAR_ELEM_LEN = -1
MYDECIMAL_STRUCT_SIZE = 40
_WORD_BUF_LEN = 9
_DIGITS_PER_WORD = 9
_WORD_BASE = 10 ** 9


def fixed_len(tp: int) -> int:
    """column.go getFixedLen: bytes per element, or -1 for var-length."""
    if tp == TYPE_FLOAT:
        return 4
    if tp in _INT8_TYPES or tp in (TYPE_DOUBLE, TYPE_DURATION):
        return 8
    if tp in _TIME_TYPES:
        return 8  # types.Time{coreTime uint64}
    if tp == TYPE_NEWDECIMAL:
        return MYDECIMAL_STRUCT_SIZE
    return VAR_ELEM_LEN


# -- MyDecimal struct image --------------------------------------------------


def mydecimal_struct(text: str) -> bytes:
    """Canonical 40-byte MyDecimal in-memory image for a decimal string."""
    s = text.strip()
    neg = s.startswith("-")
    s = s.lstrip("+-")
    int_part, _, frac_part = s.partition(".")
    int_part = int_part.lstrip("0")
    digits_int = len(int_part)
    digits_frac = len(frac_part)
    words_int = (digits_int + _DIGITS_PER_WORD - 1) // _DIGITS_PER_WORD
    words_frac = (digits_frac + _DIGITS_PER_WORD - 1) // _DIGITS_PER_WORD
    if words_int + words_frac > _WORD_BUF_LEN:
        raise ValueError(f"decimal too wide for MyDecimal: {text!r}")
    words = []
    # integer words, right-aligned: leading word is the partial group
    rem = int_part
    lead = len(rem) % _DIGITS_PER_WORD or (_DIGITS_PER_WORD if rem else 0)
    if rem:
        words.append(int(rem[:lead]))
        rem = rem[lead:]
        while rem:
            words.append(int(rem[:_DIGITS_PER_WORD]))
            rem = rem[_DIGITS_PER_WORD:]
    # fraction words, left-aligned, right-zero-padded
    rem = frac_part
    while rem:
        words.append(int(rem[:_DIGITS_PER_WORD].ljust(_DIGITS_PER_WORD,
                                                      "0")))
        rem = rem[_DIGITS_PER_WORD:]
    words += [0] * (_WORD_BUF_LEN - len(words))
    return struct.pack("<BBBB", digits_int, digits_frac, digits_frac,
                       1 if neg else 0) + struct.pack("<9i", *words)


def mydecimal_from_struct(b: bytes) -> str:
    """Decode the 40-byte MyDecimal image back to its canonical string."""
    if len(b) != MYDECIMAL_STRUCT_SIZE:
        raise ValueError("MyDecimal struct must be 40 bytes")
    digits_int, digits_frac, _result_frac, neg = struct.unpack("<BBBB",
                                                               b[:4])
    words = struct.unpack("<9i", b[4:])
    words_int = (digits_int + _DIGITS_PER_WORD - 1) // _DIGITS_PER_WORD
    words_frac = (digits_frac + _DIGITS_PER_WORD - 1) // _DIGITS_PER_WORD
    # leading word is the partial group (unpadded); the rest are 9 wide
    parts = [str(words[0])] if words_int else []
    parts += [str(words[i]).zfill(_DIGITS_PER_WORD)
              for i in range(1, words_int)]
    int_digits = "".join(parts)
    frac_digits = "".join(
        str(words[words_int + i]).zfill(_DIGITS_PER_WORD)
        for i in range(words_frac))[:digits_frac]
    out = int_digits or "0"
    if digits_frac:
        out += "." + frac_digits
    return ("-" if neg else "") + out


# -- per-type element encode/decode ------------------------------------------


def _encode_elem(tp: int, v, unsigned: bool) -> bytes:
    if tp in _INT8_TYPES:
        return struct.pack("<Q" if unsigned else "<q", int(v))
    if tp == TYPE_DOUBLE:
        return struct.pack("<d", float(v))
    if tp == TYPE_FLOAT:
        return struct.pack("<f", float(v))
    if tp in _TIME_TYPES:
        return struct.pack("<Q", int(v))  # packed core time
    if tp == TYPE_DURATION:
        return struct.pack("<q", int(v))  # nanoseconds
    if tp == TYPE_NEWDECIMAL:
        return mydecimal_struct(v) if isinstance(v, str) else bytes(v)
    if tp in (TYPE_ENUM, TYPE_SET):
        val, name = v
        return struct.pack("<Q", val) + name.encode("utf-8")
    if tp == TYPE_JSON:
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)
        from ticdc_spark.codec.binary_json import json_to_binary
        return json_to_binary(v)
    if isinstance(v, str):
        return v.encode("utf-8")
    return bytes(v)


def _decode_elem(tp: int, b: bytes, unsigned: bool):
    if tp in _INT8_TYPES:
        return struct.unpack("<Q" if unsigned else "<q", b)[0]
    if tp == TYPE_DOUBLE:
        return struct.unpack("<d", b)[0]
    if tp == TYPE_FLOAT:
        return struct.unpack("<f", b)[0]
    if tp in _TIME_TYPES:
        return struct.unpack("<Q", b)[0]
    if tp == TYPE_DURATION:
        return struct.unpack("<q", b)[0]
    if tp == TYPE_NEWDECIMAL:
        return mydecimal_from_struct(b)
    if tp in (TYPE_ENUM, TYPE_SET):
        return (struct.unpack("<Q", b[:8])[0], b[8:].decode("utf-8"))
    return bytes(b)


class ChunkCodec:
    """codec.go Codec: Encode/Decode a chunk for a fixed field slice."""

    def __init__(self, field_types: list[int],
                 unsigned: list[bool] | None = None):
        self.field_types = list(field_types)
        self.unsigned = list(unsigned) if unsigned else \
            [False] * len(field_types)
        if len(self.unsigned) != len(self.field_types):
            raise ValueError("unsigned flags must match field types")

    # columns: list (per field) of lists of values (None = NULL)
    def encode(self, columns: list[list]) -> bytes:
        if len(columns) != len(self.field_types):
            raise ValueError("column count mismatch")
        n = len(columns[0]) if columns else 0
        out = bytearray()
        for tp, uns, col in zip(self.field_types, self.unsigned, columns):
            if len(col) != n:
                raise ValueError("ragged columns")
            elem = fixed_len(tp)
            null_count = sum(1 for v in col if v is None)
            out += struct.pack("<II", n, null_count)
            if null_count > 0:
                bitmap = bytearray((n + 7) // 8)
                for i, v in enumerate(col):
                    if v is not None:
                        bitmap[i >> 3] |= 1 << (i & 7)
                out += bitmap
            if elem == VAR_ELEM_LEN:
                data = bytearray()
                offsets = [0]
                for v in col:
                    if v is not None:
                        data += _encode_elem(tp, v, uns)
                    offsets.append(len(data))
                out += struct.pack(f"<{n + 1}q", *offsets)
                out += data
            else:
                zero = b"\x00" * elem
                for v in col:
                    out += zero if v is None else _encode_elem(tp, v, uns)
        return bytes(out)

    def decode(self, data: bytes) -> tuple[list[list], bytes]:
        """Returns (columns, remaining bytes past the chunk)."""
        pos = 0
        columns: list[list] = []
        for tp, uns in zip(self.field_types, self.unsigned):
            if pos + 8 > len(data):
                raise ValueError("chunk buffer truncated at column header")
            n, null_count = struct.unpack_from("<II", data, pos)
            pos += 8
            if null_count > 0:
                nb = (n + 7) // 8
                bitmap = data[pos:pos + nb]
                if len(bitmap) != nb:
                    raise ValueError("chunk null bitmap truncated")
                pos += nb
                not_null = [bool(bitmap[i >> 3] >> (i & 7) & 1)
                            for i in range(n)]
            else:
                not_null = [True] * n
            elem = fixed_len(tp)
            col: list = []
            if elem == VAR_ELEM_LEN:
                no = (n + 1) * 8
                offsets = struct.unpack_from(f"<{n + 1}q", data, pos)
                pos += no
                base = pos
                for i in range(n):
                    if not not_null[i]:
                        col.append(None)
                        continue
                    col.append(_decode_elem(
                        tp, data[base + offsets[i]:base + offsets[i + 1]],
                        uns))
                pos = base + offsets[n]
            else:
                for i in range(n):
                    b = data[pos:pos + elem]
                    if len(b) != elem:
                        raise ValueError("chunk data truncated")
                    col.append(_decode_elem(tp, b, uns)
                               if not_null[i] else None)
                    pos += elem
            columns.append(col)
        return columns, data[pos:]
