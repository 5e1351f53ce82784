"""Pure-Python LZ4 (block format) and Snappy codecs.

The reference compresses large messages with lz4/snappy/zstd
(`pkg/compression/compression.go`, `codec/common/compress.go`).  This
container has no native lz4/snappy bindings, so these are from-scratch
implementations of the two public wire formats:

- **LZ4 block format**: token byte (literal-length nibble,
  match-length-minus-4 nibble, 15 ⇒ 255-run extension bytes), literal
  run, little-endian 16-bit match offset, match extension.  End-of-block
  rules honored: the final sequence is literals-only, the last 5 bytes
  are always literals, and no match starts within the last 12 bytes.
- **Snappy**: uvarint uncompressed length preamble, then literal
  elements (tag ``00``, 6-bit length or 60-62 length-byte escapes) and
  copy elements (tag ``10`` = 2-byte little-endian offset, 6-bit
  length-minus-1); the encoder emits only literal + copy2 elements,
  which every decoder must accept.

Both compressors use the standard greedy 4-byte hash-chain match
search.  Throughput is interpreter-bound (this is the correctness /
wire-shape path — swap in native bindings via ``_COMPRESS_CODECS`` on a
real cluster); the decompressors accept any spec-conforming stream, and
golden vectors in ``tests/test_lz4_snappy.py`` pin the formats
independently of the encoders.
"""

from __future__ import annotations

try:  # C kernels (byte-exact ports — see native_accel.py); optional
    from ticdc_spark.codec import native_accel as _na

    _NATIVE = _na.LIB is not None
except Exception:  # noqa: BLE001 — accelerator only, never required
    _na = None
    _NATIVE = False

_MIN_MATCH = 4
_HASH_LOG = 16


def _hash4(b: bytes, i: int) -> int:
    v = b[i] | (b[i + 1] << 8) | (b[i + 2] << 16) | (b[i + 3] << 24)
    return (v * 2654435761) >> (32 - _HASH_LOG) & 0xFFFF


# ---------------------------------------------------------------------------
# LZ4 block format
# ---------------------------------------------------------------------------
def lz4_block_compress(src: bytes) -> bytes:
    """Compress to LZ4 block format (no frame header/checksum)."""
    if _NATIVE:
        out = _na.lz4_block_compress(src)
        if out is not None:
            return out
    n = len(src)
    out = bytearray()
    if n == 0:
        return bytes([0])  # single empty-literal token
    table: dict[int, int] = {}
    anchor = 0
    i = 0
    # matches may not start in the last 12 bytes; last 5 are literals
    limit = n - 12

    def emit(lit_len: int, lit_start: int, match_len: int | None,
             offset: int | None) -> None:
        tok_lit = 15 if lit_len >= 15 else lit_len
        tok_mat = 0
        if match_len is not None:
            m = match_len - _MIN_MATCH
            tok_mat = 15 if m >= 15 else m
        out.append((tok_lit << 4) | tok_mat)
        rest = lit_len - 15
        while rest >= 0:
            out.append(255 if rest >= 255 else rest)
            rest -= 255
        out.extend(src[lit_start:lit_start + lit_len])
        if match_len is None:
            return
        out.append(offset & 0xFF)
        out.append((offset >> 8) & 0xFF)
        rest = (match_len - _MIN_MATCH) - 15
        while rest >= 0:
            out.append(255 if rest >= 255 else rest)
            rest -= 255

    while i <= limit:
        h = _hash4(src, i)
        cand = table.get(h)
        table[h] = i
        if (cand is not None and i - cand <= 0xFFFF
                and src[cand:cand + _MIN_MATCH] == src[i:i + _MIN_MATCH]):
            # extend the match (but never into the last 5 bytes)
            m_end = i + _MIN_MATCH
            c_end = cand + _MIN_MATCH
            hard_end = n - 5
            while m_end < hard_end and src[m_end] == src[c_end]:
                m_end += 1
                c_end += 1
            match_len = m_end - i
            emit(i - anchor, anchor, match_len, i - cand)
            i = m_end
            anchor = i
        else:
            i += 1
    emit(n - anchor, anchor, None, None)
    return bytes(out)


def lz4_block_decompress(src: bytes) -> bytes:
    if _NATIVE:
        res = _na.lz4_block_decompress(src)
        if res is not None:
            return res
        # else: malformed stream — fall through so the pure-Python
        # decoder raises the pinned error message
    out = bytearray()
    i = 0
    n = len(src)
    while i < n:
        token = src[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        out.extend(src[i:i + lit_len])
        i += lit_len
        if i >= n:
            break  # last sequence: literals only
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("lz4: zero match offset")
        match_len = (token & 0xF) + _MIN_MATCH
        if (token & 0xF) == 15:
            while True:
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise ValueError("lz4: offset beyond output")
        for k in range(match_len):  # byte-wise: overlapping copies legal
            out.append(out[start + k])
    return bytes(out)


# ---------------------------------------------------------------------------
# Snappy
# ---------------------------------------------------------------------------
def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(src: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = src[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _snappy_literal(out: bytearray, data: bytes) -> None:
    n = len(data)
    if n == 0:
        return
    if n <= 60:
        out.append((n - 1) << 2)
    elif n <= 0x100:
        out.append(60 << 2)
        out.append(n - 1)
    elif n <= 0x10000:
        out.append(61 << 2)
        out.append((n - 1) & 0xFF)
        out.append(((n - 1) >> 8) & 0xFF)
    else:
        out.append(62 << 2)
        v = n - 1
        out.extend((v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF))
    out.extend(data)


def snappy_compress(src: bytes) -> bytes:
    if _NATIVE:
        out_n = _na.snappy_compress(src)
        if out_n is not None:
            return out_n
    out = bytearray(_uvarint(len(src)))
    n = len(src)
    table: dict[int, int] = {}
    anchor = 0
    i = 0
    while i + _MIN_MATCH <= n:
        h = _hash4(src, i)
        cand = table.get(h)
        table[h] = i
        if (cand is not None and i - cand <= 0xFFFF
                and src[cand:cand + _MIN_MATCH] == src[i:i + _MIN_MATCH]):
            m_end = i + _MIN_MATCH
            c_end = cand + _MIN_MATCH
            while m_end < n and src[m_end] == src[c_end]:
                m_end += 1
                c_end += 1
            _snappy_literal(out, src[anchor:i])
            offset = i - cand
            length = m_end - i
            while length > 0:  # copy2 elements, 64-byte chunks
                chunk = min(length, 64)
                if chunk < _MIN_MATCH and length > chunk:
                    chunk = length  # avoid a tail shorter than a tag allows
                out.append(((chunk - 1) << 2) | 0x02)
                out.append(offset & 0xFF)
                out.append((offset >> 8) & 0xFF)
                length -= chunk
            i = m_end
            anchor = i
        else:
            i += 1
    _snappy_literal(out, src[anchor:])
    return bytes(out)


def snappy_decompress(src: bytes) -> bytes:
    expected, i = _read_uvarint(src, 0)
    if _NATIVE:
        res = _na.snappy_decompress(src, expected, i)
        if res is not None:
            return res
        # else: malformed/mismatched stream — fall through so the
        # pure-Python decoder raises the pinned error message
    out = bytearray()
    n = len(src)
    while i < n:
        tag = src[i]
        i += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            length = (tag >> 2) + 1
            if length > 60:
                extra = length - 60
                length = 1
                for k in range(extra):
                    length += src[i + k] << (8 * k)
                i += extra
            out.extend(src[i:i + length])
            i += length
            continue
        if kind == 1:  # copy1: 11-bit offset, len 4..11
            length = ((tag >> 2) & 0x07) + 4
            offset = ((tag >> 5) << 8) | src[i]
            i += 1
        elif kind == 2:  # copy2: 2-byte LE offset
            length = (tag >> 2) + 1
            offset = src[i] | (src[i + 1] << 8)
            i += 2
        else:  # copy4
            length = (tag >> 2) + 1
            offset = (src[i] | (src[i + 1] << 8) | (src[i + 2] << 16)
                      | (src[i + 3] << 24))
            i += 4
        if offset == 0:
            raise ValueError("snappy: zero copy offset")
        start = len(out) - offset
        if start < 0:
            raise ValueError("snappy: offset beyond output")
        for k in range(length):
            out.append(out[start + k])
    if len(out) != expected:
        raise ValueError(f"snappy: length mismatch {len(out)} != {expected}")
    return bytes(out)


# ---------------------------------------------------------------------------
# xxHash32 + LZ4 frame format
# ---------------------------------------------------------------------------
# The frame format (magic 0x184D2204, descriptor, 64 KB-chunked blocks,
# content checksum) is what interoperable lz4 tooling reads/writes —
# the Go library behind `pkg/compression` produces frames, not bare
# blocks.  xxHash32 is pinned by the spec's public test vectors.

_XXP1, _XXP2, _XXP3 = 2654435761, 2246822519, 3266489917
_XXP4, _XXP5 = 668265263, 374761393
_M32 = 0xFFFFFFFF

LZ4_FRAME_MAGIC = 0x184D2204
_FRAME_BLOCK_MAX = 64 * 1024  # BD code 4


def xxh32(data: bytes, seed: int = 0) -> int:
    if _NATIVE:
        return _na.xxh32(data, seed)

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (32 - r))) & _M32

    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _XXP1 + _XXP2) & _M32
        v2 = (seed + _XXP2) & _M32
        v3 = seed & _M32
        v4 = (seed - _XXP1) & _M32
        while i <= n - 16:
            def rd(o: int) -> int:
                return int.from_bytes(data[o:o + 4], "little")
            v1 = (rotl((v1 + rd(i) * _XXP2) & _M32, 13) * _XXP1) & _M32
            v2 = (rotl((v2 + rd(i + 4) * _XXP2) & _M32, 13) * _XXP1) & _M32
            v3 = (rotl((v3 + rd(i + 8) * _XXP2) & _M32, 13) * _XXP1) & _M32
            v4 = (rotl((v4 + rd(i + 12) * _XXP2) & _M32, 13) * _XXP1) & _M32
            i += 16
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & _M32
    else:
        h = (seed + _XXP5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        h = (rotl((h + int.from_bytes(data[i:i + 4], "little") * _XXP3)
                  & _M32, 17) * _XXP4) & _M32
        i += 4
    while i < n:
        h = (rotl((h + data[i] * _XXP5) & _M32, 11) * _XXP1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _XXP2) & _M32
    h ^= h >> 13
    h = (h * _XXP3) & _M32
    h ^= h >> 16
    return h


def lz4_frame_compress(src: bytes) -> bytes:
    """LZ4 frame: FLG = v01 | block-independent | content-checksum,
    BD = 64 KB max block, no content size."""
    out = bytearray(LZ4_FRAME_MAGIC.to_bytes(4, "little"))
    flg = (1 << 6) | (1 << 5) | (1 << 2)
    bd = 4 << 4
    desc = bytes([flg, bd])
    out.extend(desc)
    out.append((xxh32(desc) >> 8) & 0xFF)
    for off in range(0, len(src), _FRAME_BLOCK_MAX) or [0]:
        chunk = src[off:off + _FRAME_BLOCK_MAX]
        comp = lz4_block_compress(chunk)
        if len(comp) < len(chunk):
            out.extend(len(comp).to_bytes(4, "little"))
            out.extend(comp)
        else:  # store uncompressed: high bit of block size set
            out.extend((len(chunk) | 0x80000000).to_bytes(4, "little"))
            out.extend(chunk)
    out.extend((0).to_bytes(4, "little"))  # EndMark
    out.extend(xxh32(src).to_bytes(4, "little"))
    return bytes(out)


def lz4_frame_decompress(src: bytes) -> bytes:
    if int.from_bytes(src[0:4], "little") != LZ4_FRAME_MAGIC:
        raise ValueError("lz4 frame: bad magic")
    flg = src[4]
    if (flg >> 6) != 1:
        raise ValueError("lz4 frame: unsupported version")
    has_content_size = bool(flg & (1 << 3))
    has_content_checksum = bool(flg & (1 << 2))
    has_block_checksum = bool(flg & (1 << 4))
    i = 6 + (8 if has_content_size else 0)
    hc = src[i]
    if hc != (xxh32(src[4:i]) >> 8) & 0xFF:
        raise ValueError("lz4 frame: descriptor checksum mismatch")
    i += 1
    out = bytearray()
    while True:
        size = int.from_bytes(src[i:i + 4], "little")
        i += 4
        if size == 0:
            break
        raw = bool(size & 0x80000000)
        size &= 0x7FFFFFFF
        block = src[i:i + size]
        i += size
        if has_block_checksum:
            if int.from_bytes(src[i:i + 4], "little") != xxh32(block):
                raise ValueError("lz4 frame: block checksum mismatch")
            i += 4
        out.extend(block if raw else lz4_block_decompress(block))
    if has_content_checksum:
        if int.from_bytes(src[i:i + 4], "little") != xxh32(bytes(out)):
            raise ValueError("lz4 frame: content checksum mismatch")
    return bytes(out)
