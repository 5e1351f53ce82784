"""Zstandard codec backed by pyarrow's bundled native zstd.

The reference compresses large messages and internal events with
lz4/snappy/zstd (`pkg/compression/compression.go`, codec names at
`pkg/compression/compression.go:29-33`).  lz4 and snappy have
spec-derived pure-Python implementations in `lz4_snappy.py` (byte
cross-validated against the native codecs); zstd's format (RFC 8878:
FSE + Huffman entropy stages) is far too complex to reimplement
credibly, so this module wraps the *native* zstd that ships inside
pyarrow's Arrow C++ build — no extra install, real wire bytes.

Wire format: standard zstd frames (magic 0xFD2FB528), exactly what the
reference's klauspost/compress zstd writer emits, so payloads are
mutually decodable.

Decompression uses ``pa.CompressedInputStream`` (streaming) rather than
``Codec.decompress`` because the latter demands an explicit
decompressed_size; streaming decode handles frames with or without the
Frame_Content_Size header field.
"""
from __future__ import annotations

try:  # pragma: no cover - pyarrow is baked into the target env
    import pyarrow as _pa
    _HAVE_ZSTD = _pa.Codec.is_available("zstd")
except Exception:  # pragma: no cover
    _pa = None
    _HAVE_ZSTD = False

ZSTD_MAGIC = 0xFD2FB528  # RFC 8878 §3.1.1


def zstd_available() -> bool:
    return _HAVE_ZSTD


def zstd_compress(src: bytes) -> bytes:
    """One zstd frame over ``src`` (default level)."""
    if not _HAVE_ZSTD:  # pragma: no cover - env gate
        raise RuntimeError("pyarrow zstd codec unavailable in this build")
    return _pa.Codec("zstd").compress(bytes(src)).to_pybytes()


def zstd_decompress(src: bytes) -> bytes:
    """Decode one-or-more concatenated zstd frames (streaming)."""
    if not _HAVE_ZSTD:  # pragma: no cover - env gate
        raise RuntimeError("pyarrow zstd codec unavailable in this build")
    if len(src) >= 4 and int.from_bytes(src[:4], "little") != ZSTD_MAGIC:
        raise ValueError("not a zstd frame (bad magic)")
    stream = _pa.CompressedInputStream(_pa.BufferReader(bytes(src)), "zstd")
    return stream.read()
