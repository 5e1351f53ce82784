"""Native codec kernels (codec/native_accel.py): byte-exactness vs the
pure-Python implementations they accelerate, and the fallback contract.

The C kernels are line-by-line ports; ANY output divergence — even one
byte of compressor output — would shift message sizes through the
max-message-bytes / claim-check gates and change query results, so the
equality here is exact bytes, not just roundtrip success.
"""

from __future__ import annotations

import random
import types

import pytest

from ticdc_spark.codec import native_accel as na
import ticdc_spark.codec.kafka_wire as kw
import ticdc_spark.codec.lz4_snappy as ls


def _pure_python_lz4_snappy() -> types.ModuleType:
    """lz4_snappy with the native path disabled (reference behavior)."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(ls.__file__), "lz4_snappy.py")
    with open(path) as f:
        src = f.read().replace(
            "from ticdc_spark.codec import native_accel as _na",
            "raise ImportError")
    mod = types.ModuleType("lz4_snappy_pure")
    exec(compile(src, path, "exec"), mod.__dict__)
    assert not mod._NATIVE
    return mod


def _cases() -> list[bytes]:
    rng = random.Random(20260817)

    def gen(n: int, mode: int) -> bytes:
        if mode == 0:
            return bytes(rng.randrange(256) for _ in range(n))
        if mode == 1:
            return (b"abcdefgh" * (n // 8 + 1))[:n]
        if mode == 2:
            return bytes(rng.choice(b"ab") for _ in range(n))
        if mode == 3:
            return b"\x00" * n
        base = bytes(rng.randrange(256) for _ in range(max(1, n // 10)))
        out = bytearray()
        while len(out) < n:
            out.extend(base[: rng.randrange(1, len(base) + 1)])
        return bytes(out[:n])

    cases = [b"", b"a", b"abcd", b"abcdefghijkl", b"abcdefghijklm"]
    for n in (5, 13, 14, 60, 61, 255, 256, 270, 1000, 65535, 65536, 65537):
        for mode in range(5):
            cases.append(gen(n, mode))
    return cases


@pytest.mark.skipif(na.LIB is None, reason="no C compiler on this host")
def test_native_matches_pure_python_byte_exact():
    py = _pure_python_lz4_snappy()
    assert ls._NATIVE and kw._NATIVE
    for i, c in enumerate(_cases()):
        assert ls.lz4_block_compress(c) == py.lz4_block_compress(c), i
        assert ls.snappy_compress(c) == py.snappy_compress(c), i
        assert ls.lz4_block_decompress(
            py.lz4_block_compress(c)) == c, i
        assert ls.snappy_decompress(py.snappy_compress(c)) == c, i
        assert ls.xxh32(c) == py.xxh32(c), i
        assert ls.xxh32(c, seed=12345) == py.xxh32(c, seed=12345), i
        assert ls.lz4_frame_compress(c) == py.lz4_frame_compress(c), i
        assert kw.crc32c(c) == py_crc(c), i
        assert kw.crc32c(c, 99) == py_crc(c, 99), i


def py_crc(data: bytes, crc: int = 0) -> int:
    """Reference pure-Python crc32c (same tables kafka_wire builds)."""
    crc = crc ^ 0xFFFFFFFF
    t0 = kw._T[0]
    for b in data:
        crc = t0[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


@pytest.mark.skipif(na.LIB is None, reason="no C compiler on this host")
def test_malformed_streams_still_raise_pinned_errors():
    # native returns None on malformed input; the dispatcher must fall
    # back to pure Python so error messages stay pinned
    with pytest.raises(ValueError, match="zero match offset"):
        ls.lz4_block_decompress(bytes([0x10, ord("a"), 0, 0]))
    with pytest.raises(ValueError, match="zero copy offset"):
        ls.snappy_decompress(b"\x05\x01\x00")


def test_public_vectors_regardless_of_backend():
    assert kw.crc32c(b"123456789") == 0xE3069283
    assert kw.crc32c(b"") == 0
    assert ls.xxh32(b"") == 0x02CC5D05
    assert ls.xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F
