"""LZ4 block-format and Snappy codec tests.

Golden DECODE vectors are hand-derived from the public format specs, so
they pin the wire format independently of our encoder (a matched
encoder/decoder bug cannot pass them).
"""

from __future__ import annotations

import zlib

import pytest

from ticdc_spark.codec.lz4_snappy import (
    lz4_block_compress,
    lz4_block_decompress,
    snappy_compress,
    snappy_decompress,
)

CASES = [
    b"",
    b"a",
    b"hello world",
    b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    b"abcd" * 100,
    bytes(range(256)) * 8,                      # incompressible-ish
    b"The quick brown fox jumps over the lazy dog. " * 50,
    zlib.compress(b"x" * 10_000),               # high-entropy payload
    b"ab" * 7,                                  # overlapping match, odd tail
    b"0123456789" + b"x" * 300 + b"0123456789",  # long literal run (>255)
]


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_lz4_roundtrip(data):
    assert lz4_block_decompress(lz4_block_compress(data)) == data


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_snappy_roundtrip(data):
    assert snappy_decompress(snappy_compress(data)) == data


def test_lz4_compresses_repetitive_input():
    data = b"abcdefgh" * 1000
    assert len(lz4_block_compress(data)) < len(data) // 10


def test_snappy_compresses_repetitive_input():
    data = b"abcdefgh" * 1000
    assert len(snappy_compress(data)) < len(data) // 10


# -- golden vectors straight from the specs ---------------------------------

def test_lz4_golden_literal_only():
    # token: 5 literals, no match; end-of-block literals-only sequence
    assert lz4_block_decompress(bytes([0x50]) + b"hello") == b"hello"


def test_lz4_golden_match():
    # "abcdabcdabcdabcdefgh" can be coded as:
    #   seq1: 4 literals "abcd", match offset=4 len=4+8=12
    #   seq2: 4 literals "efgh" (final, literals only)
    blob = bytes([(4 << 4) | 8]) + b"abcd" + bytes([0x04, 0x00]) \
        + bytes([4 << 4]) + b"efgh"
    assert lz4_block_decompress(blob) == b"abcd" * 4 + b"efgh"


def test_lz4_golden_overlapping_match():
    # 1 literal 'a', offset 1, match 15+4+... : RLE via overlapping copy
    blob = bytes([(1 << 4) | 0xF]) + b"a" + bytes([0x01, 0x00]) \
        + bytes([5]) + bytes([1 << 4]) + b"b"
    # match_len = 15 + 4 + 5 = 24 copies of 'a'
    assert lz4_block_decompress(blob) == b"a" * 25 + b"b"


def test_lz4_golden_long_literal_run():
    # literal nibble 15 + extension byte 255 + 3 => 273 literals
    payload = bytes(i & 0xFF for i in range(273))
    blob = bytes([0xF0, 255, 3]) + payload
    assert lz4_block_decompress(blob) == payload


def test_snappy_golden_literal():
    # uvarint(5), tag (5-1)<<2 literal, "hello"
    assert snappy_decompress(bytes([5, 4 << 2]) + b"hello") == b"hello"


def test_snappy_golden_copy1():
    # "abab" * 4: uvarint(16); literal "ab"; copy1 len=(tag>>2&7)+4,
    # offset = (tag>>5)<<8 | next. tag kind 01, len 14 -> (len-4)=10 won't
    # fit 3 bits; use len 11: tag = (7<<2)|1 offset byte 2, then copy1
    # len 4 offset 2 -> total 2 + 11 + ... simpler: literal + one copy1
    # of length 6 (tag bits 2) offset 2.
    blob = bytes([8, (2 - 1) << 2]) + b"ab" + bytes([((6 - 4) << 2) | 1, 2])
    assert snappy_decompress(blob) == b"ab" * 4


def test_snappy_golden_copy2():
    blob = bytes([12, (4 - 1) << 2]) + b"abcd" \
        + bytes([((8 - 1) << 2) | 2, 4, 0])
    assert snappy_decompress(blob) == b"abcd" * 3


def test_snappy_golden_long_literal_escape():
    payload = bytes(i & 0xFF for i in range(300))
    # 60-escape won't fit 300; 61 => two length bytes (n-1 = 299)
    blob = bytes([0xAC, 0x02, 61 << 2, 299 & 0xFF, 299 >> 8]) + payload
    assert snappy_decompress(blob) == payload


def test_spark_compress_path_with_lz4(spark, sf_dir):
    """The large-message operator accepts the new codecs end-to-end."""
    from ticdc_spark.operators.large_message import (
        compress_values,
        decompress_values,
    )
    from ticdc_spark.sources.changelog import events_changelog
    from pyspark.sql import functions as F

    cl = events_changelog(spark, sf_dir).limit(200).select(
        F.concat_ws(":", "schema_name", "table_name", "pk").alias("value"))
    for codec in ("lz4", "snappy"):
        back = decompress_values(compress_values(cl, codec), codec)
        assert back.exceptAll(cl).count() == 0
        assert cl.exceptAll(back).count() == 0


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.binary(max_size=4096))
    @settings(max_examples=200, deadline=None)
    def test_lz4_roundtrip_fuzz(data):
        assert lz4_block_decompress(lz4_block_compress(data)) == data

    @given(st.binary(max_size=4096))
    @settings(max_examples=200, deadline=None)
    def test_snappy_roundtrip_fuzz(data):
        assert snappy_decompress(snappy_compress(data)) == data
except ImportError:  # pragma: no cover
    pass


# -- xxHash32 + frame format -------------------------------------------------

def test_xxh32_spec_vectors():
    from ticdc_spark.codec.lz4_snappy import xxh32
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_lz4_frame_roundtrip(data):
    from ticdc_spark.codec.lz4_snappy import (
        lz4_frame_compress,
        lz4_frame_decompress,
    )
    assert lz4_frame_decompress(lz4_frame_compress(data)) == data


def test_lz4_frame_multiblock():
    from ticdc_spark.codec.lz4_snappy import (
        lz4_frame_compress,
        lz4_frame_decompress,
    )
    data = (b"block content " * 10_000)[:150_000]  # > 2 blocks at 64 KB
    assert lz4_frame_decompress(lz4_frame_compress(data)) == data


def test_lz4_frame_detects_corruption():
    from ticdc_spark.codec.lz4_snappy import (
        lz4_frame_compress,
        lz4_frame_decompress,
    )
    blob = bytearray(lz4_frame_compress(b"payload under checksum" * 20))
    blob[-1] ^= 0xFF  # flip content checksum
    with pytest.raises(ValueError):
        lz4_frame_decompress(bytes(blob))


# -- native cross-validation (pyarrow's bundled C++ codecs) ------------------
# The golden vectors pin the formats by hand; these pin them against an
# entirely independent implementation (Arrow C++ lz4/snappy), both
# directions: our encoder must be decodable by the native decoder, and
# our decoder must accept native-encoder output.

def _pa_codec(name):
    pa = pytest.importorskip("pyarrow")
    if not pa.Codec.is_available(name):
        pytest.skip(f"pyarrow built without {name}")
    return pa, pa.Codec(name)


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_snappy_cross_native(data):
    pa, codec = _pa_codec("snappy")
    assert codec.decompress(
        snappy_compress(data), decompressed_size=len(data)
    ).to_pybytes() == data
    assert snappy_decompress(codec.compress(data).to_pybytes()) == data


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_lz4_block_cross_native(data):
    pa, codec = _pa_codec("lz4_raw")
    assert codec.decompress(
        lz4_block_compress(data), decompressed_size=len(data)
    ).to_pybytes() == data
    assert lz4_block_decompress(codec.compress(data).to_pybytes()) == data


@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_lz4_frame_cross_native(data):
    from ticdc_spark.codec.lz4_snappy import (
        lz4_frame_compress,
        lz4_frame_decompress,
    )
    pa, codec = _pa_codec("lz4")
    assert codec.decompress(
        lz4_frame_compress(data), decompressed_size=len(data)
    ).to_pybytes() == data
    assert lz4_frame_decompress(codec.compress(data).to_pybytes()) == data


# -- zstd (native, via codec/zstd_arrow.py) ----------------------------------

@pytest.mark.parametrize("data", CASES, ids=range(len(CASES)))
def test_zstd_roundtrip(data):
    from ticdc_spark.codec import zstd_arrow as za
    if not za.zstd_available():
        pytest.skip("pyarrow built without zstd")
    blob = za.zstd_compress(data)
    # standard frame magic (RFC 8878 §3.1.1) — decodable by any zstd
    assert int.from_bytes(blob[:4], "little") == za.ZSTD_MAGIC
    assert za.zstd_decompress(blob) == data


def test_zstd_rejects_garbage():
    from ticdc_spark.codec import zstd_arrow as za
    if not za.zstd_available():
        pytest.skip("pyarrow built without zstd")
    with pytest.raises(ValueError):
        za.zstd_decompress(b"not a zstd frame at all")


def test_spark_compress_path_with_zstd(spark, sf_dir):
    from ticdc_spark.codec import zstd_arrow as za
    if not za.zstd_available():
        pytest.skip("pyarrow built without zstd")
    from ticdc_spark.operators.large_message import (
        compress_values,
        decompress_values,
    )
    from ticdc_spark.sources.changelog import events_changelog
    from pyspark.sql import functions as F

    cl = events_changelog(spark, sf_dir).limit(200).select(
        F.to_json(F.struct("schema_name", "table_name", "commit_ts"))
        .alias("value")
    )
    out = decompress_values(
        compress_values(cl, codec="zstd"), codec="zstd"
    )
    orig = [r.value for r in cl.collect()]
    back = [r.value for r in out.collect()]
    assert back == orig
