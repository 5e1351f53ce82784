"""AES-CTR + encryption envelope tests, pinned by published vectors."""

from __future__ import annotations

import pytest

from ticdc_spark.codec.aescrypto import (
    EncryptionManager,
    _encrypt_block,
    _expand_key,
    ctr_crypt,
    decode_encrypted,
    encode_encrypted,
    is_encrypted,
)


def test_fips197_appendix_c1_aes128():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = _encrypt_block(pt, _expand_key(key))
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"


def test_fips197_appendix_c2_aes192():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f1011121314151617")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = _encrypt_block(pt, _expand_key(key))
    assert ct.hex() == "dda97ca4864cdfe06eaf70a0ec0d7191"


def test_fips197_appendix_c3_aes256():
    key = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f"
        "101112131415161718191a1b1c1d1e1f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = _encrypt_block(pt, _expand_key(key))
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"


def test_nist_sp800_38a_f51_ctr_aes128():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff")
    pt = bytes.fromhex(
        "6bc1bee22e409f96e93d7e117393172a"
        "ae2d8a571e03ac9c9eb76fac45af8e51"
        "30c81c46a35ce411e5fbc1191a0a52ef"
        "f69f2445df4f9b17ad2b417be66c3710")
    want = (
        "874d6191b620e3261bef6864990db6ce"
        "9806f66b7970fdff8617187bb9fffdff"
        "5ae4df3edbd5d35e5b4f09020db03eab"
        "1e031dda2fbe03d1792170a0f3009cee")
    assert ctr_crypt(key, iv, pt).hex() == want
    # CTR is an involution
    assert ctr_crypt(key, iv, bytes.fromhex(want)) == pt


@pytest.mark.parametrize("ksize", [16, 24, 32])
def test_ctr_roundtrip_all_key_sizes(ksize):
    key = bytes(range(ksize))
    iv = bytes(range(100, 116))
    for data in (b"", b"x", b"hello world" * 100, bytes(255)):
        assert ctr_crypt(key, iv, ctr_crypt(key, iv, data)) == data


def test_envelope_format():
    blob = encode_encrypted(b"payload", 1, b"k01")
    assert blob[:4] == bytes([1]) + b"k01"
    v, kid, payload = decode_encrypted(blob)
    assert (v, kid, payload) == (1, b"k01", b"payload")
    assert is_encrypted(blob)
    assert not is_encrypted(bytes([0, 0, 0, 0]) + b"plain")
    with pytest.raises(ValueError):
        encode_encrypted(b"x", 0, b"k01")
    with pytest.raises(ValueError):
        encode_encrypted(b"x", 1, b"toolong")


def test_manager_roundtrip_and_key_wrapping():
    master = bytes(range(32))
    m = EncryptionManager(master)
    wrapped = m.add_data_key(b"\x00\x00\x01", bytes(range(50, 82)))

    # a second manager unwraps from the wire form alone
    m2 = EncryptionManager(master)
    key = m2.unwrap_data_key(b"\x00\x00\x01", wrapped)
    assert key == bytes(range(50, 82))

    blob = m.encrypt(b"event store block" * 40, b"\x00\x00\x01")
    assert is_encrypted(blob)
    assert m2.decrypt(blob) == b"event store block" * 40


def test_manager_legacy_zero_iv_unwrap():
    master = bytes(range(32))
    key = bytes(range(16))
    legacy = ctr_crypt(master, b"\x00" * 16, key)
    m = EncryptionManager(master)
    assert m.unwrap_data_key(b"\x00\x00\x02", legacy) == key


def test_spark_encrypt_decrypt_path(spark, sf_dir):
    """Arrow-batched encrypt/decrypt over a message column."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from ticdc_spark.sources.changelog import events_changelog

    master = bytes(range(32))
    mgr = EncryptionManager(master)
    mgr.add_data_key(b"\x00\x00\x01", bytes(range(32)))
    keys = dict(mgr._keys)

    cl = events_changelog(spark, sf_dir).limit(100).select(
        F.concat_ws("|", "schema_name", "table_name", "pk").alias("value"))

    @pandas_udf("binary")
    def enc(s):
        import pandas as pd

        from ticdc_spark.codec.aescrypto import EncryptionManager

        m = EncryptionManager(master)
        m._keys.update(keys)
        return pd.Series([m.encrypt(v.encode(), b"\x00\x00\x01")
                          for v in s])

    @pandas_udf("string")
    def dec(s):
        import pandas as pd

        from ticdc_spark.codec.aescrypto import EncryptionManager

        m = EncryptionManager(master)
        m._keys.update(keys)
        return pd.Series([m.decrypt(bytes(v)).decode() for v in s])

    back = cl.select(dec(enc(F.col("value"))).alias("value"))
    assert back.exceptAll(cl).count() == 0
    assert cl.exceptAll(back).count() == 0


def test_ivs_are_unique_per_message():
    """CTR keystream reuse would be catastrophic: two encryptions of
    the same plaintext must carry different IVs (random by default)."""
    m = EncryptionManager(bytes(range(32)))
    m.add_data_key(b"\x00\x00\x01", bytes(range(32)))
    b1 = m.encrypt(b"same plaintext", b"\x00\x00\x01")
    b2 = m.encrypt(b"same plaintext", b"\x00\x00\x01")
    assert b1[4:20] != b2[4:20]  # IVs differ
    assert m.decrypt(b1) == m.decrypt(b2) == b"same plaintext"
