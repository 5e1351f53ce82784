"""RFC 3961/3962 crypto pinned to the published RFC vectors."""

from __future__ import annotations

from ticdc_spark.codec import krb5crypto as kc


def test_nfold_rfc3961_vectors():
    # RFC 3961 §A.1
    assert kc.nfold(b"012345", 8) == bytes.fromhex("be072631276b1955")
    assert kc.nfold(b"password", 7) == bytes.fromhex("78a07b6caf85fa")
    assert kc.nfold(b"Rough Consensus, and Running Code", 8) == \
        bytes.fromhex("bb6ed30870b7f0e0")
    assert kc.nfold(b"password", 21) == \
        bytes.fromhex("59e4a8ca7c0385c3c37b3f6d2000247cb6e6bd5b3e")
    assert kc.nfold(b"MASSACHVSETTS INSTITVTE OF TECHNOLOGY", 24) == \
        bytes.fromhex("db3b0d8f0b061e603282b308a50841229ad798fab9540c1b")
    assert kc.nfold(b"kerberos", 8) == bytes.fromhex("6b65726265726f73")
    assert kc.nfold(b"kerberos", 16) == \
        bytes.fromhex("6b65726265726f737b9b5b2b93132b93")
    assert kc.nfold(b"kerberos", 21) == \
        bytes.fromhex("8372c236344e5f1550cd0747e15d62ca7a5a3bcea4")
    assert kc.nfold(b"kerberos", 24) == \
        bytes.fromhex("6b65726265726f737b9b5b2b93132b935c9bdcdad95c9899")


def test_string_to_key_rfc3962_vectors():
    # RFC 3962 appendix B (256-bit entries)
    v = kc.string_to_key("password", "ATHENA.MIT.EDUraeburn", iterations=1)
    assert v == bytes.fromhex(
        "fe697b52bc0d3ce14432ba036a92e65b"
        "bb52280990a2fa27883998d72af30161")
    v = kc.string_to_key("password", "ATHENA.MIT.EDUraeburn", iterations=2)
    assert v == bytes.fromhex(
        "a2e16d16b36069c135d5e9d2e25f8961"
        "02685618b95914b467c67622225824ff")
    v = kc.string_to_key("password", "ATHENA.MIT.EDUraeburn",
                         iterations=1200)
    assert v == bytes.fromhex(
        "55a6ac740ad17b4846941051e1e8b0a7"
        "548d93b0ab30a8bc3ff16280382b8c2a")
    v = kc.string_to_key(
        "X" * 64, "pass phrase equals block size", iterations=1200)
    assert v == bytes.fromhex(
        "89adee3608db8bc71f1bfbfe459486b0"
        "5618b70cbae22092534e56c553ba4b34")
    v = kc.string_to_key(
        "X" * 65, "pass phrase exceeds block size", iterations=1200)
    assert v == bytes.fromhex(
        "d78c5c9cb872a8c9dad4697f0bb5b2d2"
        "1496c82beb2caeda2112fceea057401b")


def test_encrypt_decrypt_roundtrip_all_lengths():
    key = kc.string_to_key("s3cret", "REALMuser")
    for n in (0, 1, 15, 16, 17, 31, 32, 33, 100, 255):
        pt = bytes(range(256))[:n]
        ct = kc.encrypt(key, 3, pt)
        assert kc.decrypt(key, 3, ct) == pt
        # wrong usage fails integrity
        try:
            kc.decrypt(key, 4, ct)
            raise AssertionError("usage mismatch accepted")
        except ValueError:
            pass


def test_cts_swaps_last_blocks():
    key = bytes(32)
    pt = bytes(range(48))  # three full blocks
    ct = kc.cts_encrypt(key, pt)
    assert kc.cts_decrypt(key, ct) == pt
    # partial tail
    pt = bytes(range(40))
    assert kc.cts_decrypt(key, kc.cts_encrypt(key, pt)) == pt


def test_checksum_verifies():
    key = kc.string_to_key("pw", "Rsalt")
    mac = kc.checksum(key, 11, b"authenticator-bytes")
    assert len(mac) == 12
    assert mac == kc.checksum(key, 11, b"authenticator-bytes")
    assert mac != kc.checksum(key, 12, b"authenticator-bytes")
