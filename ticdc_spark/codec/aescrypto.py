"""At-rest encryption: pure-Python AES-CTR + the reference's envelope.

The reference encrypts event-store blocks, schema-store snapshots, and
large-txn spill files with AES-CTR under 3-byte-addressed data keys
(`pkg/encryption/cipher.go` AES256CTRCipher, `format.go`
``[version(1)][dataKeyID(3)]`` header, `manager.go:379-412` data-key
wrapping ``[iv(16)][ciphertext]`` with a legacy zero-IV fallback).
No crypto bindings exist in this container, so the block cipher is
implemented from FIPS-197 directly — the S-box and Rcon are *computed*
from their GF(2^8) definitions rather than transcribed, and the
implementation is pinned by the published FIPS-197 appendix-C and NIST
SP 800-38A F.5 test vectors in ``tests/test_aescrypto.py``.

CTR needs only the forward cipher; throughput is interpreter-bound
(correctness/wire-shape path — swap in native crypto on a cluster).
"""

from __future__ import annotations

# -- GF(2^8) helpers ---------------------------------------------------------


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a = _xtime(a)
        b >>= 1
    return r


def _build_sbox() -> list[int]:
    # multiplicative inverse via exp/log tables over generator 3,
    # then the FIPS-197 affine transform
    exp = [0] * 510
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gmul(x, 3)
    for i in range(255, 510):
        exp[i] = exp[i - 255]

    def inv(a: int) -> int:
        return 0 if a == 0 else exp[255 - log[a]]

    sbox = []
    for a in range(256):
        b = inv(a)
        s = 0
        for i in range(8):
            bit = ((b >> i) & 1) ^ ((b >> ((i + 4) % 8)) & 1) \
                ^ ((b >> ((i + 5) % 8)) & 1) ^ ((b >> ((i + 6) % 8)) & 1) \
                ^ ((b >> ((i + 7) % 8)) & 1) ^ ((0x63 >> i) & 1)
            s |= bit << i
        sbox.append(s)
    return sbox


_SBOX = _build_sbox()


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 16, 24, or 32 bytes")
    nr = nk + 6
    words = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        tmp = list(words[i - 1])
        if i % nk == 0:
            tmp = tmp[1:] + tmp[:1]
            tmp = [_SBOX[b] for b in tmp]
            tmp[0] ^= rcon
            rcon = _xtime(rcon)
        elif nk > 6 and i % nk == 4:
            tmp = [_SBOX[b] for b in tmp]
        words.append([w ^ t for w, t in zip(words[i - nk], tmp)])
    # group into 4x4 round-key matrices (column-major state)
    return [words[4 * r:4 * r + 4] for r in range(nr + 1)]


def _encrypt_block(block: bytes, round_keys: list[list[int]]) -> bytes:
    nr = len(round_keys) - 1
    # state[c][r]: column-major per FIPS-197
    st = [list(block[4 * c:4 * c + 4]) for c in range(4)]

    def add_round_key(r: int) -> None:
        rk = round_keys[r]
        for c in range(4):
            for i in range(4):
                st[c][i] ^= rk[c][i]

    def sub_shift() -> None:
        for c in range(4):
            for i in range(4):
                st[c][i] = _SBOX[st[c][i]]
        # ShiftRows on column-major layout: row r rotates left by r
        for r in range(1, 4):
            row = [st[c][r] for c in range(4)]
            row = row[r:] + row[:r]
            for c in range(4):
                st[c][r] = row[c]

    def mix_columns() -> None:
        for c in range(4):
            a = st[c]
            st[c] = [
                _gmul(a[0], 2) ^ _gmul(a[1], 3) ^ a[2] ^ a[3],
                a[0] ^ _gmul(a[1], 2) ^ _gmul(a[2], 3) ^ a[3],
                a[0] ^ a[1] ^ _gmul(a[2], 2) ^ _gmul(a[3], 3),
                _gmul(a[0], 3) ^ a[1] ^ a[2] ^ _gmul(a[3], 2),
            ]

    add_round_key(0)
    for r in range(1, nr):
        sub_shift()
        mix_columns()
        add_round_key(r)
    sub_shift()
    add_round_key(nr)
    return bytes(b for c in st for b in c)


def ctr_crypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CTR keystream XOR (Go ``cipher.NewCTR`` semantics: the full
    16-byte IV is the big-endian counter). Encrypt == decrypt."""
    if len(iv) != 16:
        raise ValueError("CTR IV must be 16 bytes")
    rks = _expand_key(key)
    out = bytearray()
    counter = int.from_bytes(iv, "big")
    for off in range(0, len(data), 16):
        ks = _encrypt_block(counter.to_bytes(16, "big"), rks)
        chunk = data[off:off + 16]
        out.extend(b ^ k for b, k in zip(chunk, ks))
        counter = (counter + 1) & ((1 << 128) - 1)
    return bytes(out)


# -- envelope (`pkg/encryption/format.go`) -----------------------------------

ENCRYPTION_HEADER_SIZE = 4
VERSION_UNENCRYPTED = 0x00


def encode_encrypted(data: bytes, version: int, data_key_id: bytes) -> bytes:
    """``[version(1)][dataKeyID(3)][payload]`` (format.go:18-31)."""
    if len(data_key_id) != 3:
        raise ValueError("data key ID must be 3 bytes")
    if version == VERSION_UNENCRYPTED:
        raise ValueError("version cannot be 0 for encrypted data")
    return bytes([version]) + data_key_id + data


def decode_encrypted(data: bytes) -> tuple[int, bytes, bytes]:
    if len(data) < ENCRYPTION_HEADER_SIZE:
        raise ValueError("data too short for encryption header")
    return data[0], data[1:4], data[4:]


def is_encrypted(data: bytes) -> bool:
    return (len(data) >= ENCRYPTION_HEADER_SIZE
            and data[0] != VERSION_UNENCRYPTED
            and data[1:4] != b"\x00\x00\x00")


# -- manager (`pkg/encryption/manager.go`) -----------------------------------


class EncryptionManager:
    """Data keys wrapped by a master key, addressed by 3-byte ids.

    Wrapping format ``[iv(16)][ctr(master, iv, key)]``
    (manager.go:379-399); ``unwrap`` falls back to the legacy zero-IV
    ciphertext-only form (:401-412).  The KMS/TiKV fetch path is out of
    environment scope — the master key is injected.
    """

    def __init__(self, master_key: bytes, version: int = 1,
                 deterministic_ivs: bool = False):
        self._master = master_key
        self._version = version
        self._keys: dict[bytes, bytes] = {}
        # CTR keystreams must never repeat under one key: random IVs by
        # default (crypto/rand in the reference); the deterministic mode
        # exists only for reproducible fixtures.
        self._deterministic = deterministic_ivs

    def add_data_key(self, key_id: bytes, key: bytes) -> bytes:
        """Register a data key; returns the wrapped ciphertext."""
        if len(key_id) != 3:
            raise ValueError("data key ID must be 3 bytes")
        self._keys[key_id] = key
        iv = self._derive_iv(key_id)
        return iv + ctr_crypt(self._master, iv, key)

    def unwrap_data_key(self, key_id: bytes, wrapped: bytes) -> bytes:
        if len(wrapped) > 16:
            iv, ct = wrapped[:16], wrapped[16:]
            key = ctr_crypt(self._master, iv, ct)
        else:  # legacy: ciphertext only, zero IV
            key = ctr_crypt(self._master, b"\x00" * 16, wrapped)
        self._keys[key_id] = key
        return key

    def _derive_iv(self, salt: bytes) -> bytes:
        if not self._deterministic:
            import os as _os

            return _os.urandom(16)
        import hashlib

        return hashlib.md5(b"iv:" + salt + self._master).digest()

    def encrypt(self, data: bytes, key_id: bytes) -> bytes:
        key = self._keys[key_id]
        iv = self._derive_iv(data[:32] + key_id)
        payload = iv + ctr_crypt(key, iv, data)
        return encode_encrypted(payload, self._version, key_id)

    def decrypt(self, blob: bytes) -> bytes:
        if not is_encrypted(blob):
            raise ValueError("not an encrypted envelope")
        _, key_id, payload = decode_encrypted(blob)
        iv, ct = payload[:16], payload[16:]
        return ctr_crypt(self._keys[key_id], iv, ct)
