"""Kerberos 5 cryptography — aes256-cts-hmac-sha1-96 (RFC 3962) over
the RFC 3961 framework (n-fold, DK key derivation, simplified profile).

Built from the public RFCs; the RFC 3961 §A.1 n-fold vectors and the
RFC 3962 appendix-B string-to-key vectors are pinned in tests.  AES
primitives come from the `cryptography` package (same dependency the
TLS material uses); ciphertext stealing (CTS) is composed here from
raw CBC blocks per RFC 3962 §5.

Used by the SASL/GSSAPI mechanism (`codec/gssapi.py`) against the
in-process KDC (`sinks/kdc_server.py`) — the reference exposes
sasl-gssapi kafka params at `pkg/sink/kafka/sarama_config.go:128`.
"""

from __future__ import annotations

import functools
import hashlib
import hmac
import os
import struct

AES_BLOCK = 16

# encryption / checksum type numbers (RFC 3962 §7)
ETYPE_AES256_CTS_HMAC_SHA1 = 18
CKSUMTYPE_HMAC_SHA1_96_AES256 = 16

# RFC 3961 key usage numbers (RFC 4120 §7.5.1)
KU_AS_REQ_PA_ENC_TS = 1
KU_KDC_REP_TICKET = 2
KU_AS_REP_ENC_PART = 3
KU_TGS_REQ_AUTH_SESSION = 7
KU_TGS_REP_ENC_PART_SESSION = 8
KU_AP_REQ_AUTHENTICATOR = 11
KU_AP_REP_ENC_PART = 12
KU_GSS_ACCEPTOR_SEAL = 22
KU_GSS_INITIATOR_SEAL = 24


def _rot13_bits(data: bytes) -> bytes:
    """Right-rotate the whole byte string by 13 bits (RFC 3961 §5.1)."""
    n = len(data) * 8
    as_int = int.from_bytes(data, "big")
    rot = ((as_int >> 13) | (as_int << (n - 13))) & ((1 << n) - 1)
    return rot.to_bytes(len(data), "big")


def _ones_complement_add(a: bytes, b: bytes) -> bytes:
    """Ones'-complement (end-around carry) addition of equal-length
    byte strings."""
    n = len(a)
    total = int.from_bytes(a, "big") + int.from_bytes(b, "big")
    mask = (1 << (n * 8)) - 1
    while total >> (n * 8):
        total = (total & mask) + (total >> (n * 8))
    return total.to_bytes(n, "big")


def nfold(data: bytes, nbytes: int) -> bytes:
    """RFC 3961 §5.1 n-fold: stretch/compress ``data`` to ``nbytes``
    using 13-bit rotation and ones'-complement accumulation."""
    import math

    lcm = len(data) * nbytes // math.gcd(len(data), nbytes)
    buf = b""
    chunk = data
    while len(buf) < lcm:
        buf += chunk
        chunk = _rot13_bits(chunk)
    out = bytes(nbytes)
    for i in range(0, lcm, nbytes):
        out = _ones_complement_add(out, buf[i:i + nbytes])
    return out


def _aes_ecb(key: bytes):
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    return Cipher(algorithms.AES(key), modes.ECB())


def _cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    return enc.update(data) + enc.finalize()


def _cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    dec = Cipher(algorithms.AES(key), modes.CBC(iv)).decryptor()
    return dec.update(data) + dec.finalize()


def cts_encrypt(key: bytes, data: bytes, iv: bytes = bytes(16)) -> bytes:
    """AES-CBC with ciphertext stealing (CBC-CS3 per RFC 3962 §5:
    the last TWO blocks are swapped, the tail truncated).  ``data``
    must be >= one block (the confounder guarantees that)."""
    n = len(data)
    if n <= AES_BLOCK:
        # single block: plain CBC of the padded? RFC: exactly one block
        # encrypts as plain CBC (no stealing possible)
        if n != AES_BLOCK:
            raise ValueError("CTS needs >= one block")
        return _cbc_encrypt(key, iv, data)
    pad = (-n) % AES_BLOCK
    padded = data + bytes(pad)
    ct = _cbc_encrypt(key, iv, padded)
    if pad == 0 and n % AES_BLOCK == 0:
        # swap the last two blocks
        return ct[:-2 * AES_BLOCK] + ct[-AES_BLOCK:] + ct[-2 * AES_BLOCK:-AES_BLOCK]
    # steal: last full ct block becomes the (truncated) final block
    last = ct[-AES_BLOCK:]
    second_last = ct[-2 * AES_BLOCK:-AES_BLOCK]
    tail_len = n % AES_BLOCK
    return ct[:-2 * AES_BLOCK] + last + second_last[:tail_len]


def cts_decrypt(key: bytes, data: bytes, iv: bytes = bytes(16)) -> bytes:
    n = len(data)
    if n == AES_BLOCK:
        return _cbc_decrypt(key, iv, data)
    if n < AES_BLOCK:
        raise ValueError("ciphertext shorter than one block")
    tail_len = n % AES_BLOCK or AES_BLOCK
    head = data[: n - AES_BLOCK - tail_len]
    c_last_full = data[n - AES_BLOCK - tail_len: n - tail_len]
    c_tail = data[n - tail_len:]
    dec = _aes_ecb(key).decryptor()
    d_last = dec.update(c_last_full) + dec.finalize()
    # reconstruct the stolen block
    c_prev_full = c_tail + d_last[tail_len:]
    # standard CBC over head || c_prev_full || c_last_full
    ct = head + c_prev_full + c_last_full
    pt = _cbc_decrypt(key, iv, ct)
    return pt[: n]


def pbkdf2_sha1(password: bytes, salt: bytes, iterations: int,
                nbytes: int) -> bytes:
    return hashlib.pbkdf2_hmac("sha1", password, salt, iterations, nbytes)


@functools.lru_cache(maxsize=4096)
def dk(key: bytes, constant: bytes) -> bytes:
    """RFC 3961 §5.1 DK: derive a key from ``key`` and a usage constant
    (DR via n-fold + chained AES-ECB encryption for simplified profile).

    Memoized: DK is a pure function and every wire message re-derives
    the same (key, usage) triples — without the cache the per-message
    derivation dominates the SASL/GSSAPI handshake wall (guide §4.5:
    heavyweight init once)."""
    if len(constant) != AES_BLOCK:
        constant = nfold(constant, AES_BLOCK)
    out = b""
    block = constant
    enc = None
    while len(out) < len(key):
        from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

        enc = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
        block = enc.update(block) + enc.finalize()
        out += block
    return out[: len(key)]


@functools.lru_cache(maxsize=256)
def string_to_key(password: str, salt: str, iterations: int = 4096,
                  keylen: int = 32) -> bytes:
    """RFC 3962 §4: PBKDF2-HMAC-SHA1 then DK with constant "kerberos".

    Memoized (pure function): the KDC re-derives the same principal
    keys on every AS/TGS request and each client connection re-derives
    its own — 4096 PBKDF2 iterations per call otherwise."""
    tkey = pbkdf2_sha1(password.encode("utf-8"), salt.encode("utf-8"),
                       iterations, keylen)
    return dk(tkey, b"kerberos")


def _usage_keys(key: bytes, usage: int) -> tuple[bytes, bytes, bytes]:
    """(Ke, Ki, Kc) for a key-usage number (RFC 3961 simplified profile:
    usage || 0xAA for encryption, || 0x55 for integrity, || 0x99 for
    checksum)."""
    u = struct.pack(">i", usage)
    return (dk(key, u + b"\xaa"), dk(key, u + b"\x55"), dk(key, u + b"\x99"))


def encrypt(key: bytes, usage: int, plaintext: bytes,
            confounder: bytes | None = None) -> bytes:
    """RFC 3961 simplified-profile encrypt: CTS(Ke, confounder || data)
    || HMAC-SHA1-96(Ki, confounder || data)."""
    ke, ki, _ = _usage_keys(key, usage)
    conf = confounder if confounder is not None else os.urandom(AES_BLOCK)
    body = conf + plaintext
    ct = cts_encrypt(ke, body)
    mac = hmac.new(ki, body, hashlib.sha1).digest()[:12]
    return ct + mac


def decrypt(key: bytes, usage: int, ciphertext: bytes) -> bytes:
    ke, ki, _ = _usage_keys(key, usage)
    if len(ciphertext) < AES_BLOCK + 12:
        raise ValueError("ciphertext too short")
    ct, mac = ciphertext[:-12], ciphertext[-12:]
    body = cts_decrypt(ke, ct)
    expect = hmac.new(ki, body, hashlib.sha1).digest()[:12]
    if not hmac.compare_digest(mac, expect):
        raise ValueError("kerberos integrity check failed")
    return body[AES_BLOCK:]


def checksum(key: bytes, usage: int, data: bytes) -> bytes:
    """HMAC-SHA1-96 keyed with Kc (cksumtype 16)."""
    _, _, kc = _usage_keys(key, usage)
    return hmac.new(kc, data, hashlib.sha1).digest()[:12]
