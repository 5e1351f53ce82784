"""Kerberos 5 message codec (RFC 4120) — the subset a SASL/GSSAPI
client/acceptor pair and an in-process KDC need:

AS-REQ/AS-REP (PA-ENC-TIMESTAMP preauth), TGS-REQ/TGS-REP (PA-TGS-REQ
carrying an AP-REQ), Ticket/EncTicketPart, AP-REQ/Authenticator,
AP-REP/EncAPRepPart, KRB-ERROR — DER encoded with a purpose-built
minimal encoder/decoder (definite lengths only, the universal types
Kerberos uses).

All from RFC 4120's ASN.1 modules; crypto via codec/krb5crypto.py
(aes256-cts-hmac-sha1-96).  No reference code consulted.
"""

from __future__ import annotations

from ticdc_spark.codec import krb5crypto as kc

PVNO = 5
NT_PRINCIPAL = 1
NT_SRV_INST = 2

MSG_AS_REQ = 10
MSG_AS_REP = 11
MSG_TGS_REQ = 12
MSG_TGS_REP = 13
MSG_AP_REQ = 14
MSG_AP_REP = 15
MSG_ERROR = 30

PA_TGS_REQ = 1
PA_ENC_TIMESTAMP = 2

KDC_ERR_PREAUTH_FAILED = 24
KDC_ERR_PREAUTH_REQUIRED = 25
KDC_ERR_C_PRINCIPAL_UNKNOWN = 6
KDC_ERR_S_PRINCIPAL_UNKNOWN = 7
KRB_AP_ERR_BAD_INTEGRITY = 31
KRB_AP_ERR_MODIFIED = 41

# a deterministic clock for tickets/authenticators (the container has
# no KDC clock-skew story to exercise; a real deployment stamps wall
# time — pinned like the S3 client's amz_date)
FIXED_TIME = "20260101000000Z"
FIXED_END = "20370101000000Z"


# ------------------------------------------------------------------- DER


def _len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    body = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(body)]) + body


def tlv(tag: int, content: bytes) -> bytes:
    return bytes([tag]) + _len(len(content)) + content


def ctx(n: int, content: bytes) -> bytes:
    """Explicit context tag [n] (constructed)."""
    return tlv(0xA0 | n, content)


def app(n: int, content: bytes) -> bytes:
    """APPLICATION n (constructed)."""
    return tlv(0x60 | n, content)


def der_int(v: int) -> bytes:
    if v == 0:
        return tlv(0x02, b"\x00")
    out = v.to_bytes((v.bit_length() + 8) // 8, "big", signed=True)
    # minimal form
    while len(out) > 1 and out[0] == 0 and not out[1] & 0x80:
        out = out[1:]
    return tlv(0x02, out)


def der_octets(b: bytes) -> bytes:
    return tlv(0x04, b)


def der_genstr(s: str) -> bytes:
    return tlv(0x1B, s.encode("utf-8"))


def der_gentime(s: str) -> bytes:
    return tlv(0x18, s.encode("ascii"))


def der_seq(*parts: bytes) -> bytes:
    return tlv(0x30, b"".join(parts))


def der_bits(b: bytes) -> bytes:
    return tlv(0x03, b"\x00" + b)  # 0 unused bits


def der_bool(v: bool) -> bytes:
    return tlv(0x01, b"\xff" if v else b"\x00")


class Der:
    """Tiny DER walker: ``parse`` one TLV, ``children`` of a constructed
    node, context-tag lookup."""

    @staticmethod
    def parse(buf: bytes, pos: int = 0) -> tuple[int, bytes, int]:
        tag = buf[pos]
        n = buf[pos + 1]
        pos += 2
        if n & 0x80:
            nlen = n & 0x7F
            n = int.from_bytes(buf[pos:pos + nlen], "big")
            pos += nlen
        return tag, buf[pos:pos + n], pos + n

    @staticmethod
    def children(content: bytes) -> list[tuple[int, bytes]]:
        out = []
        pos = 0
        while pos < len(content):
            tag, val, pos = Der.parse(content, pos)
            out.append((tag, val))
        return out

    @staticmethod
    def fields(content: bytes) -> dict[int, bytes]:
        """Context-tagged fields of a SEQUENCE body -> {n: inner TLV}."""
        out = {}
        for tag, val in Der.children(content):
            if tag & 0xE0 == 0xA0:
                out[tag & 0x1F] = val
        return out

    @staticmethod
    def unwrap(content: bytes) -> tuple[int, bytes]:
        tag, val, _ = Der.parse(content)
        return tag, val

    @staticmethod
    def int_(tlv_bytes: bytes) -> int:
        tag, val = Der.unwrap(tlv_bytes)
        return int.from_bytes(val, "big", signed=True)

    @staticmethod
    def octets(tlv_bytes: bytes) -> bytes:
        return Der.unwrap(tlv_bytes)[1]

    @staticmethod
    def genstr(tlv_bytes: bytes) -> str:
        return Der.unwrap(tlv_bytes)[1].decode("utf-8")


# --------------------------------------------------------------- pieces


def principal(name: str, name_type: int = NT_PRINCIPAL) -> bytes:
    """PrincipalName from "comp1/comp2" text."""
    comps = name.split("/")
    return der_seq(
        ctx(0, der_int(name_type)),
        ctx(1, der_seq(*[der_genstr(c) for c in comps])),
    )


def principal_text(pn_tlv: bytes) -> str:
    _, body = Der.unwrap(pn_tlv)
    f = Der.fields(body)
    _, comps = Der.unwrap(f[1])
    return "/".join(v.decode("utf-8") for _t, v in Der.children(comps))


def enc_key(keytype: int, keyvalue: bytes) -> bytes:
    return der_seq(ctx(0, der_int(keytype)), ctx(1, der_octets(keyvalue)))


def dec_key(key_tlv: bytes) -> tuple[int, bytes]:
    _, body = Der.unwrap(key_tlv)
    f = Der.fields(body)
    return Der.int_(f[0]), Der.octets(f[1])


def encrypted_data(etype: int, kvno: int | None, cipher: bytes) -> bytes:
    parts = [ctx(0, der_int(etype))]
    if kvno is not None:
        parts.append(ctx(1, der_int(kvno)))
    parts.append(ctx(2, der_octets(cipher)))
    return der_seq(*parts)


def dec_encrypted_data(ed_tlv: bytes) -> tuple[int, bytes]:
    _, body = Der.unwrap(ed_tlv)
    f = Der.fields(body)
    return Der.int_(f[0]), Der.octets(f[2])


def ticket(realm: str, sname: str, enc_part: bytes) -> bytes:
    """Ticket (APPLICATION 1); enc_part = EncryptedData TLV."""
    return app(1, der_seq(
        ctx(0, der_int(5)),
        ctx(1, der_genstr(realm)),
        ctx(2, principal(sname, NT_SRV_INST)),
        ctx(3, enc_part),
    ))


def dec_ticket(tkt_tlv: bytes) -> dict:
    tag, body = Der.unwrap(tkt_tlv)
    assert tag == 0x61, f"not a Ticket: tag {tag:#x}"
    _, seq = Der.unwrap(body)
    f = Der.fields(seq)
    return {
        "realm": Der.genstr(f[1]),
        "sname": principal_text(f[2]),
        "enc_part": f[3],
    }


def enc_ticket_part(session_key: bytes, crealm: str, cname: str,
                    etype: int = kc.ETYPE_AES256_CTS_HMAC_SHA1) -> bytes:
    """EncTicketPart (APPLICATION 3)."""
    return app(3, der_seq(
        ctx(0, der_bits(bytes(4))),  # flags
        ctx(1, enc_key(etype, session_key)),
        ctx(2, der_genstr(crealm)),
        ctx(3, principal(cname)),
        ctx(4, der_seq(ctx(0, der_int(0)), ctx(1, der_octets(b"")))),
        ctx(5, der_gentime(FIXED_TIME)),
        ctx(7, der_gentime(FIXED_END)),
    ))


def dec_enc_ticket_part(buf: bytes) -> dict:
    tag, body = Der.unwrap(buf)
    assert tag == 0x63, f"not EncTicketPart: {tag:#x}"
    _, seq = Der.unwrap(body)
    f = Der.fields(seq)
    ktype, kval = dec_key(f[1])
    return {"keytype": ktype, "key": kval,
            "crealm": Der.genstr(f[2]), "cname": principal_text(f[3])}


def pa_enc_ts(key: bytes) -> bytes:
    """PA-ENC-TIMESTAMP padata value: EncryptedData(PA-ENC-TS-ENC)."""
    ts = der_seq(ctx(0, der_gentime(FIXED_TIME)), ctx(1, der_int(1)))
    cipher = kc.encrypt(key, kc.KU_AS_REQ_PA_ENC_TS, ts)
    return encrypted_data(kc.ETYPE_AES256_CTS_HMAC_SHA1, None, cipher)


def verify_pa_enc_ts(key: bytes, padata_value: bytes) -> bool:
    try:
        _etype, cipher = dec_encrypted_data(padata_value)
        kc.decrypt(key, kc.KU_AS_REQ_PA_ENC_TS, cipher)
        return True
    except ValueError:
        return False


def padata(pa_type: int, value: bytes) -> bytes:
    return der_seq(ctx(1, der_int(pa_type)), ctx(2, der_octets(value)))


def dec_padata(seq_body: bytes) -> list[tuple[int, bytes]]:
    out = []
    for _, item in Der.children(seq_body):
        f = Der.fields(item)
        out.append((Der.int_(f[1]), Der.octets(f[2])))
    return out


# ---------------------------------------------------------------- KDC-REQ


def kdc_req(msg_type: int, realm: str, sname: str,
            cname: str | None = None,
            padatas: list[tuple[int, bytes]] | None = None,
            nonce: int = 12345) -> bytes:
    body_parts = [ctx(0, der_bits(bytes(4)))]  # kdc-options
    if cname is not None:
        body_parts.append(ctx(1, principal(cname)))
    body_parts += [
        ctx(2, der_genstr(realm)),
        ctx(3, principal(sname, NT_SRV_INST)),
        ctx(5, der_gentime(FIXED_END)),  # till
        ctx(7, der_int(nonce)),
        ctx(8, der_seq(der_int(kc.ETYPE_AES256_CTS_HMAC_SHA1))),
    ]
    parts = [ctx(1, der_int(PVNO)), ctx(2, der_int(msg_type))]
    if padatas:
        parts.append(ctx(3, der_seq(
            *[padata(t, v) for t, v in padatas])))
    parts.append(ctx(4, der_seq(*body_parts)))
    return app(msg_type, der_seq(*parts))


def dec_kdc_req(buf: bytes) -> dict:
    tag, body = Der.unwrap(buf)
    msg_type = tag & 0x1F
    _, seq = Der.unwrap(body)
    f = Der.fields(seq)
    out: dict = {"msg_type": msg_type, "padata": []}
    if 3 in f:
        _, pa_seq = Der.unwrap(f[3])
        out["padata"] = dec_padata(pa_seq)
    _, rb = Der.unwrap(f[4])
    rf = Der.fields(rb)
    if 1 in rf:
        out["cname"] = principal_text(rf[1])
    out["realm"] = Der.genstr(rf[2])
    out["sname"] = principal_text(rf[3])
    out["nonce"] = Der.int_(rf[7])
    return out


# ---------------------------------------------------------------- KDC-REP


def kdc_rep(msg_type: int, crealm: str, cname: str, tkt: bytes,
            enc_part_cipher: bytes) -> bytes:
    return app(msg_type, der_seq(
        ctx(0, der_int(PVNO)),
        ctx(1, der_int(msg_type)),
        ctx(3, der_genstr(crealm)),
        ctx(4, principal(cname)),
        ctx(5, tkt),
        ctx(6, encrypted_data(kc.ETYPE_AES256_CTS_HMAC_SHA1, None,
                              enc_part_cipher)),
    ))


def dec_kdc_rep(buf: bytes) -> dict:
    tag, body = Der.unwrap(buf)
    msg_type = tag & 0x1F
    if msg_type == MSG_ERROR:
        raise KrbError(dec_krb_error(buf))
    _, seq = Der.unwrap(body)
    f = Der.fields(seq)
    return {
        "msg_type": msg_type,
        "crealm": Der.genstr(f[3]),
        "cname": principal_text(f[4]),
        "ticket": f[5],
        "enc_part": f[6],
    }


def enc_kdc_rep_part(msg_type: int, session_key: bytes, nonce: int,
                     srealm: str, sname: str) -> bytes:
    """EncASRepPart (APPLICATION 25) / EncTGSRepPart (APPLICATION 26)."""
    appno = 25 if msg_type == MSG_AS_REP else 26
    return app(appno, der_seq(
        ctx(0, enc_key(kc.ETYPE_AES256_CTS_HMAC_SHA1, session_key)),
        ctx(1, der_seq(der_seq(ctx(0, der_int(0)),
                               ctx(1, der_gentime(FIXED_TIME))))),
        ctx(2, der_int(nonce)),
        ctx(4, der_bits(bytes(4))),
        ctx(5, der_gentime(FIXED_TIME)),
        ctx(7, der_gentime(FIXED_END)),
        ctx(9, der_genstr(srealm)),
        ctx(10, principal(sname, NT_SRV_INST)),
    ))


def dec_kdc_rep_part(buf: bytes) -> dict:
    tag, body = Der.unwrap(buf)
    assert tag in (0x79, 0x7A), f"not EncKDCRepPart: {tag:#x}"
    _, seq = Der.unwrap(body)
    f = Der.fields(seq)
    _ktype, kval = dec_key(f[0])
    return {"key": kval, "nonce": Der.int_(f[2]),
            "srealm": Der.genstr(f[9]), "sname": principal_text(f[10])}


# ---------------------------------------------------------------- AP


def authenticator(crealm: str, cname: str, seq_number: int = 0,
                  cksum: bytes | None = None) -> bytes:
    """Authenticator (APPLICATION 2)."""
    parts = [
        ctx(0, der_int(PVNO)),
        ctx(1, der_genstr(crealm)),
        ctx(2, principal(cname)),
    ]
    if cksum is not None:
        parts.append(ctx(3, der_seq(ctx(0, der_int(0x8003)),
                                    ctx(1, der_octets(cksum)))))
    parts += [
        ctx(4, der_int(0)),  # cusec
        ctx(5, der_gentime(FIXED_TIME)),
        ctx(7, der_int(seq_number)),
    ]
    return app(2, der_seq(*parts))


def dec_authenticator(buf: bytes) -> dict:
    tag, body = Der.unwrap(buf)
    assert tag == 0x62, f"not an Authenticator: {tag:#x}"
    _, seq = Der.unwrap(body)
    f = Der.fields(seq)
    out = {"crealm": Der.genstr(f[1]), "cname": principal_text(f[2]),
           "seq": Der.int_(f[7]) if 7 in f else 0}
    return out


def ap_req(tkt: bytes, auth_cipher: bytes) -> bytes:
    """AP-REQ (APPLICATION 14); auth_cipher = encrypted Authenticator."""
    return app(MSG_AP_REQ, der_seq(
        ctx(0, der_int(PVNO)),
        ctx(1, der_int(MSG_AP_REQ)),
        ctx(2, der_bits(bytes(4))),  # ap-options
        ctx(3, tkt),
        ctx(4, encrypted_data(kc.ETYPE_AES256_CTS_HMAC_SHA1, None,
                              auth_cipher)),
    ))


def dec_ap_req(buf: bytes) -> dict:
    tag, body = Der.unwrap(buf)
    assert tag & 0x1F == MSG_AP_REQ, f"not AP-REQ: {tag:#x}"
    _, seq = Der.unwrap(body)
    f = Der.fields(seq)
    return {"ticket": f[3], "authenticator": f[4]}


def ap_rep(enc_cipher: bytes) -> bytes:
    return app(MSG_AP_REP, der_seq(
        ctx(0, der_int(PVNO)),
        ctx(1, der_int(MSG_AP_REP)),
        ctx(2, encrypted_data(kc.ETYPE_AES256_CTS_HMAC_SHA1, None,
                              enc_cipher)),
    ))


def dec_ap_rep(buf: bytes) -> bytes:
    tag, body = Der.unwrap(buf)
    assert tag & 0x1F == MSG_AP_REP, f"not AP-REP: {tag:#x}"
    _, seq = Der.unwrap(body)
    return Der.fields(seq)[2]


def enc_ap_rep_part(seq_number: int = 0) -> bytes:
    """EncAPRepPart (APPLICATION 27)."""
    return app(27, der_seq(
        ctx(0, der_gentime(FIXED_TIME)),
        ctx(1, der_int(0)),
        ctx(3, der_int(seq_number)),
    ))


def dec_enc_ap_rep_part(buf: bytes) -> dict:
    tag, body = Der.unwrap(buf)
    assert tag == 0x7B, f"not EncAPRepPart: {tag:#x}"
    _, seq = Der.unwrap(body)
    f = Der.fields(seq)
    return {"seq": Der.int_(f[3]) if 3 in f else 0}


# ---------------------------------------------------------------- errors


class KrbError(Exception):
    def __init__(self, info: dict):
        super().__init__(f"KRB-ERROR {info.get('error_code')}")
        self.info = info


def krb_error(error_code: int, realm: str = "", sname: str = "x") -> bytes:
    return app(MSG_ERROR, der_seq(
        ctx(0, der_int(PVNO)),
        ctx(1, der_int(MSG_ERROR)),
        ctx(5, der_gentime(FIXED_TIME)),
        ctx(6, der_int(0)),
        ctx(7, der_int(error_code)),
        ctx(9, der_genstr(realm)),
        ctx(10, principal(sname, NT_SRV_INST)),
    ))


def dec_krb_error(buf: bytes) -> dict:
    _, body = Der.unwrap(buf)
    _, seq = Der.unwrap(body)
    f = Der.fields(seq)
    return {"error_code": Der.int_(f[7])}


def default_salt(realm: str, principal_name: str) -> str:
    """MIT default salt: realm + name components concatenated."""
    return realm + principal_name.replace("/", "")
