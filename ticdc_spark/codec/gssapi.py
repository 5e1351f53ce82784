"""GSS-API Kerberos 5 mechanism tokens (RFC 4121) + the SASL GSSAPI
profile (RFC 4752) — what a Kafka client/broker pair exchanges inside
SaslAuthenticate when `sasl.mechanism=GSSAPI`.

- initial context token: 0x60 <len> <krb5 mech OID> TOK_ID 0x0100
  + AP-REQ (authenticator carries the 0x8003 GSS channel-binding
  checksum with the flags word)
- acceptor reply: ... TOK_ID 0x0200 + AP-REP
- per-message Wrap tokens (§4.2.6): 16-byte header
  (TOK_ID 0x0504 | flags | 0xFF | EC | RRC | SND_SEQ) with the sealed
  form enc(plaintext || header); RRC=0 (no rotation — a legal choice
  the emitter controls), acceptor/initiator seal keys (usage 22/24)
- RFC 4752 negotiation: acceptor wraps [layers, maxlen u24]; initiator
  wraps its choice; this pair speaks layer 0x01 (none) after auth,
  like sarama's default

From the public RFCs; crypto = codec/krb5crypto.py.
"""

from __future__ import annotations

import struct

from ticdc_spark.codec import krb5 as k
from ticdc_spark.codec import krb5crypto as kc

# 1.2.840.113554.1.2.2 (krb5 mechanism), DER-encoded OID
KRB5_OID = bytes.fromhex("06092a864886f712010202")

TOK_AP_REQ = b"\x01\x00"
TOK_AP_REP = b"\x02\x00"
TOK_WRAP = b"\x05\x04"

FLAG_SENT_BY_ACCEPTOR = 0x01
FLAG_SEALED = 0x02

# RFC 4121 §4.1.1 checksum flags word
GSS_C_MUTUAL = 0x02
GSS_C_CONF = 0x10
GSS_C_INTEG = 0x20

SEC_LAYER_NONE = 0x01


def frame_token(tok_id: bytes, inner: bytes) -> bytes:
    """RFC 2743 §3.1 InitialContextToken framing: [APPLICATION 0] with
    the mech OID — used for the two context-establishment tokens."""
    body = KRB5_OID + tok_id + inner
    return k.tlv(0x60, body)


def parse_token(buf: bytes) -> tuple[bytes, bytes]:
    """-> (tok_id, inner)."""
    tag, body, _ = k.Der.parse(buf)
    if tag != 0x60:
        raise ValueError(f"not a GSS token: tag {tag:#x}")
    if not body.startswith(KRB5_OID):
        raise ValueError("unknown GSS mechanism OID")
    rest = body[len(KRB5_OID):]
    return rest[:2], rest[2:]


def gss_checksum(flags: int = GSS_C_MUTUAL | GSS_C_CONF | GSS_C_INTEG) -> bytes:
    """The 0x8003 authenticator checksum: Lgth=16, zero channel
    bindings, flags."""
    return struct.pack("<I", 16) + bytes(16) + struct.pack("<I", flags)


def init_context_token(ticket: bytes, session_key: bytes, crealm: str,
                       cname: str, seq: int = 0) -> bytes:
    auth = k.authenticator(crealm, cname, seq_number=seq,
                           cksum=gss_checksum())
    apq = k.ap_req(ticket, kc.encrypt(
        session_key, kc.KU_AP_REQ_AUTHENTICATOR, auth))
    return frame_token(TOK_AP_REQ, apq)


def accept_context_token(token: bytes, service_key: bytes) -> tuple[bytes, dict, bytes]:
    """Acceptor side: verify AP-REQ -> (session_key, client info,
    AP-REP reply token)."""
    tok_id, inner = parse_token(token)
    if tok_id != TOK_AP_REQ:
        raise ValueError(f"expected AP-REQ token, got {tok_id.hex()}")
    apq = k.dec_ap_req(inner)
    tkt = k.dec_ticket(apq["ticket"])
    _, tkt_cipher = k.dec_encrypted_data(tkt["enc_part"])
    info = k.dec_enc_ticket_part(kc.decrypt(
        service_key, kc.KU_KDC_REP_TICKET, tkt_cipher))
    _, auth_cipher = k.dec_encrypted_data(apq["authenticator"])
    auth = k.dec_authenticator(kc.decrypt(
        info["key"], kc.KU_AP_REQ_AUTHENTICATOR, auth_cipher))
    if auth["cname"] != info["cname"]:
        raise ValueError("authenticator/ticket principal mismatch")
    rep = k.ap_rep(kc.encrypt(info["key"], kc.KU_AP_REP_ENC_PART,
                              k.enc_ap_rep_part(auth["seq"])))
    return info["key"], info, frame_token(TOK_AP_REP, rep)


def check_ap_rep(token: bytes, session_key: bytes) -> int:
    tok_id, inner = parse_token(token)
    if tok_id != TOK_AP_REP:
        raise ValueError(f"expected AP-REP token, got {tok_id.hex()}")
    _, cipher = k.dec_encrypted_data(k.dec_ap_rep(inner))
    return k.dec_enc_ap_rep_part(kc.decrypt(
        session_key, kc.KU_AP_REP_ENC_PART, cipher))["seq"]


def wrap(key: bytes, data: bytes, acceptor: bool, seq: int = 0) -> bytes:
    """Sealed Wrap token: header || enc(data || header)."""
    flags = FLAG_SEALED | (FLAG_SENT_BY_ACCEPTOR if acceptor else 0)
    header = TOK_WRAP + bytes([flags, 0xFF]) + struct.pack(">HHQ", 0, 0, seq)
    usage = kc.KU_GSS_ACCEPTOR_SEAL if acceptor else kc.KU_GSS_INITIATOR_SEAL
    return header + kc.encrypt(key, usage, data + header)


def unwrap(key: bytes, token: bytes, from_acceptor: bool) -> bytes:
    if token[:2] != TOK_WRAP:
        raise ValueError(f"not a Wrap token: {token[:2].hex()}")
    flags = token[2]
    if bool(flags & FLAG_SENT_BY_ACCEPTOR) != from_acceptor:
        raise ValueError("wrap token direction mismatch")
    if not flags & FLAG_SEALED:
        raise ValueError("expected a sealed wrap token")
    usage = (kc.KU_GSS_ACCEPTOR_SEAL if from_acceptor
             else kc.KU_GSS_INITIATOR_SEAL)
    body = kc.decrypt(key, usage, token[16:])
    data, trailer = body[:-16], body[-16:]
    if trailer != token[:16]:
        raise ValueError("wrap token header mismatch")
    return data


def sec_layer_offer(key: bytes, layers: int = SEC_LAYER_NONE,
                    max_len: int = 0x100000) -> bytes:
    """RFC 4752 acceptor offer: wrapped [layers u8 | max u24]."""
    return wrap(key, bytes([layers]) + struct.pack(">I", max_len)[1:],
                acceptor=True)


def sec_layer_choice(key: bytes, offer_token: bytes,
                     want: int = SEC_LAYER_NONE) -> bytes:
    data = unwrap(key, offer_token, from_acceptor=True)
    layers = data[0]
    if not layers & want:
        raise ValueError(f"server offers layers {layers:#x}, want {want:#x}")
    return wrap(key, bytes([want]) + data[1:4], acceptor=False)


def verify_sec_layer_choice(key: bytes, choice_token: bytes,
                            offered: int = SEC_LAYER_NONE) -> int:
    data = unwrap(key, choice_token, from_acceptor=False)
    choice = data[0]
    if not choice & offered:
        raise ValueError(f"client chose unoffered layer {choice:#x}")
    return choice
