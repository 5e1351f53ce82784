"""MySQL wire-protocol client: handshake, auth, COM_QUERY, resultsets.

The shape of what go-sql-driver does for `pkg/sink/mysql`: dial, read
HandshakeV10, answer HandshakeResponse41 with a mysql_native_password
token, then issue COM_QUERY — single statements or ';\n'-joined
multi-statement batches (CLIENT_MULTI_STATEMENTS), consuming the chained
OK results. Used by sinks/mysql_live.py from executor Python workers.
"""

from __future__ import annotations

import socket

from ticdc_spark.codec import mysql_wire as mw

CLIENT_CAPS = (
    mw.CLIENT_LONG_PASSWORD
    | mw.CLIENT_PROTOCOL_41
    | mw.CLIENT_TRANSACTIONS
    | mw.CLIENT_SECURE_CONNECTION
    | mw.CLIENT_MULTI_STATEMENTS
    | mw.CLIENT_MULTI_RESULTS
    | mw.CLIENT_PLUGIN_AUTH
)


class Resultset:
    __slots__ = ("columns", "types", "rows")

    def __init__(self, columns: list[str], types: list[int], rows: list[list]):
        self.columns = columns
        self.types = types
        self.rows = rows


class _BufferedRecvSock:
    """Read-buffered socket adapter: one 64 KiB recv services many
    packet reads.  Draining a 256-statement batch's OK chain costs 2
    recv syscalls per packet otherwise (header + payload) — the
    dominant client-side cost of the applier loop.  Writes pass
    through unbuffered (the protocol is request→response; every write
    happens with the read buffer drained)."""

    __slots__ = ("_sock", "_buf", "_pos")

    def __init__(self, sock):
        self._sock = sock
        self._buf = b""
        self._pos = 0

    def recv(self, n: int) -> bytes:
        if self._pos >= len(self._buf):
            self._buf = self._sock.recv(65536)
            self._pos = 0
            if not self._buf:
                return b""
        take = self._buf[self._pos:self._pos + n]
        self._pos += len(take)
        return take

    def read_exact(self, n: int) -> bytes | None:
        """Exactly-n read (fast path used by mysql_wire.read_packet —
        one call per packet instead of a recv loop per field)."""
        buf, pos = self._buf, self._pos
        if pos + n <= len(buf):
            self._pos = pos + n
            return buf[pos:pos + n]
        parts = [buf[pos:]]
        need = n - (len(buf) - pos)
        self._buf = b""
        self._pos = 0
        while need > 0:
            chunk = self._sock.recv(65536)
            if not chunk:
                return None
            if len(chunk) > need:
                parts.append(chunk[:need])
                self._buf = chunk
                self._pos = need
                need = 0
                break
            parts.append(chunk)
            need -= len(chunk)
        return b"".join(parts)

    def sendall(self, data) -> None:
        self._sock.sendall(data)

    def close(self) -> None:
        self._sock.close()

    def __getattr__(self, name):  # e.g. .version() on a TLS socket
        return getattr(self._sock, name)


class MySQLConn:
    def __init__(self, host: str, port: int, user: str, password: str,
                 timeout: float = 60.0, tls_ca: bytes | None = None,
                 tls_client_cert: tuple[bytes, bytes] | None = None):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        got = mw.read_packet(self.sock)
        if got is None:
            raise IOError("server closed during handshake")
        seq, payload = got
        if payload[:1] == b"\xff":
            raise mw.dec_err(payload)
        hs = mw.dec_handshake_v10(payload)
        plugin = hs["auth_plugin"] or mw.AUTH_PLUGIN
        if plugin not in (mw.AUTH_PLUGIN, mw.AUTH_PLUGIN_CACHING_SHA2):
            raise IOError(f"unsupported auth plugin {hs['auth_plugin']}")
        caps = CLIENT_CAPS
        if tls_ca is not None:
            # Protocol::SSLRequest then upgrade — credentials only ever
            # ride the encrypted stream (the ssl-ca client option)
            if not hs["capabilities"] & mw.CLIENT_SSL:
                raise IOError("server does not support SSL")
            caps |= mw.CLIENT_SSL
            seq = mw.write_packet(self.sock, seq + 1, mw.enc_ssl_request(caps))
            from ticdc_spark.codec.tlsutil import client_context

            cert, key = tls_client_cert or (None, None)
            self.sock = client_context(tls_ca, cert, key).wrap_socket(
                self.sock, server_hostname=host)
            seq -= 1  # the response continues the same packet sequence
        seq = mw.write_packet(
            self.sock, seq + 1,
            mw.enc_handshake_response41(user, password, hs["nonce"], None,
                                        caps, plugin=plugin),
        )
        self._auth_loop(password, hs["nonce"], plugin,
                        secure=tls_ca is not None)
        self.server_version = hs["version"]
        self.thread_id = hs["thread_id"]
        # post-auth the conversation is strict request→response:
        # buffer reads so a batch's OK chain drains in O(1) syscalls
        self.sock = _BufferedRecvSock(self.sock)

    def _auth_loop(self, password: str, nonce: bytes, plugin: bytes,
                   secure: bool) -> None:
        """Drive the post-HandshakeResponse auth conversation: OK/ERR,
        AuthSwitchRequest (0xFE), and caching_sha2's AuthMoreData (0x01)
        fast/full legs — cleartext over TLS, RSA public key otherwise
        (the stock MySQL 8 + go-sql-driver exchange)."""
        while True:
            got = mw.read_packet(self.sock)
            if got is None:
                raise IOError("server closed during auth")
            seq_in, payload = got
            if payload[:1] == b"\xff":
                raise mw.dec_err(payload)
            if payload[:1] == b"\x00":
                return  # OK
            if payload[:1] == b"\xfe":  # AuthSwitchRequest
                plugin, nonce = mw.dec_auth_switch_request(payload)
                if plugin not in (mw.AUTH_PLUGIN,
                                  mw.AUTH_PLUGIN_CACHING_SHA2):
                    raise IOError(f"unsupported auth switch to {plugin!r}")
                mw.write_packet(self.sock, seq_in + 1,
                                mw.scramble_for(plugin, password, nonce))
                continue
            if payload[:1] == b"\x01":  # AuthMoreData
                status = payload[1] if len(payload) > 1 else -1
                if status == mw.SHA2_FAST_AUTH_SUCCESS:
                    continue  # OK packet follows
                if status == mw.SHA2_PERFORM_FULL_AUTH:
                    if secure:
                        # TLS stream: cleartext password, NUL-terminated
                        mw.write_packet(self.sock, seq_in + 1,
                                        password.encode("utf-8") + b"\x00")
                    else:
                        # request the server RSA public key, then send
                        # OAEP(xor-masked password)
                        seq = mw.write_packet(
                            self.sock, seq_in + 1,
                            bytes([mw.SHA2_REQUEST_PUBLIC_KEY]))
                        got = mw.read_packet(self.sock)
                        if got is None:
                            raise IOError("server closed during full auth")
                        s_in, key_payload = got
                        if key_payload[:1] != b"\x01":
                            raise IOError("expected AuthMoreData public key")
                        mw.write_packet(
                            self.sock, s_in + 1,
                            mw.rsa_encrypt_password(
                                key_payload[1:], password, nonce))
                    continue
                raise IOError(f"unexpected AuthMoreData status {status}")
            raise IOError(f"unexpected auth packet {payload[:1]!r}")

    def close(self):
        try:
            mw.write_packet(self.sock, 0, b"\x01")  # COM_QUIT
        except OSError:
            pass
        try:
            self.sock.close()
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- queries

    def _read_result(self) -> tuple[dict | Resultset, bool]:
        """One result (OK or resultset); returns (result, more_follow)."""
        got = mw.read_packet(self.sock)
        if got is None:
            raise IOError("connection closed mid-result")
        _, payload = got
        if payload[:1] == b"\xff":
            raise mw.dec_err(payload)
        if payload[:1] == b"\x00":
            ok = mw.dec_ok(payload)
            return ok, bool(ok["status"] & mw.SERVER_MORE_RESULTS_EXISTS)
        n_cols, _ = mw.dec_lenenc_int(payload, 0)
        cols, types = [], []
        for _ in range(n_cols):
            _, p = mw.read_packet(self.sock)
            cd = mw.dec_column_def(p)
            cols.append(cd["name"])
            types.append(cd["type"])
        _, p = mw.read_packet(self.sock)  # EOF after defs
        rows = []
        status = 0
        while True:
            _, p = mw.read_packet(self.sock)
            if p[:1] == b"\xff":
                raise mw.dec_err(p)
            if p[:1] == b"\xfe" and len(p) < 9:  # EOF
                import struct as _s

                status = _s.unpack_from("<H", p, 3)[0]
                break
            raw = mw.dec_text_row(p, n_cols)
            rows.append([_convert(v, t) for v, t in zip(raw, types)])
        return Resultset(cols, types, rows), bool(status & mw.SERVER_MORE_RESULTS_EXISTS)

    def query(self, sql: str):
        """Run one statement; returns OK dict or Resultset."""
        mw.write_packet(self.sock, 0, b"\x03" + sql.encode("utf-8"))
        result, more = self._read_result()
        while more:  # drain unexpected extra results
            _, more = self._read_result()
        return result

    def execute_batch(self, statements: list[str]) -> int:
        """';\n'-joined multi-statement COM_QUERY; returns total affected.
        Raises MySQLError on the first failing statement (like the
        reference's per-txn retry unit)."""
        if not statements:
            return 0
        mw.write_packet(self.sock, 0, b"\x03" + ";\n".join(statements).encode("utf-8"))
        total = 0
        more = True
        while more:
            result, more = self._read_result()
            if isinstance(result, dict):
                total += result["affected"]
        return total


def _convert(v: bytes | None, col_type: int):
    if v is None:
        return None
    if col_type == mw.MYSQL_TYPE_LONGLONG:
        return int(v)
    if col_type == mw.MYSQL_TYPE_DOUBLE:
        return float(v)
    return v.decode("utf-8")


# -- prepared statements (the go-sql-driver DML path: query + args)


def prepare(conn: MySQLConn, sql: str) -> tuple[int, int]:
    """COM_STMT_PREPARE -> (stmt_id, n_params)."""
    mw.write_packet(conn.sock, 0, bytes([mw.COM_STMT_PREPARE]) + sql.encode("utf-8"))
    got = mw.read_packet(conn.sock)
    if got is None:
        raise IOError("connection closed during prepare")
    _, payload = got
    if payload[:1] == b"\xff":
        raise mw.dec_err(payload)
    stmt_id, n_cols, n_params = mw.dec_stmt_prepare_ok(payload)
    for _ in range(n_params + (1 if n_params else 0)):  # param defs + EOF
        mw.read_packet(conn.sock)
    for _ in range(n_cols + (1 if n_cols else 0)):  # column defs + EOF
        mw.read_packet(conn.sock)
    return stmt_id, n_params


def send_long_data(conn: MySQLConn, stmt_id: int, param_id: int,
                   data: bytes | str, chunk_size: int = 256 * 1024) -> None:
    """COM_STMT_SEND_LONG_DATA: stream one parameter's value in chunks
    ahead of the execute — the go-sql-driver path for args above
    maxAllowedPacket.  No responses to read (per protocol)."""
    b = data.encode("utf-8") if isinstance(data, str) else bytes(data)
    for i in range(0, max(len(b), 1), chunk_size):
        mw.write_packet(conn.sock, 0, mw.enc_stmt_send_long_data(
            stmt_id, param_id, b[i:i + chunk_size]))


def reset_prepared(conn: MySQLConn, stmt_id: int) -> None:
    """COM_STMT_RESET: drop accumulated long data -> OK."""
    mw.write_packet(conn.sock, 0, bytes([mw.COM_STMT_RESET])
                    + stmt_id.to_bytes(4, "little"))
    got = mw.read_packet(conn.sock)
    if got is None:
        raise IOError("connection closed during reset")
    _, payload = got
    if payload[:1] == b"\xff":
        raise mw.dec_err(payload)


def execute_prepared(conn: MySQLConn, stmt_id: int, params: list,
                     long_data_threshold: int | None = None) -> int:
    """COM_STMT_EXECUTE with binary-bound args -> affected rows.

    With ``long_data_threshold``, string/bytes params at or above the
    threshold are streamed through COM_STMT_SEND_LONG_DATA first and
    omitted from the execute packet's value list (typed BLOB), exactly
    like a real driver keeps each packet under maxAllowedPacket."""
    long_idx: set[int] = set()
    if long_data_threshold is not None:
        for i, v in enumerate(params):
            if (isinstance(v, (str, bytes, bytearray))
                    and len(v) >= long_data_threshold):
                send_long_data(conn, stmt_id, i, v)
                long_idx.add(i)
    mw.write_packet(conn.sock, 0, mw.enc_stmt_execute(
        stmt_id, params, long_data_params=long_idx))
    got = mw.read_packet(conn.sock)
    if got is None:
        raise IOError("connection closed during execute")
    _, payload = got
    if payload[:1] == b"\xff":
        raise mw.dec_err(payload)
    return mw.dec_ok(payload)["affected"]


def close_prepared(conn: MySQLConn, stmt_id: int) -> None:
    mw.write_packet(conn.sock, 0, bytes([mw.COM_STMT_CLOSE])
                    + stmt_id.to_bytes(4, "little"))
