"""PostgreSQL logical-replication slot client — the NETWORK half of the
pgoutput source.

:mod:`.pgoutput` implements the logical-replication MESSAGE format (the
payload a slot delivers); this module implements the protocol that carries
it, per the public PostgreSQL frontend/backend protocol documentation
("Message Formats" + "Streaming Replication Protocol"):

* frontend/backend framing: type byte + Int32 length (length includes
  itself) + body;
* ``START_REPLICATION SLOT <slot> LOGICAL <lsn> (proto_version '1',
  publication_names '<pub>')`` sent as a simple Query, answered by
  CopyBothResponse ('W') and then a CopyData ('d') stream;
* XLogData ('w': Int64 walStart, Int64 walEnd, Int64 serverTime[µs since
  PG epoch], Byten payload) carrying the pgoutput messages;
* PrimaryKeepalive ('k': Int64 walEnd, Int64 serverTime, Byte
  replyRequested) — answered with StandbyStatusUpdate ('r': Int64
  written, Int64 flushed, Int64 applied, Int64 clientTime, Byte
  replyRequested) when a reply is requested, exactly the reference's
  keepalive handling (`/root/reference/pkg/postgres/source.go:132-152`);
* LSN text form ``hi/lo`` in hex (pglogrepl.ParseLSN analog).

The reference wires this through pglogrepl/pgconn
(`source.go:455-527` connect + StartReplication, `:597-621` checkpoint
resume via getStartingLSN); here the same loop runs over any connected
socket — in tests a mock WAL sender on a socketpair, in production a
socket to a real server (after the libpq startup/auth exchange, which is
out of scope in a sandbox with no Postgres; the replication sub-protocol
below is byte-faithful).

Checkpointing mirrors the reference's file checkpoint
(`pkg/replicator/checkpoint.go:103-117`): the flushed LSN is persisted
with an atomic tmp+rename after each commit, and a restart resumes from
it — the server then re-streams from that LSN, so an un-checkpointed
transaction replays and nothing is lost (at-least-once at the wire, made
exactly-once downstream by the LSN-keyed segment/offset layer).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import socket
import struct
import time

from librarian_spark.sources.pgoutput import PG_EPOCH_US, PgOutputDecoder

__all__ = [
    "lsn_str",
    "parse_lsn",
    "read_backend_message",
    "send_frontend_message",
    "encode_xlogdata",
    "encode_keepalive",
    "encode_standby_status",
    "parse_standby_status",
    "start_replication_query",
    "encode_startup_message",
    "parse_startup_message",
    "scram_salted_password",
    "scram_client_proof",
    "scram_server_signature",
    "start_tls",
    "ReplicationSlotClient",
]


# -- LSN text form ----------------------------------------------------------


def lsn_str(lsn: int) -> str:
    """64-bit LSN → Postgres ``hi/lo`` hex text (pglogrepl.LSN.String)."""
    return f"{lsn >> 32:X}/{lsn & 0xFFFFFFFF:X}"


def parse_lsn(s: str) -> int:
    hi, lo = s.split("/")
    return (int(hi, 16) << 32) | int(lo, 16)


# -- protocol framing -------------------------------------------------------


def _recv_exact(sock, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("connection closed mid-message")
        buf += chunk
    return buf


def read_backend_message(sock) -> tuple[bytes, bytes]:
    """One backend message → (type byte, body). Length includes itself."""
    tag = _recv_exact(sock, 1)
    (ln,) = struct.unpack(">I", _recv_exact(sock, 4))
    return tag, _recv_exact(sock, ln - 4)


def read_backend_message_idle(sock, idle_timeout: float):
    """Like :func:`read_backend_message` but returns None when NO message
    starts within ``idle_timeout``. The timeout is armed ONLY for the
    1-byte tag read (atomic: it either arrives or nothing was sent) — a
    naive timeout around the whole read would discard _recv_exact's
    partial buffer when it fired mid-message and resume parsing at a
    garbage offset, desynchronizing the stream. Once a tag byte arrives
    we are mid-message: a stall there is a dead peer, not idleness, so it
    raises ConnectionError (loud) instead of returning-as-idle (desync).
    Restores the socket's previous timeout before returning."""
    prev = sock.gettimeout()
    sock.settimeout(idle_timeout)
    try:
        try:
            tag = _recv_exact(sock, 1)
        except (TimeoutError, socket.timeout):
            return None
        sock.settimeout(max(60.0, idle_timeout))
        try:
            (ln,) = struct.unpack(">I", _recv_exact(sock, 4))
            return tag, _recv_exact(sock, ln - 4)
        except (TimeoutError, socket.timeout) as e:
            raise ConnectionError(
                "peer stalled mid-message; cannot resume parsing safely"
            ) from e
    finally:
        sock.settimeout(prev)


def send_frontend_message(sock, tag: bytes, body: bytes) -> None:
    sock.sendall(tag + struct.pack(">I", len(body) + 4) + body)


SSL_REQUEST_CODE = 80877103  # pg protocol 1234.5679 — SSLRequest


#: sslmode values the client implements (libpq's meaningful subset for a
#: replication client; allow/prefer are negotiation conveniences, not
#: security levels, and are intentionally absent)
SSL_MODES = ("disable", "require", "verify-ca", "verify-full")


def start_tls(sock, server_hostname: str | None = None,
              mode: str = "require", sslrootcert: str | None = None):
    """Upgrade a fresh PG connection to TLS — the SSLRequest dance libpq
    runs for sslmode != disable (PostgreSQL protocol docs, "SSL Session
    Encryption"; the reference gets this from pgconn via the conninfo
    sslmode): send the 8-byte SSLRequest BEFORE any startup message, read
    the server's one-byte verdict — ``S`` (proceed with TLS) wraps the
    socket, ``N`` (SSL not supported) raises, since the caller asked for
    encryption and silently continuing in cleartext is the downgrade
    attack sslmode=require exists to prevent. Modes (libpq semantics):
    ``require`` encrypts and trusts any cert (self-signed servers),
    ``verify-ca`` demands a trusted CA chain but not the hostname,
    ``verify-full`` demands both. Anything else raises — an unknown mode
    silently mapping to no-verification would be its own downgrade.
    ``sslrootcert`` is libpq's parameter of the same name: a PEM CA file
    to trust INSTEAD of the system store, which is how verify-ca /
    verify-full work against a self-signed or private-CA server (without
    it the only workable mode there is ``require``, which encrypts but
    authenticates nothing)."""
    import ssl

    if mode not in SSL_MODES or mode == "disable":
        raise ValueError(f"unsupported sslmode for start_tls: {mode!r}")
    sock.sendall(struct.pack(">II", 8, SSL_REQUEST_CODE))
    verdict = _recv_exact(sock, 1)
    if verdict != b"S":
        raise ConnectionError(
            f"server refused SSL (answered {verdict!r}); "
            "connect with sslmode=disable to use cleartext"
        )
    if mode == "verify-full":
        ctx = ssl.create_default_context(cafile=sslrootcert)
    elif mode == "verify-ca":
        ctx = ssl.create_default_context(cafile=sslrootcert)
        ctx.check_hostname = False  # CA chain yes, hostname no
    else:  # require
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    return ctx.wrap_socket(sock, server_hostname=server_hostname)


def start_replication_query(slot: str, lsn: int, publication: str) -> str:
    """The exact command pglogrepl.StartReplication issues for the
    reference's options (`source.go:498-504`)."""
    return (
        f"START_REPLICATION SLOT {slot} LOGICAL {lsn_str(lsn)} "
        f"(proto_version '1', publication_names '{publication}')"
    )


# -- startup + SASL/SCRAM auth (public PG protocol + RFC 5802/7677) ---------

_PROTOCOL_V3 = 196608  # 3.0


def encode_startup_message(
    user: str, database: str, replication: str | None = "database"
) -> bytes:
    """The StartupMessage — the ONLY frontend message with no type byte:
    Int32 length (incl. itself), Int32 protocol 3.0, then NUL-terminated
    key/value pairs and a final NUL. ``replication=database`` is what puts
    the connection in logical-replication mode, the exact parameter the
    reference's pgconn dial sets (`pkg/postgres/source.go:447-470`)."""
    kv: list[tuple[str, str]] = [("user", user), ("database", database)]
    if replication is not None:
        kv.append(("replication", replication))
    body = b"".join(
        k.encode() + b"\x00" + v.encode() + b"\x00" for k, v in kv
    ) + b"\x00"
    payload = struct.pack(">I", _PROTOCOL_V3) + body
    return struct.pack(">I", len(payload) + 4) + payload


def parse_startup_message(raw: bytes) -> dict[str, str]:
    """Body of a StartupMessage (after the length word) → parameter map."""
    (proto,) = struct.unpack_from(">I", raw, 0)
    if proto != _PROTOCOL_V3:
        raise ValueError(f"unsupported protocol {proto}")
    parts = raw[4:].split(b"\x00")
    out = {}
    for i in range(0, len(parts) - 1, 2):
        if not parts[i]:
            break
        out[parts[i].decode()] = parts[i + 1].decode()
    return out


def scram_salted_password(password: str, salt: bytes, iterations: int) -> bytes:
    """Hi() from RFC 5802 = PBKDF2-HMAC-SHA256."""
    return hashlib.pbkdf2_hmac(
        "sha256", password.encode("utf-8"), salt, iterations
    )


def _hmac(key: bytes, msg: str | bytes) -> bytes:
    if isinstance(msg, str):
        msg = msg.encode("utf-8")
    return hmac.new(key, msg, hashlib.sha256).digest()


def scram_client_proof(salted: bytes, auth_message: str) -> bytes:
    """ClientProof = ClientKey XOR HMAC(SHA256(ClientKey), AuthMessage)."""
    client_key = _hmac(salted, "Client Key")
    stored_key = hashlib.sha256(client_key).digest()
    sig = _hmac(stored_key, auth_message)
    return bytes(a ^ b for a, b in zip(client_key, sig))


def scram_server_signature(salted: bytes, auth_message: str) -> bytes:
    """ServerSignature = HMAC(HMAC(salted, "Server Key"), AuthMessage) —
    what the client MUST verify in the final message (mutual auth: a
    password-less MITM cannot forge it)."""
    return _hmac(_hmac(salted, "Server Key"), auth_message)


# Authentication request codes ('R' message, first Int32 of the body)
AUTH_OK = 0
AUTH_SASL = 10
AUTH_SASL_CONTINUE = 11
AUTH_SASL_FINAL = 12


# -- replication sub-frames (inside CopyData) -------------------------------


def encode_xlogdata(wal_start: int, wal_end: int, payload: bytes,
                    server_time_ms: int = 0) -> bytes:
    return b"w" + struct.pack(
        ">QQq", wal_start, wal_end, server_time_ms * 1000 - PG_EPOCH_US
    ) + payload


def encode_keepalive(wal_end: int, reply_requested: bool,
                     server_time_ms: int = 0) -> bytes:
    return b"k" + struct.pack(
        ">Qq?", wal_end, server_time_ms * 1000 - PG_EPOCH_US, reply_requested
    )


def encode_standby_status(written: int, flushed: int, applied: int,
                          client_time_ms: int, reply_requested: bool = False
                          ) -> bytes:
    return b"r" + struct.pack(
        ">QQQq?", written, flushed, applied,
        client_time_ms * 1000 - PG_EPOCH_US, reply_requested,
    )


def parse_standby_status(data: bytes) -> dict:
    """Body of an 'r' CopyData frame (tag byte already consumed or at [0])."""
    if data[:1] == b"r":
        data = data[1:]
    w, f, a, t, rr = struct.unpack(">QQQq?", data)
    return {
        "written": w,
        "flushed": f,
        "applied": a,
        "client_time_ms": (t + PG_EPOCH_US) // 1000,
        "reply_requested": rr,
    }


# -- the client -------------------------------------------------------------


class ReplicationSlotClient:
    """Consume a logical-replication stream over a connected socket.

    One instance per connection, like the reference Source: it owns a
    :class:`PgOutputDecoder` (relation registry + txn state) and a
    checkpoint file. ``stream()`` yields CDC rows; the flushed-LSN
    checkpoint advances only on Commit, so resume replays any transaction
    whose commit was never persisted.
    """

    def __init__(self, sock, slot: str, publication: str,
                 db: str = "postgres", checkpoint_path: str | None = None):
        self.sock = sock
        self.slot = slot
        self.publication = publication
        self.checkpoint_path = checkpoint_path
        self.decoder = PgOutputDecoder(db)
        self.flushed_lsn = 0
        self.received_lsn = 0

    @classmethod
    def dial(cls, dsn: str, sslmode: str = "disable",
             sslrootcert: str | None = None, **kw) -> "ReplicationSlotClient":
        """Live-socket construction (``host:port`` -> TCP): the mock-to-live
        switch is this one call — every protocol byte is identical.
        ``sslmode`` is the libpq subset that matters for a replication
        client (:data:`SSL_MODES`): ``disable`` (cleartext), ``require``
        (TLS, any cert), ``verify-ca`` (CA chain), ``verify-full``
        (CA chain + hostname). Unknown modes raise — a typo silently
        getting CERT_NONE would be the downgrade the modes exist to
        prevent."""
        from librarian_spark.sources.dial import dial as _dial, host_of

        if sslmode not in SSL_MODES:
            raise ValueError(
                f"unsupported sslmode {sslmode!r}; choose one of {SSL_MODES}"
            )
        sock = _dial(dsn)
        if sslmode != "disable":
            host = host_of(dsn)  # bracket-aware: correct SNI for [::1] too
            try:
                sock = start_tls(sock, server_hostname=host, mode=sslmode,
                                 sslrootcert=sslrootcert)
            except BaseException:
                sock.close()  # don't leak the TCP socket on 'N'/handshake fail
                raise
        return cls(sock, **kw)

    # -- checkpoint (atomic tmp+rename, checkpoint.go:103-117 parity) ------
    def load_checkpoint(self) -> int:
        if self.checkpoint_path and os.path.exists(self.checkpoint_path):
            with open(self.checkpoint_path, encoding="utf-8") as fh:
                return parse_lsn(fh.read().strip())
        return 0

    def save_checkpoint(self) -> None:
        if not self.checkpoint_path:
            return
        tmp = self.checkpoint_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(lsn_str(self.flushed_lsn))
            fh.flush()
            os.fsync(fh.fileno())  # the LSN is a durability promise
        os.replace(tmp, self.checkpoint_path)

    # -- startup + auth ------------------------------------------------------
    def startup(
        self,
        user: str,
        password: str | None = None,
        database: str | None = None,
        client_nonce: str | None = None,
        replication: str | None = "database",
    ) -> dict:
        """The connection-establishment half the reference gets from pgconn
        (`pkg/postgres/source.go:447-470`): StartupMessage with
        ``replication=database``, then the server's authentication
        sequence — AuthenticationOk directly (trust), or SCRAM-SHA-256
        (RFC 5802/7677) via SASLInitialResponse / SASLResponse with the
        server's signature VERIFIED (mutual auth) — then ParameterStatus /
        BackendKeyData are absorbed until ReadyForQuery. Returns
        {"parameters": {...}, "backend_pid": int|None}. After this the
        socket is ready for :meth:`start` (START_REPLICATION)."""
        db = database or self.decoder.db
        self.sock.sendall(encode_startup_message(user, db, replication))
        nonce = client_nonce or base64.b64encode(os.urandom(18)).decode()
        params: dict[str, str] = {}
        backend_pid: int | None = None
        while True:
            tag, body = read_backend_message(self.sock)
            if tag == b"E":
                raise ConnectionError(f"auth failed: {body!r}")
            if tag == b"R":
                (code,) = struct.unpack_from(">I", body, 0)
                if code == AUTH_OK:
                    continue
                if code == AUTH_SASL:
                    mechs = [
                        m.decode()
                        for m in body[4:].split(b"\x00")
                        if m
                    ]
                    if "SCRAM-SHA-256" not in mechs:
                        raise ConnectionError(
                            f"no common SASL mechanism in {mechs}"
                        )
                    if password is None:
                        raise ConnectionError(
                            "server requires SCRAM but no password given"
                        )
                    # client-first: gs2 header "n,," (no channel binding);
                    # PG takes the username from the startup message, so
                    # n= stays empty like libpq sends it
                    self._scram_first_bare = f"n=,r={nonce}"
                    first = "n,," + self._scram_first_bare
                    send_frontend_message(
                        self.sock, b"p",
                        b"SCRAM-SHA-256\x00"
                        + struct.pack(">i", len(first))
                        + first.encode(),
                    )
                    continue
                if code == AUTH_SASL_CONTINUE:
                    server_first = body[4:].decode()
                    attrs = dict(
                        kv.split("=", 1) for kv in server_first.split(",")
                    )
                    if not attrs["r"].startswith(nonce):
                        raise ConnectionError(
                            "server nonce does not extend the client nonce"
                        )
                    salted = scram_salted_password(
                        password, base64.b64decode(attrs["s"]),
                        int(attrs["i"]),
                    )
                    final_bare = f"c=biws,r={attrs['r']}"
                    auth_msg = (
                        f"{self._scram_first_bare},{server_first},"
                        f"{final_bare}"
                    )
                    proof = scram_client_proof(salted, auth_msg)
                    self._scram_expected_sig = scram_server_signature(
                        salted, auth_msg
                    )
                    final = (
                        f"{final_bare},"
                        f"p={base64.b64encode(proof).decode()}"
                    )
                    send_frontend_message(self.sock, b"p", final.encode())
                    continue
                if code == AUTH_SASL_FINAL:
                    attrs = dict(
                        kv.split("=", 1)
                        for kv in body[4:].decode().split(",")
                    )
                    got = base64.b64decode(attrs["v"])
                    if not hmac.compare_digest(
                        got, self._scram_expected_sig
                    ):
                        raise ConnectionError(
                            "server signature mismatch — not the server "
                            "that holds this password"
                        )
                    continue
                raise ConnectionError(f"unsupported auth request {code}")
            if tag == b"S":  # ParameterStatus
                k, v = body.split(b"\x00")[:2]
                params[k.decode()] = v.decode()
                continue
            if tag == b"K":  # BackendKeyData
                backend_pid = struct.unpack_from(">I", body, 0)[0]
                continue
            if tag == b"Z":  # ReadyForQuery — startup complete
                return {"parameters": params, "backend_pid": backend_pid}
            # NoticeResponse / NegotiateProtocolVersion etc: ignore

    # -- simple queries over the replication connection --------------------
    def simple_query(self, sql: str) -> list[tuple]:
        """Run one simple-protocol query on the replication connection —
        PostgreSQL allows plain SQL in logical walsender mode, which is how
        the reference drives DDL/metadata through its replication conn
        (`pkg/postgres/source.go:586` uses the same connection for
        CreateReplicationSlot). Returns DataRow values as text tuples."""
        send_frontend_message(self.sock, b"Q", sql.encode() + b"\x00")
        rows: list[tuple] = []
        err: bytes | None = None
        while True:
            tag, body = read_backend_message(self.sock)
            if tag == b"E":
                err = body
            elif tag == b"D":
                (n,) = struct.unpack_from(">H", body, 0)
                off, vals = 2, []
                for _ in range(n):
                    (ln,) = struct.unpack_from(">i", body, off)
                    off += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        vals.append(body[off : off + ln].decode())
                        off += ln
                rows.append(tuple(vals))
            elif tag == b"Z":
                if err is not None:
                    raise ConnectionError(f"query failed: {err!r}")
                return rows

    def query_with_cols(
        self, sql: str
    ) -> tuple[list[tuple[str, int]], list[tuple]]:
        """Like :meth:`simple_query` but also parse RowDescription ('T'):
        returns ([(column_name, type_oid), …], rows) with the whole result
        buffered. For unbounded results use :meth:`query_stream`."""
        cols, rows = self.query_stream(sql)
        return cols, list(rows)

    def query_stream(self, sql: str):
        """Streaming variant of :meth:`query_with_cols` for results that
        must not be buffered whole in driver memory (the initial-snapshot
        exporter's ``SELECT *`` over arbitrarily large tables): returns
        ``(cols, row_iter)`` where ``cols`` is ``[(name, type_oid), …]``
        and ``row_iter`` yields one text tuple per DataRow. The iterator
        MUST be consumed to completion (or the connection abandoned) —
        it owns the protocol state until ReadyForQuery."""
        send_frontend_message(self.sock, b"Q", sql.encode() + b"\x00")
        cols: list[tuple[str, int]] = []
        first_row: tuple | None = None
        # read until RowDescription (absorbing notices), grabbing an early
        # error before we hand out the iterator
        while True:
            tag, body = read_backend_message(self.sock)
            if tag == b"E":
                # drain to ReadyForQuery so the connection stays usable
                err = body
                while tag != b"Z":
                    tag, _ = read_backend_message(self.sock)
                raise ConnectionError(f"query failed: {err!r}")
            if tag == b"T":
                (nf,) = struct.unpack_from(">H", body, 0)
                off = 2
                for _ in range(nf):
                    end = body.index(b"\x00", off)
                    name = body[off:end].decode()
                    off = end + 1
                    (typoid,) = struct.unpack_from(">I", body, off + 6)
                    off += 18
                    cols.append((name, typoid))
                break
            if tag == b"Z":  # statement with no result set
                return cols, iter(())

        def _parse_datarow(body: bytes) -> tuple:
            (n,) = struct.unpack_from(">H", body, 0)
            off, vals = 2, []
            for _ in range(n):
                (ln,) = struct.unpack_from(">i", body, off)
                off += 4
                if ln == -1:
                    vals.append(None)
                else:
                    vals.append(body[off : off + ln].decode())
                    off += ln
            return tuple(vals)

        def _rows():
            err: bytes | None = None
            while True:
                tag, body = read_backend_message(self.sock)
                if tag == b"D":
                    yield _parse_datarow(body)
                elif tag == b"E":
                    err = body
                elif tag == b"Z":
                    if err is not None:
                        raise ConnectionError(f"query failed: {err!r}")
                    return

        return cols, _rows()

    def identify_system(self) -> dict:
        """IDENTIFY_SYSTEM — the walsender command behind
        pglogrepl.IdentifySystem (the reference reads the current flush
        position from it before deciding where to start,
        `pkg/postgres/source.go:597-621`). Returns {"systemid", "timeline",
        "xlogpos" (int LSN), "dbname"}. Must run BEFORE :meth:`start` —
        the connection is in CopyBoth mode afterwards."""
        rows = self.simple_query("IDENTIFY_SYSTEM")
        systemid, timeline, xlogpos, dbname = rows[0]
        return {
            "systemid": systemid,
            "timeline": int(timeline),
            "xlogpos": parse_lsn(xlogpos),
            "dbname": dbname,
        }

    def create_slot(self, temporary: bool = False) -> dict | None:
        """CREATE_REPLICATION_SLOT <slot> LOGICAL pgoutput — the wire
        command behind the reference's pglogrepl.CreateReplicationSlot
        (`pkg/postgres/source.go:586-587`). Idempotent: a duplicate-slot
        error (SQLSTATE 42710) is absorbed and returns None; otherwise
        returns {"slot_name", "consistent_point", "snapshot_name",
        "output_plugin"} so the caller can START_REPLICATION from the
        slot's consistent point."""
        opt = " TEMPORARY" if temporary else ""
        try:
            rows = self.simple_query(
                f'CREATE_REPLICATION_SLOT "{self.slot}"{opt} LOGICAL pgoutput'
            )
        except ConnectionError as e:
            if "42710" in str(e):
                return None
            raise
        name, point, snap, plugin = rows[0]
        return {
            "slot_name": name,
            "consistent_point": point,
            "snapshot_name": snap,
            "output_plugin": plugin,
        }

    # -- protocol ----------------------------------------------------------
    def start(self, start_lsn: int | None = None) -> int:
        """Issue START_REPLICATION from ``start_lsn`` (default: the saved
        checkpoint) and consume the CopyBothResponse. Returns the LSN the
        stream starts from."""
        lsn = self.load_checkpoint() if start_lsn is None else start_lsn
        self.flushed_lsn = lsn
        send_frontend_message(
            self.sock, b"Q",
            start_replication_query(self.slot, lsn, self.publication)
            .encode() + b"\x00",
        )
        tag, body = read_backend_message(self.sock)
        if tag == b"E":
            raise ConnectionError(f"server error: {body!r}")
        if tag != b"W":
            raise ConnectionError(
                f"expected CopyBothResponse, got {tag!r}"
            )
        return lsn

    def ack(self, reply_requested: bool = False) -> None:
        """Send StandbyStatusUpdate at the flushed LSN (the reference acks
        write=flush=apply at the keepalive's end, `source.go:141-148`)."""
        send_frontend_message(
            self.sock, b"d",
            encode_standby_status(
                self.received_lsn, self.flushed_lsn, self.flushed_lsn,
                int(time.time() * 1000), reply_requested,
            ),
        )

    def commit_ack(self, commit_payload: bytes) -> None:
        """Acknowledge a DELIVERED-AND-DURABLE Commit: advance the flushed
        LSN to its end LSN, persist the checkpoint, send the standby
        status. CONSUMER-driven, not automatic: the recorder calls this
        only after the segment holding the transaction is on disk —
        acking inside the frame loop would let the server discard WAL the
        consumer had only buffered (silent loss on crash)."""
        (_flags, _clsn, end_lsn) = struct.unpack_from(">BQQ", commit_payload, 1)
        self.flushed_lsn = max(self.flushed_lsn, end_lsn)
        self.save_checkpoint()
        self.ack()

    def frames(self, until_lsn: int | None = None,
               idle_timeout: float | None = None):
        """Yield raw pgoutput message payloads (the bytes inside XLogData)
        until the server ends the copy stream. Keepalives are answered
        inline at the CURRENT flushed LSN; advancing it is the consumer's
        job via :meth:`commit_ack` once the data is safe.

        Bounded drain (the CLI's ``--once``): with ``until_lsn`` set, the
        generator returns once the received LSN reaches it AND no
        transaction is open (never splits a txn across the boundary —
        a Begin-less Commit would decode with no LSN ordering, and an
        unsplit fragment would replay in full next run as duplicates).
        A live walsender goes quiet after the backlog (its unsolicited
        keepalives arrive on the wal_sender_timeout/2 cadence, ~30 s), so
        ``idle_timeout`` arms an idle-only read timeout
        (:func:`read_backend_message_idle` — armed for the tag byte only,
        so it can never fire mid-message and desynchronize the stream)
        whose expiry sends a StandbyStatusUpdate with replyRequested —
        the server answers with an immediate keepalive carrying its
        current send position, which either proves the target is reached
        or confirms more data is coming. Expiry with no target set just
        returns (drained). Commit messages fold their transaction
        ``end_lsn`` into the received LSN, so a drain whose last
        transaction reaches the target exits AT the commit boundary
        instead of waiting out an idle period for a keepalive."""
        in_txn = False
        while True:
            if (
                until_lsn is not None
                and not in_txn
                and self.received_lsn >= until_lsn
            ):
                self.save_checkpoint()
                return
            if idle_timeout:
                msg = read_backend_message_idle(self.sock, idle_timeout)
                if msg is None:  # idle — nothing mid-flight
                    if until_lsn is None or (
                        not in_txn and self.received_lsn >= until_lsn
                    ):
                        self.save_checkpoint()
                        return
                    # target not yet proven reached (or a txn is open):
                    # provoke an immediate keepalive and keep reading
                    self.ack(reply_requested=True)
                    continue
                tag, body = msg
            else:
                tag, body = read_backend_message(self.sock)
            if tag == b"E":
                raise ConnectionError(f"server error: {body!r}")
            if tag in (b"c", b"C", b"Z"):  # CopyDone / complete / ready
                self.save_checkpoint()
                return
            if tag != b"d":
                continue  # NoticeResponse etc — ignore like the reference
            kind = body[:1]
            if kind == b"k":
                wal_end, _ts, reply = struct.unpack(">Qq?", body[1:18])
                self.received_lsn = max(self.received_lsn, wal_end)
                if reply:
                    self.ack()
                continue
            if kind != b"w":
                continue
            wal_start, wal_end, _ts = struct.unpack(">QQq", body[1:25])
            self.received_lsn = max(self.received_lsn, wal_end)
            mtag = body[25:26]
            if mtag == b"B":
                in_txn = True
            elif mtag == b"C":
                in_txn = False
                # the Commit record carries the txn END lsn — ahead of the
                # XLogData wal_end (a record-start position), and exactly
                # what IDENTIFY_SYSTEM's xlogpos points at after the final
                # commit; folding it in lets a bounded drain exit at the
                # commit boundary with no idle-timeout stall
                (_flags, _clsn, end_lsn) = struct.unpack_from(
                    ">BQQ", body[25:], 1
                )
                self.received_lsn = max(self.received_lsn, end_lsn)
            yield body[25:]

    def stream(self, max_rows: int | None = None):
        """Yield decoded CDC rows (``max_rows`` is the bounded-drain hook);
        rows ARE the durable product here, so every Commit acks as soon as
        its rows have been handed to the caller."""
        yielded = 0
        for payload in self.frames():
            for row in self.decoder.feed(payload) or ():
                yielded += 1
                yield row
                if max_rows is not None and yielded >= max_rows:
                    self.save_checkpoint()
                    return
            if payload[:1] == b"C":
                self.commit_ack(payload)
