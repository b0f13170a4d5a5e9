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

import os
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


def send_frontend_message(sock, tag: bytes, body: bytes) -> None:
    sock.sendall(tag + struct.pack(">I", len(body) + 4) + body)


def start_replication_query(slot: str, lsn: int, publication: str) -> str:
    """The exact command pglogrepl.StartReplication issues for the
    reference's options (`source.go:498-504`)."""
    return (
        f"START_REPLICATION SLOT {slot} LOGICAL {lsn_str(lsn)} "
        f"(proto_version '1', publication_names '{publication}')"
    )


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

    def frames(self):
        """Yield raw pgoutput message payloads (the bytes inside XLogData)
        until the server ends the copy stream. Keepalives are answered
        inline at the CURRENT flushed LSN; advancing it is the consumer's
        job via :meth:`commit_ack` once the data is safe."""
        while True:
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
