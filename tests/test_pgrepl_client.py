"""Replication-slot network client against a mock WAL sender speaking the
public streaming-replication protocol: START_REPLICATION handshake,
CopyBothResponse, XLogData/keepalive frames, standby-status acks, and
checkpoint resume — the reference's connection loop
(`pkg/postgres/source.go:101-179,455-527,597-621`) minus libpq startup.
"""

from __future__ import annotations

import socket
import struct
import threading

from librarian_spark.sources.pgoutput import (
    OID_INT4,
    encode_begin,
    encode_commit,
    encode_insert,
    encode_relation,
)
from librarian_spark.sources.pgrepl_client import (
    ReplicationSlotClient,
    lsn_str,
    parse_lsn,
    start_replication_query,
)
from librarian_spark.sources.pgrepl_mock import MockWalSender as _BaseSender

REL = encode_relation(9001, "public", "users", [("id", OID_INT4), ("name", 25)])


def MockWalSender(txns, upto=None, **kw):
    """The shared package fixture, pre-loaded with this suite's Relation."""
    return _BaseSender(txns, relations=[REL], upto=upto, **kw)


def _txn(lsn: int, rows: list[list[str]]) -> tuple[int, list[bytes]]:
    """One committed transaction; end LSN = lsn + 8 (the commit record)."""
    msgs = [encode_begin(lsn, 1_700_000_000_000 + lsn, 700 + lsn)]
    msgs += [encode_insert(9001, r) for r in rows]
    msgs.append(encode_commit(lsn, lsn + 8, 1_700_000_000_000 + lsn))
    return lsn + 8, msgs


TXNS = [
    _txn(100, [["1", "alice"], ["2", "bob"]]),
    _txn(200, [["3", "carol"], ["4", "dave"]]),
    _txn(300, [["5", "erin"]]),
]


def _session(server: MockWalSender, ckpt: str):
    c, s = socket.socketpair()
    t = threading.Thread(target=server.serve, args=(s,), daemon=True)
    t.start()
    client = ReplicationSlotClient(
        c, slot="librarian", publication="pub", db="appdb",
        checkpoint_path=ckpt,
    )
    return client, t, (c, s)


def test_lsn_text_round_trip():
    assert lsn_str(0) == "0/0"
    assert lsn_str((0xAB << 32) | 0x1234) == "AB/1234"
    assert parse_lsn("AB/1234") == (0xAB << 32) | 0x1234
    assert parse_lsn(lsn_str(2**63 + 17)) == 2**63 + 17


def test_start_replication_command_shape():
    cmd = start_replication_query("librarian", 256, "pub")
    assert cmd == (
        "START_REPLICATION SLOT librarian LOGICAL 0/100 "
        "(proto_version '1', publication_names 'pub')"
    )


def test_handshake_stream_ack_and_checkpoint_resume(tmp_path):
    ckpt = str(tmp_path / "lsn.ckpt")

    # session 1: the server cuts the stream after txn2 (connection drop)
    srv1 = MockWalSender(TXNS, upto=208)
    client, t, socks = _session(srv1, ckpt)
    start = client.start()
    assert start == 0  # no checkpoint yet
    rows1 = list(client.stream())
    t.join(timeout=5)
    for s in socks:
        s.close()
    # 4 rows from txn1+txn2, typed per the reference rule (int4 → int)
    assert [r[0] for r in rows1] == ["c"] * 4
    assert [r[7] for r in rows1] == [
        '{"id":1,"name":"alice"}', '{"id":2,"name":"bob"}',
        '{"id":3,"name":"carol"}', '{"id":4,"name":"dave"}',
    ]
    assert [r[5] for r in rows1] == [100, 100, 200, 200]  # txn LSN stamps
    # the forced keepalive ack came back, then per-commit acks advanced to
    # txn2's end LSN, which is also what the checkpoint file persisted
    assert srv1.acks[0]["flushed"] == 0
    assert srv1.acks[-1]["flushed"] == 208
    assert client.load_checkpoint() == 208

    # session 2: resume — the server only re-streams txn3, no replay of
    # what was acknowledged, and the START_REPLICATION names the slot and
    # checkpointed LSN
    srv2 = MockWalSender(TXNS)
    client2, t2, socks2 = _session(srv2, ckpt)
    assert client2.start() == 208
    rows2 = list(client2.stream())
    t2.join(timeout=5)
    for s in socks2:
        s.close()
    assert "SLOT librarian LOGICAL 0/D0 " in srv2.start_cmds[0]
    assert [r[7] for r in rows2] == ['{"id":5,"name":"erin"}']
    assert client2.load_checkpoint() == 308

    # zero loss, zero duplication across the reconnect
    seen = [r[7] for r in rows1 + rows2]
    assert len(seen) == len(set(seen)) == 5


def test_uncommitted_transaction_replays_after_drop(tmp_path):
    """A connection cut MID-TRANSACTION (commit never delivered) must not
    advance the checkpoint — the resume replays the whole transaction
    (at-least-once at the wire, exactly-once downstream on the LSN key)."""
    ckpt = str(tmp_path / "lsn.ckpt")
    end1, msgs1 = TXNS[0]
    torn = [(end1, msgs1), (208, TXNS[1][1][:-1])]  # txn2 missing its commit
    srv = MockWalSender(torn)
    client, t, socks = _session(srv, ckpt)
    client.start()
    rows = list(client.stream())
    t.join(timeout=5)
    for s in socks:
        s.close()
    assert len(rows) == 4  # txn2's inserts arrived...
    assert client.load_checkpoint() == 108  # ...but only txn1 checkpointed

    srv2 = MockWalSender(TXNS)
    client2, t2, socks2 = _session(srv2, ckpt)
    assert client2.start() == 108
    rows2 = list(client2.stream())
    t2.join(timeout=5)
    for s in socks2:
        s.close()
    # txn2 replays in full, then txn3 — the un-acked rows are delivered again
    assert [r[7] for r in rows2] == [
        '{"id":3,"name":"carol"}', '{"id":4,"name":"dave"}',
        '{"id":5,"name":"erin"}',
    ]
    assert client2.load_checkpoint() == 308


# -- startup + SCRAM-SHA-256 (the connection-establishment half) ------------


def test_full_handshake_from_socket_open_to_stream(tmp_path):
    """From byte zero: StartupMessage (replication=database) → SCRAM-SHA-256
    (RFC 5802: salted-password proof, MUTUAL auth via verified server
    signature) → ReadyForQuery → START_REPLICATION → decoded rows. The only
    step a live server would add is the TCP dial itself
    (`pkg/postgres/source.go:447-470` parity)."""
    srv = MockWalSender(TXNS, auth=("librarian", "s3cret"))
    client, t, socks = _session(srv, str(tmp_path / "lsn.ckpt"))
    info = client.startup("librarian", password="s3cret", database="appdb")
    assert info["parameters"]["server_version"].startswith("16")
    assert info["backend_pid"] == 4242
    # the startup asked for a replication connection, like pgconn does
    assert srv.startup_params == {
        "user": "librarian", "database": "appdb", "replication": "database",
    }
    assert client.start() == 0
    rows = list(client.stream())
    t.join(timeout=5)
    for s in socks:
        s.close()
    assert len(rows) == 5
    assert client.load_checkpoint() == 308


def test_wrong_password_fails_like_a_real_server(tmp_path):
    import pytest

    srv = MockWalSender(TXNS, auth=("librarian", "s3cret"))
    client, t, socks = _session(srv, str(tmp_path / "l"))
    with pytest.raises(ConnectionError, match="authentication failed"):
        client.startup("librarian", password="wrong", database="appdb")
    t.join(timeout=5)
    for s in socks:
        s.close()


def test_client_rejects_forged_server_signature(tmp_path, monkeypatch):
    """Mutual auth: a server that does NOT hold the password cannot produce
    the RFC 5802 server signature — the client must refuse to proceed."""
    import pytest

    from librarian_spark.sources import pgrepl_mock as mock_mod

    monkeypatch.setattr(
        mock_mod, "scram_server_signature", lambda *a: b"\x00" * 32
    )
    srv = MockWalSender(TXNS, auth=("librarian", "s3cret"))
    client, t, socks = _session(srv, str(tmp_path / "l"))
    with pytest.raises(ConnectionError, match="server signature mismatch"):
        client.startup("librarian", password="s3cret", database="appdb")
    for s in socks:
        s.close()


def test_scram_rfc7677_test_vector():
    """RFC 7677 §3's published SCRAM-SHA-256 exchange, replayed exactly:
    user/pass 'user'/'pencil', the RFC's nonces and salt — the client's
    proof and the server's signature must match the RFC's bytes."""
    import base64

    from librarian_spark.sources.pgrepl_client import (
        scram_client_proof,
        scram_salted_password,
        scram_server_signature,
    )

    client_first_bare = "n=user,r=rOprNGfwEbeRWgbNEkqO"
    server_first = (
        "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    )
    final_bare = "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0"
    auth_msg = f"{client_first_bare},{server_first},{final_bare}"
    salted = scram_salted_password(
        "pencil", base64.b64decode("W22ZaJ0SNY7soEsUEjb6gQ=="), 4096
    )
    assert (
        base64.b64encode(scram_client_proof(salted, auth_msg)).decode()
        == "dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="
    )
    assert (
        base64.b64encode(scram_server_signature(salted, auth_msg)).decode()
        == "6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="
    )


def test_large_session_outgrowing_socket_buffers_does_not_deadlock(tmp_path):
    """Full-duplex flow control: a session whose WAL stream AND ack stream
    both exceed the socketpair buffer (~212 KB) must complete. The mock
    sender drains standby-status acks concurrently with the outbound
    stream (like a real walsender's receive half) — a send-all-then-read
    server deadlocks here: the client blocks sending an ack, stops
    reading, and the server's sendall blocks in turn (observed live at a
    10x-scale cdc_wire_replication build: 5 threads parked in
    sock_alloc_send_pskb)."""
    n = 4000  # ~800 KB of WAL frames, ~4000 acks (~3 MB of skb accounting)
    txns = [
        _txn(100 * (i + 1), [[str(i), f"user-{i:06d}-{'x' * 80}"]])
        for i in range(n)
    ]
    srv = MockWalSender(txns)
    client, t, socks = _session(srv, str(tmp_path / "lsn.ckpt"))
    client.start()
    rows = list(client.stream())
    t.join(timeout=30)
    assert not t.is_alive(), "server thread still alive — deadlock"
    for s in socks:
        s.close()
    assert len(rows) == n
    assert client.load_checkpoint() == 100 * n + 8
    # every commit was acked and the LAST ack carries the final LSN
    assert srv.acks[-1]["flushed"] == 100 * n + 8


# -- bounded drain (the CLI's --once): until_lsn / idle_timeout ---------------


class _HoldOpenSender:
    """A walsender that NEVER ends the copy stream (a live server's shape):
    sends its scripted frames, then sits on the connection answering
    reply-requested standby statuses with a keepalive at ``wal_end`` —
    exactly what frames(until_lsn=...) must terminate against. Script
    entries: ("send", pgoutput_msg_bytes, start, end) | ("sleep", secs)."""

    def __init__(self, script, wal_end):
        self.script = script
        self.wal_end = wal_end
        self.acks = []

    def serve(self, sock) -> None:
        import time as _time

        from librarian_spark.sources.pgrepl_client import (
            encode_keepalive,
            encode_xlogdata,
            parse_standby_status,
            read_backend_message,
            send_frontend_message,
        )

        try:
            tag, _ = read_backend_message(sock)  # Q START_REPLICATION
            assert tag == b"Q"
            send_frontend_message(sock, b"W", struct.pack(">BH", 0, 0))
            for step in self.script:
                if step[0] == "sleep":
                    _time.sleep(step[1])
                else:
                    _, msg, s_lsn, e_lsn = step
                    send_frontend_message(
                        sock, b"d", encode_xlogdata(s_lsn, e_lsn, msg)
                    )
            # hold open: answer reply-requested acks with a keepalive
            while True:
                tag, body = read_backend_message(sock)
                if tag != b"d" or body[:1] != b"r":
                    continue
                st = parse_standby_status(body)
                self.acks.append(st)
                if st["reply_requested"]:
                    send_frontend_message(
                        sock, b"d", encode_keepalive(self.wal_end, False)
                    )
        except (ConnectionError, OSError):
            return  # client closed — session over


def _hold_session(srv):
    c, s = socket.socketpair()
    t = threading.Thread(target=srv.serve, args=(s,), daemon=True)
    t.start()
    client = ReplicationSlotClient(c, slot="librarian", publication="pub", db="appdb")
    return client, (c, s)


def _txn_frames(lsn, rows):
    end, msgs = _txn(lsn, rows)
    return [("send", m, end - 8, end) for m in ([REL] + msgs)]


def test_bounded_drain_exits_at_commit_boundary_without_idle_stall():
    """frames(until_lsn) must fold the Commit record's end_lsn into the
    received LSN and exit AT the commit boundary — not wait out an idle
    period for a keepalive (the guaranteed ~idle_timeout stall every
    --once drain with data would otherwise pay)."""
    import time as _time

    script = _txn_frames(100, [["1", "alice"]]) + _txn_frames(
        200, [["2", "bob"]]
    )[1:]  # REL only once
    srv = _HoldOpenSender(script, wal_end=208)
    client, socks = _hold_session(srv)
    client.start(0)
    t0 = _time.monotonic()
    payloads = list(client.frames(until_lsn=208, idle_timeout=2.0))
    elapsed = _time.monotonic() - t0
    for s in socks:
        s.close()
    # both txns drained (B/I/C each), and the exit came from the commit
    # boundary, not from the 2 s idle timeout
    assert sum(1 for p in payloads if p[:1] == b"C") == 2
    assert elapsed < 1.5, f"drain stalled {elapsed:.2f}s — keepalive path taken"
    assert client.received_lsn >= 208


def test_bounded_drain_never_returns_mid_transaction():
    """An idle timeout while a transaction is OPEN must keep waiting even
    when the received LSN already covers the target — returning there
    would flush a Begin-without-Commit fragment whose (never-acked)
    transaction replays in full next run."""
    end1, msgs1 = _txn(100, [["1", "alice"]])
    end2, msgs2 = _txn(300, [["2", "bob"], ["3", "carol"]])
    script = (
        [("send", REL, 92, 100)]
        + [("send", m, 92, end1) for m in msgs1]
        # txn2 stalls after Begin+first insert; meanwhile the server's
        # keepalive (answering the idle-timeout ack) reports wal_end PAST
        # the target — received >= until with in_txn=True
        + [("send", m, 292, end2) for m in msgs2[:2]]
        + [("sleep", 1.2)]
        + [("send", m, 292, end2) for m in msgs2[2:]]
    )
    srv = _HoldOpenSender(script, wal_end=500)
    client, socks = _hold_session(srv)
    client.start(0)
    payloads = list(client.frames(until_lsn=308, idle_timeout=0.3))
    for s in socks:
        s.close()
    # ALL of txn2 arrived — including the commit after the stall — so the
    # drain ended at a transaction boundary, not mid-fragment. (Whether the
    # idle timeout fired during the stall is load-dependent — a busy box can
    # keep the client behind the stream so it never goes idle — so the ack
    # traffic itself is not asserted; the boundary property is what matters.)
    tags = [p[:1] for p in payloads]
    assert tags.count(b"C") == 2, f"txn2 split across the drain: {tags}"
    assert tags[-1] == b"C"


def test_start_tls_refusal_raises_not_downgrades():
    """A server answering 'N' to SSLRequest must RAISE — silently
    continuing in cleartext is the downgrade sslmode=require exists to
    prevent. Also pins the SSLRequest bytes (8-byte length, 80877103)."""
    import pytest

    from librarian_spark.sources.pgrepl_client import start_tls

    c, s = socket.socketpair()
    try:
        def _serve():
            req = b""
            while len(req) < 8:
                req += s.recv(8 - len(req))
            assert req == struct.pack(">II", 8, 80877103)
            s.sendall(b"N")

        t = threading.Thread(target=_serve, daemon=True)
        t.start()
        with pytest.raises(ConnectionError, match="refused SSL"):
            start_tls(c, server_hostname="127.0.0.1")
        t.join(timeout=5)
    finally:
        c.close()
        s.close()
