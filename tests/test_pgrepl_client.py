"""Replication-slot network client against a mock WAL sender speaking the
public streaming-replication protocol: START_REPLICATION handshake,
CopyBothResponse, XLogData/keepalive frames, standby-status acks, and
checkpoint resume — the reference's connection loop
(`pkg/postgres/source.go:101-179,455-527,597-621`) minus libpq startup.
"""

from __future__ import annotations

import socket
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


def MockWalSender(txns, upto=None):
    """The shared package fixture, pre-loaded with this suite's Relation."""
    return _BaseSender(txns, relations=[REL], upto=upto)


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
