"""Mongo change-stream WIRE client against a mock mongod speaking OP_MSG:
aggregate($changeStream) cursor open, getMore polling, killCursors, and
base64-BSON resume-token checkpointing with resume — the reference's
``coll.Watch`` connection semantics (`pkg/mongo/source.go:71-96,180`),
including the hello/ping connection handshake (`source.go:49-64`); only
the TCP dial itself has no counterpart here.
"""

from __future__ import annotations

import socket
import threading

from librarian_spark.sources.mongo_wire import (
    MongoChangeStreamClient,
    bson_decode,
    bson_encode,
    encode_op_msg,
    read_op_msg,
)


def _ev(i, t_s, op, key, full=None):
    doc = {
        "_id": {"_data": f"{i:012d}"},
        "operationType": op,
        "clusterTime": {"$timestamp": {"t": t_s, "i": i}},
        "ns": {"db": "appdb", "coll": "users"},
        "documentKey": {"_id": key},
    }
    if full is not None:
        doc["fullDocument"] = full
    return doc


EVENTS = [
    _ev(1, 1_700_000_000, "insert", 1, {"_id": 1, "name": "alice"}),
    _ev(2, 1_700_000_000, "insert", 2, {"_id": 2, "name": "bob"}),
    _ev(3, 1_700_000_001, "replace", 1, {"_id": 1, "name": "alice2"}),
    _ev(4, 1_700_000_002, "delete", 2),
    _ev(5, 1_700_000_003, "insert", 3, {"_id": 3, "name": "carol"}),
]


def test_bson_round_trip():
    doc = {
        "s": "text",
        "i32": 5,
        "i64": 2**40,
        "neg": -7,
        "f": 2.5,
        "b": True,
        "z": None,
        "ts": {"$timestamp": {"t": 1_700_000_000, "i": 3}},
        "sub": {"k": "v", "arr": [1, "two", {"x": False}]},
        # the types a REAL server sends that the mock corpus doesn't:
        # default ObjectId _ids, Date fields, binary payloads
        "oid": {"$oid": "65f0a1b2c3d4e5f6a7b8c9d0"},
        "dt": {"$date": 1_700_000_000_123},
        "bin": {"$binary": {"base64": "cGF5bG9hZA==", "subType": "00"}},
    }
    assert bson_decode(bson_encode(doc)) == doc


def test_op_msg_round_trip():
    c, s = socket.socketpair()
    try:
        c.sendall(encode_op_msg({"ping": 1, "$db": "admin"}, 42, 7))
        req, resp, doc = read_op_msg(s)
        assert (req, resp) == (42, 7)
        assert doc == {"ping": 1, "$db": "admin"}
    finally:
        c.close()
        s.close()


class MockMongod:
    """One change-stream session per connection: aggregate opens cursor 77
    over the events AFTER any resumeAfter token, getMore pages through in
    batches of 2, the final page closes the cursor (id 0)."""

    def __init__(self, events, batch=2, max_wire_version=17, docs=None,
                 operation_time_t=1_700_000_500):
        self.events = events
        self.batch = batch
        self.max_wire_version = max_wire_version
        self.docs = docs or []  # collection contents, served by `find`
        self.operation_time_t = operation_time_t
        self.commands: list[dict] = []

    def serve(self, sock) -> None:
        pending: list[dict] = []
        find_pending: list[dict] = []
        try:
            while True:
                req, _resp, cmd = read_op_msg(sock)
                self.commands.append(cmd)
                if "aggregate" in cmd:
                    stage = cmd["pipeline"][0]["$changeStream"]
                    after = (stage.get("resumeAfter") or {}).get("_data")
                    pending = [
                        e for e in self.events
                        if after is None or e["_id"]["_data"] > after
                    ]
                    first, pending = pending[: self.batch], pending[self.batch:]
                    # postBatchResumeToken = the stream position at open
                    # (before any pending event when resuming fresh);
                    # operationTime = the server clock — what real
                    # mongod >= 4.0.7 returns and the initial sync anchors on
                    start = after if after is not None else "000000"
                    reply = {
                        "cursor": {
                            "firstBatch": first,
                            "id": 77 if pending else 0,
                            "ns": f"{cmd['$db']}.{cmd['aggregate']}",
                            "postBatchResumeToken": {
                                "_data": (
                                    first[-1]["_id"]["_data"]
                                    if first else start
                                )
                            },
                        },
                        "operationTime": {
                            "$timestamp": {"t": self.operation_time_t, "i": 3}
                        },
                        "ok": 1.0,
                    }
                elif "find" in cmd:
                    find_pending = list(self.docs)
                    first, find_pending = (
                        find_pending[: self.batch], find_pending[self.batch:]
                    )
                    reply = {
                        "cursor": {
                            "firstBatch": first,
                            "id": 88 if find_pending else 0,
                            "ns": f"{cmd['$db']}.{cmd['find']}",
                        },
                        "ok": 1.0,
                    }
                elif "getMore" in cmd and cmd["getMore"] == 88:
                    nxt, find_pending = (
                        find_pending[: self.batch], find_pending[self.batch:]
                    )
                    reply = {
                        "cursor": {
                            "nextBatch": nxt,
                            "id": 88 if find_pending else 0,
                            "ns": f"{cmd['$db']}.{cmd['collection']}",
                        },
                        "ok": 1.0,
                    }
                elif "getMore" in cmd:
                    nxt, pending = pending[: self.batch], pending[self.batch:]
                    reply = {
                        "cursor": {
                            "nextBatch": nxt,
                            "id": 77 if pending else 0,
                            "ns": f"{cmd['$db']}.{cmd['collection']}",
                        },
                        "ok": 1.0,
                    }
                elif "killCursors" in cmd:
                    reply = {"cursorsKilled": cmd["cursors"], "ok": 1.0}
                elif "hello" in cmd:
                    reply = {
                        "isWritablePrimary": True,
                        "maxWireVersion": self.max_wire_version,
                        "minWireVersion": 0,
                        "ok": 1.0,
                    }
                elif "ping" in cmd:
                    reply = {"ok": 1.0}
                else:
                    reply = {"ok": 0.0, "errmsg": f"unknown command {cmd}"}
                sock.sendall(encode_op_msg(reply, 1000 + req, req))
        except (ConnectionError, OSError):
            return


def _session(server: MockMongod, ckpt: str):
    c, s = socket.socketpair()
    t = threading.Thread(target=server.serve, args=(s,), daemon=True)
    t.start()
    client = MongoChangeStreamClient(
        c, db="appdb", collection="users", checkpoint_path=ckpt
    )
    return client, (c, s)


def test_watch_stream_and_op_mapping(tmp_path):
    srv = MockMongod(EVENTS)
    client, socks = _session(srv, str(tmp_path / "tok.ckpt"))
    client.watch()
    rows = list(client.events())
    client.close()
    for s in socks:
        s.close()
    assert [r[0] for r in rows] == ["c", "c", "u", "d", "c"]
    assert rows[2][7] == '{"_id":1,"name":"alice2"}'
    assert rows[3][6] == '{"_id":2}'  # documentKey as the delete before-image
    # ordinal-folded ts_ms (same-second events keep order)
    assert [r[1] for r in rows[:2]] == [1_700_000_000_001, 1_700_000_000_002]
    # the first aggregate carried no resumeAfter; getMore polls with the
    # reference's 5 s await window
    agg = srv.commands[0]
    assert "resumeAfter" not in agg["pipeline"][0]["$changeStream"]
    gm = next(c for c in srv.commands if "getMore" in c)
    assert gm["maxTimeMS"] == 5000
    # checkpoint = base64 BSON of the LAST token
    assert client.load_checkpoint() == {"_data": "000000000005"}


def test_resume_after_checkpoint_no_loss_no_dup(tmp_path):
    ckpt = str(tmp_path / "tok.ckpt")
    srv1 = MockMongod(EVENTS)
    c1, socks1 = _session(srv1, ckpt)
    c1.watch()
    rows1 = list(c1.events(max_batches=1))  # connection cut after batch 1
    for s in socks1:
        s.close()
    assert len(rows1) == 2
    assert c1.load_checkpoint() == {"_data": "000000000002"}

    srv2 = MockMongod(EVENTS)
    c2, socks2 = _session(srv2, ckpt)
    c2.watch()
    rows2 = list(c2.events())
    for s in socks2:
        s.close()
    # the resume carried the checkpointed token; only later events streamed
    stage = srv2.commands[0]["pipeline"][0]["$changeStream"]
    assert stage["resumeAfter"] == {"_data": "000000000002"}
    seen = [r[8] for r in rows1 + rows2]  # positions = token _data strings
    assert seen == [f"{i:012d}" for i in range(1, 6)]  # no loss, no dup


# -- hello/ping handshake (the connection-establishment half) ---------------


def test_connect_hello_ping_watch_from_byte_zero(tmp_path):
    """The reference's full Connect sequence (`pkg/mongo/source.go:49-96`)
    in one mock session from byte zero: hello (client metadata + wire
    version gate) → ping → watch → events. The only step a live server
    would add is the TCP dial itself."""
    srv = MockMongod(EVENTS)
    client, socks = _session(srv, str(tmp_path / "tok.ckpt"))
    client.connect()
    rows = list(client.events())
    for s in socks:
        s.close()
    assert len(rows) == 5
    assert [c for cmd in srv.commands for c in cmd if c in
            ("hello", "ping", "aggregate")][:3] == [
        "hello", "ping", "aggregate",
    ]
    hello = srv.commands[0]
    assert hello["$db"] == "admin"
    assert hello["client"]["application"]["name"] == "librarian-replicator"
    assert hello["client"]["driver"]["name"] == "librarian-spark-wire"
    assert client.server_info["isWritablePrimary"] is True


def test_hello_refuses_pre_changestream_servers(tmp_path):
    import pytest

    srv = MockMongod(EVENTS, max_wire_version=5)  # MongoDB 3.4: no streams
    client, socks = _session(srv, str(tmp_path / "tok.ckpt"))
    with pytest.raises(ConnectionError, match="wire version"):
        client.connect()
    for s in socks:
        s.close()


def test_connect_resume_in_one_session(tmp_path):
    """connect → watch → resume across a cut, all through the handshake
    path (not a bare watch): the checkpointed token still drives the
    second session's aggregate."""
    ckpt = str(tmp_path / "tok.ckpt")
    srv1 = MockMongod(EVENTS)
    c1, socks1 = _session(srv1, ckpt)
    c1.connect()
    assert len(list(c1.events(max_batches=1))) == 2
    for s in socks1:
        s.close()

    srv2 = MockMongod(EVENTS)
    c2, socks2 = _session(srv2, ckpt)
    c2.connect()
    rows2 = list(c2.events())
    for s in socks2:
        s.close()
    assert len(rows2) == 3
    agg = [c for c in srv2.commands if "aggregate" in c][0]
    assert agg["pipeline"][0]["$changeStream"]["resumeAfter"] == {
        "_data": "000000000002"
    }
