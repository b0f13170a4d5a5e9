"""Wire client → segment recorder → Spark DataSource, end to end: the
full reference architecture (single-writer network consumer feeding a
replicated store) re-expressed at the segment boundary. A mock server
streams the protocol, the recorder lands immutable segments with
durable-before-ack ordering, and Spark decodes them executor-parallel —
including a cut-and-resume across two connections with zero loss or
duplication at the sink.
"""

from __future__ import annotations

import socket
import threading

from librarian_spark.sources.recorders import ChangeStreamRecorder, PgWalRecorder


# -- pg: mock WAL sender → .pgwal segments → spark ------------------------


def _pg_session(txns, ckpt, upto=None):
    from tests.test_pgrepl_client import MockWalSender
    from librarian_spark.sources.pgrepl_client import ReplicationSlotClient

    srv = MockWalSender(txns, upto=upto)
    c, s = socket.socketpair()
    t = threading.Thread(target=srv.serve, args=(s,), daemon=True)
    t.start()
    client = ReplicationSlotClient(
        c, slot="librarian", publication="pub", db="appdb",
        checkpoint_path=ckpt,
    )
    return srv, client, t, (c, s)


def test_pgwal_record_resume_and_spark_decode(spark, tmp_path):
    from tests.test_pgrepl_client import TXNS
    from librarian_spark.sources import pgoutput as pg

    seg = str(tmp_path / "wal")
    ckpt = str(tmp_path / "lsn.ckpt")

    # session 1: connection drops after txn2 — two 1-txn segments land
    srv1, client, t, socks = _pg_session(TXNS, ckpt, upto=208)
    client.start()
    rec = PgWalRecorder(seg, txns_per_segment=1)
    assert rec.record(client) == 2
    t.join(timeout=5)
    for s in socks:
        s.close()
    assert srv1.acks[-1]["flushed"] == 208  # acked only after flush
    assert client.load_checkpoint() == 208

    # session 2: resume — a NEW recorder continues the numbering and only
    # txn3 streams (the server honors the checkpointed LSN)
    srv2, client2, t2, socks2 = _pg_session(TXNS, ckpt)
    assert client2.start() == 208
    rec2 = PgWalRecorder(seg, txns_per_segment=1)
    assert rec2.record(client2) == 1
    t2.join(timeout=5)
    for s in socks2:
        s.close()

    import os

    names = sorted(f for f in os.listdir(seg) if f.endswith(".pgwal"))
    assert names == [
        "seg-00000000.pgwal", "seg-00000001.pgwal", "seg-00000002.pgwal"
    ]
    # every segment is self-contained: Relation precedes DML
    first = next(pg.read_segment_frames(os.path.join(seg, names[2])))
    assert first[:1] == b"R"

    # Spark decodes the recorded stream executor-parallel, no loss, no dup
    pg.register(spark)
    df = (
        spark.read.format("pgoutput")
        .option("path", seg)
        .option("db", "appdb")
        .load()
    )
    rows = sorted(df.collect(), key=lambda r: (r["lsn"], r["position"]))
    assert [r["op"] for r in rows] == ["c"] * 5
    assert [r["lsn"] for r in rows] == [100, 100, 200, 200, 300]
    afters = [r["after"] for r in rows]
    assert afters == [
        '{"id":1,"name":"alice"}', '{"id":2,"name":"bob"}',
        '{"id":3,"name":"carol"}', '{"id":4,"name":"dave"}',
        '{"id":5,"name":"erin"}',
    ]


def test_pgwal_alter_mid_stream_keeps_txns_intact(spark, tmp_path):
    """A Relation CHANGE arriving inside a transaction (pgoutput emits the
    changed Relation after Begin, before the DML that uses the new schema)
    must not split that transaction across segments: pre-ALTER rows decode
    against the pre-ALTER schema, post-ALTER rows against the new one, and
    every row keeps its transaction's LSN stamp (no Begin-less Commit)."""
    import os

    from librarian_spark.sources import pgoutput as pg
    from librarian_spark.sources.pgoutput import (
        encode_begin, encode_commit, encode_insert, encode_relation,
        OID_INT4,
    )

    rel_v1 = encode_relation(
        9001, "public", "users", [("id", OID_INT4), ("name", 25)]
    )
    rel_v2 = encode_relation(
        9001, "public", "users",
        [("id", OID_INT4), ("name", 25), ("email", 25)],
    )
    txns = [
        (108, [
            encode_begin(100, 1_700_000_000_100, 800),
            encode_insert(9001, ["1", "alice"]),
            encode_commit(100, 108, 1_700_000_000_100),
        ]),
        # ALTER TABLE mid-transaction: old-schema row, Relation v2, new row
        (208, [
            encode_begin(200, 1_700_000_000_200, 801),
            encode_insert(9001, ["2", "bob"]),
            rel_v2,
            encode_insert(9001, ["3", "carol", "c@x.io"]),
            encode_commit(200, 208, 1_700_000_000_200),
        ]),
        (308, [
            encode_begin(300, 1_700_000_000_300, 802),
            encode_insert(9001, ["4", "dave", "d@x.io"]),
            encode_commit(300, 308, 1_700_000_000_300),
        ]),
    ]

    from librarian_spark.sources.pgrepl_mock import MockWalSender
    from librarian_spark.sources.pgrepl_client import ReplicationSlotClient

    srv = MockWalSender(txns, relations=[rel_v1])
    c, t = srv.connect()
    client = ReplicationSlotClient(
        c, slot="librarian", publication="pub", db="appdb",
        checkpoint_path=str(tmp_path / "lsn.ckpt"),
    )
    client.start()
    seg = str(tmp_path / "wal")
    rec = PgWalRecorder(seg, txns_per_segment=2)
    assert rec.record(client) == 3
    t.join(timeout=5)
    c.close()

    names = sorted(f for f in os.listdir(seg) if f.endswith(".pgwal"))
    # 2-txn rotation, NOT a schema-change rotation: txn2 stays whole
    assert names == ["seg-00000000.pgwal", "seg-00000001.pgwal"]

    # segment 0: prefix is v1 (buffer-start registry), v2 rides inline
    frames0 = list(pg.read_segment_frames(os.path.join(seg, names[0])))
    assert frames0[0] == rel_v1
    assert rel_v2 in frames0
    assert frames0.index(rel_v2) > frames0.index(
        encode_insert(9001, ["2", "bob"])
    )
    # segment 1: self-contained on the POST-alter schema
    frames1 = list(pg.read_segment_frames(os.path.join(seg, names[1])))
    assert frames1[0] == rel_v2

    rows = []
    for n in names:
        rows += list(pg.decode_segment(os.path.join(seg, n), "appdb"))
    rows.sort(key=lambda r: (r[5], r[6]))  # (lsn, position)
    # every row carries its txn LSN — nothing decoded Begin-less
    assert [r[5] for r in rows] == [100, 200, 200, 300]
    assert [r[7] for r in rows] == [
        '{"id":1,"name":"alice"}',
        '{"id":2,"name":"bob"}',                       # pre-ALTER schema
        '{"email":"c@x.io","id":3,"name":"carol"}',    # post-ALTER schema
        '{"email":"d@x.io","id":4,"name":"dave"}',
    ]


# -- mongo: mock mongod → .cstream segments → spark ------------------------


def _mongo_session(events, ckpt):
    from tests.test_mongo_wire import MockMongod
    from librarian_spark.sources.mongo_wire import MongoChangeStreamClient

    srv = MockMongod(events)
    c, s = socket.socketpair()
    t = threading.Thread(target=srv.serve, args=(s,), daemon=True)
    t.start()
    client = MongoChangeStreamClient(
        c, db="appdb", collection="users", checkpoint_path=ckpt
    )
    return srv, client, (c, s)


def test_cstream_record_resume_and_spark_decode(spark, tmp_path):
    from tests.test_mongo_wire import EVENTS
    from librarian_spark.sources import mongo_changestream as mcs

    seg = str(tmp_path / "cs")
    ckpt = str(tmp_path / "tok.ckpt")

    # session 1: one batch (2 docs) lands as one segment, then the cut
    srv1, client, socks = _mongo_session(EVENTS, ckpt)
    client.watch()
    rec = ChangeStreamRecorder(seg)
    assert rec.record(client, max_batches=1) == 2
    for s in socks:
        s.close()
    assert client.load_checkpoint() == {"_data": "000000000002"}

    # session 2: resume streams only the remaining three documents
    srv2, client2, socks2 = _mongo_session(EVENTS, ckpt)
    client2.watch()
    rec2 = ChangeStreamRecorder(seg)
    assert rec2.record(client2) == 3
    for s in socks2:
        s.close()
    stage = srv2.commands[0]["pipeline"][0]["$changeStream"]
    assert stage["resumeAfter"] == {"_data": "000000000002"}

    mcs.register(spark)
    df = (
        spark.read.format("mongo_changestream").option("path", seg).load()
    )
    rows = sorted(df.collect(), key=lambda r: r["position"])
    assert [r["op"] for r in rows] == ["c", "c", "u", "d", "c"]
    assert [r["position"] for r in rows] == [
        f"{i:012d}" for i in range(1, 6)
    ]
    assert rows[2]["after"] == '{"_id":1,"name":"alice2"}'
    assert rows[3]["before"] == '{"_id":2}'
