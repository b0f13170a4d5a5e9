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
