"""Live-service integration: the SAME wire clients the mock tests pin,
dialed at a real postgres/mongod/kafka over TCP.

The pg tests RUN in the plain suite: the sandbox ships PostgreSQL 15
binaries, and conftest auto-provisions a throwaway logical-replication
cluster (tests/live_pg.py) when no LIBRARIAN_LIVE_PG_DSN is set. Kafka and
mongo stay skipped (no binaries in the sandbox); to run them against the
reference's own dev/compose.yml stack:

    LIBRARIAN_LIVE_KAFKA_DSN=localhost:9092 \
    LIBRARIAN_LIVE_MONGO_DSN=localhost:27017 \
        python -m pytest tests/test_live.py -m live -q

The handshake tests exercise the smallest real-server round-trip (Kafka
Metadata v9 + one produced record, Postgres StartupMessage +
SCRAM-SHA-256, Mongo hello + ping); test_live_pg_replication_end_to_end
drives the FULL replication path — wire-level CREATE_REPLICATION_SLOT,
DML over the walsender connection, START_REPLICATION, pgoutput decode of
real WAL, commit-granular ack.
"""

from __future__ import annotations

import os
import time

import pytest

from librarian_spark.sources.dial import live_dsn


@pytest.mark.live("kafka")
def test_live_kafka_metadata_and_produce():
    from librarian_spark.sources.kafka_wire import KafkaProducerClient

    topic = os.environ.get("LIBRARIAN_LIVE_KAFKA_TOPIC", "librarian-live-test")
    c = KafkaProducerClient.dial(live_dsn("kafka"), topic=topic)
    try:
        c.connect()
        assert c.partitions, "metadata should discover partitions"
        c.produce(b"db.public.live_test", b'{"live":true,"ts":%d}' % int(time.time()))
        reports = c.flush()
        assert reports and all(r["error"] == 0 for r in reports)
    finally:
        c.sock.close()


@pytest.mark.live("pg")
def test_live_pg_startup_and_scram(live_pg_server):
    from librarian_spark.sources.pgrepl_client import ReplicationSlotClient

    user = os.environ.get("LIBRARIAN_LIVE_PG_USER", "postgres")
    password = os.environ.get("LIBRARIAN_LIVE_PG_PASSWORD", "postgres")
    db = os.environ.get("LIBRARIAN_LIVE_PG_DB", "postgres")
    c = ReplicationSlotClient.dial(
        live_dsn("pg"),
        slot=os.environ.get("LIBRARIAN_LIVE_PG_SLOT", "librarian_live"),
        publication=os.environ.get("LIBRARIAN_LIVE_PG_PUB", "librarian_pub"),
        db=db,
    )
    try:
        # StartupMessage + SCRAM-SHA-256 against the real server — the exact
        # code path the RFC 7677 vector pins in test_pgrepl_client.py
        c.startup(user=user, database=db, password=password)
    finally:
        c.sock.close()


@pytest.mark.live("pg")
def test_live_pg_replication_end_to_end(tmp_path, live_pg_server):
    """The FULL replication path against a real server: startup + SCRAM,
    wire-level CREATE_REPLICATION_SLOT (temporary, fresh per run),
    INSERT/UPDATE/DELETE issued as simple queries over the SAME walsender
    connection (the reference's replConn pattern), START_REPLICATION from
    the slot's consistent point, pgoutput decode of the live XLogData
    stream, and a commit-granular checkpoint ack. This is the residue the
    mock tests could not reach: real TCP, real WAL, a real walsender's
    framing and keepalives."""
    import uuid

    from librarian_spark.sources.pgrepl_client import (
        ReplicationSlotClient,
        parse_lsn,
    )

    user = os.environ.get("LIBRARIAN_LIVE_PG_USER", "postgres")
    password = os.environ.get("LIBRARIAN_LIVE_PG_PASSWORD", "postgres")
    db = os.environ.get("LIBRARIAN_LIVE_PG_DB", "postgres")
    run = uuid.uuid4().hex[:8]
    c = ReplicationSlotClient.dial(
        live_dsn("pg"),
        slot=f"librarian_e2e_{run}",
        publication=os.environ.get("LIBRARIAN_LIVE_PG_PUB", "librarian_pub"),
        db=db,
        checkpoint_path=str(tmp_path / "ckpt.lsn"),
    )
    try:
        c.startup(user=user, database=db, password=password)
        info = c.create_slot(temporary=True)
        assert info and info["output_plugin"] == "pgoutput"
        base = int(time.time()) % 1_000_000
        k1, k2 = 10_000 + base, 20_000 + base
        c.simple_query(
            f"INSERT INTO live_test(id, name) VALUES ({k1}, 'wire-{run}')"
        )
        c.simple_query(
            f"INSERT INTO live_test(id, name) VALUES ({k2}, 'wire2-{run}')"
        )
        c.simple_query(f"UPDATE live_test SET name = 'upd-{run}' WHERE id = {k1}")
        c.simple_query(f"DELETE FROM live_test WHERE id = {k2}")
        start_lsn = parse_lsn(info["consistent_point"])
        c.start(start_lsn)
        rows = []
        for row in c.stream():
            op, ts_ms, rdb, ns, table, lsn, before, after, _seq = row
            # run-specific filter: values carry -{run}; the delete's pk-only
            # image is matched by ITS key (a blanket op=='d' exemption would
            # admit a concurrent run's deletes on the shared cluster)
            mine = f"-{run}" in (before or "") + (after or "") or (
                op == "d" and f'"id":{k2}' in (before or "")
            )
            if not mine:
                continue  # concurrent activity from other sessions
            rows.append((op, table, before, after))
            if len(rows) >= 4:
                break
        ops = [r[0] for r in rows]
        assert ops == ["c", "c", "u", "d"], f"unexpected op sequence: {ops}"
        assert all(r[1] == "live_test" for r in rows)
        assert f'"name":"wire-{run}"' in rows[0][3]
        assert f'"name":"upd-{run}"' in rows[2][3]
        # delete carries the key image (REPLICA IDENTITY DEFAULT -> pk only)
        assert f'"id":{k2}' in (rows[3][2] or "")
        # commit-granular ack ADVANCED the flushed LSN past the slot's
        # consistent point and persisted it (start() alone sets it TO the
        # start LSN, so >= start would be vacuous)
        assert c.flushed_lsn > start_lsn
        with open(tmp_path / "ckpt.lsn", encoding="utf-8") as fh:
            assert parse_lsn(fh.read().strip()) == c.flushed_lsn
    finally:
        c.sock.close()


@pytest.mark.live("pg")
def test_live_pg_wal_to_spark_materialization(tmp_path, spark, live_pg_server):
    """Real WAL through the WHOLE Spark pipeline: live walsender ->
    ReplicationSlotClient -> PgWalRecorder segments (durable-before-ack) ->
    pgoutput DataSource executor-parallel decode -> keyed max_by
    materialization — the cdc_wire_replication shape with a REAL server
    producing the bytes instead of the mock WAL sender."""
    import uuid

    from pyspark.sql import functions as F

    from librarian_spark.sources import pgoutput as pg
    from librarian_spark.sources.pgrepl_client import (
        ReplicationSlotClient,
        parse_lsn,
    )
    from librarian_spark.sources.recorders import PgWalRecorder

    user = os.environ.get("LIBRARIAN_LIVE_PG_USER", "postgres")
    password = os.environ.get("LIBRARIAN_LIVE_PG_PASSWORD", "postgres")
    db = os.environ.get("LIBRARIAN_LIVE_PG_DB", "postgres")
    run = uuid.uuid4().hex[:8]
    table = f"live_pipe_{run}"
    c = ReplicationSlotClient.dial(
        live_dsn("pg"),
        slot=f"librarian_pipe_{run}",
        publication=f"live_pub_{run}",
        db=db,
        checkpoint_path=str(tmp_path / "ckpt.lsn"),
    )
    wal = str(tmp_path / "wal")
    try:
        c.startup(user=user, database=db, password=password)
        c.simple_query(
            f"CREATE TABLE {table}(id int primary key, name text, bal float8)"
        )
        c.simple_query(f"CREATE PUBLICATION live_pub_{run} FOR TABLE {table}")
        # slot AFTER the DDL: only the three DML transactions below sit past
        # the consistent point, so a bounded drain of 3 txns is exact
        info = c.create_slot(temporary=True)
        c.simple_query(
            f"INSERT INTO {table} VALUES (1,'a',1.5),(2,'b',2.5),(3,'c',3.5)"
        )
        c.simple_query(f"UPDATE {table} SET bal = -1.0 WHERE id = 2")
        c.simple_query(f"DELETE FROM {table} WHERE id = 3")
        c.start(parse_lsn(info["consistent_point"]))
        n = PgWalRecorder(wal, txns_per_segment=2).record(c, max_txns=3)
        assert n == 3
    finally:
        try:
            # best-effort cleanup on a fresh connection (the replication
            # conn may be mid-COPY); leaked tables only bloat the throwaway
            # cluster
            c2 = ReplicationSlotClient.dial(
                live_dsn("pg"), slot="x", publication="x", db=db
            )
            c2.startup(user=user, database=db, password=password)
            c2.simple_query(f"DROP TABLE IF EXISTS {table}")
            c2.simple_query(f"DROP PUBLICATION IF EXISTS live_pub_{run}")
            c2.sock.close()
        except Exception:  # noqa: BLE001
            pass
        c.sock.close()

    pg.register(spark)
    ev = (
        spark.read.format("pgoutput")
        .option("path", wal)
        .option("db", db)
        .load()
    )
    seq = F.split(F.col("position"), ":").getItem(1).cast("long")
    keyed = ev.withColumn(
        "k",
        F.coalesce(
            F.get_json_object("after", "$.id"),
            F.get_json_object("before", "$.id"),
        ).cast("long"),
    ).withColumn("seq", seq)
    last = keyed.groupBy("k").agg(
        F.max_by(F.struct("op", "after"), F.struct("lsn", "seq")).alias("last")
    )
    final = {
        (r.id, r.name, r.bal)
        for r in last.filter(F.col("last.op") != "d")
        .select(
            F.col("k").alias("id"),
            F.get_json_object("last.after", "$.name").alias("name"),
            F.get_json_object("last.after", "$.bal").cast("double").alias("bal"),
        )
        .collect()
    }
    assert final == {(1, "a", 1.5), (2, "b", -1.0)}


@pytest.mark.live("mongo")
def test_live_mongo_hello_and_ping():
    from librarian_spark.sources.mongo_wire import MongoChangeStreamClient

    c = MongoChangeStreamClient.dial(
        live_dsn("mongo"),
        db=os.environ.get("LIBRARIAN_LIVE_MONGO_DB", "test"),
        collection=os.environ.get("LIBRARIAN_LIVE_MONGO_COLL", "live_test"),
    )
    try:
        # hello (wire-version gate) + ping, the connection handshake the
        # mock-mongod tests pin byte-level
        c.connect()
    finally:
        c.sock.close()


@pytest.mark.live("pg")
def test_live_pg_tls_replication_end_to_end(tmp_path, live_pg_server):
    """sslmode=require against the real server: SSLRequest → 'S' → TLS
    wrap → SCRAM over the encrypted channel → temporary slot → real WAL
    decoded over TLS. The provisioner enables ssl=on via a reload with a
    self-signed cert; a server still answering 'N' (reload failed) skips
    rather than fails — TLS is additive to the cleartext e2e above."""
    import uuid

    from librarian_spark.sources.pgrepl_client import (
        ReplicationSlotClient,
        parse_lsn,
    )

    user = os.environ.get("LIBRARIAN_LIVE_PG_USER", "postgres")
    password = os.environ.get("LIBRARIAN_LIVE_PG_PASSWORD", "postgres")
    db = os.environ.get("LIBRARIAN_LIVE_PG_DB", "postgres")
    run = uuid.uuid4().hex[:8]
    try:
        c = ReplicationSlotClient.dial(
            live_dsn("pg"),
            sslmode="require",
            slot=f"librarian_tls_{run}",
            publication=os.environ.get("LIBRARIAN_LIVE_PG_PUB", "librarian_pub"),
            db=db,
        )
    except ConnectionError as e:
        if "refused SSL" in str(e):
            pytest.skip("live server has ssl off (reload-enable failed)")
        raise
    try:
        import ssl as _ssl

        assert isinstance(c.sock, _ssl.SSLSocket)  # actually encrypted
        c.startup(user=user, database=db, password=password)  # SCRAM in TLS
        info = c.create_slot(temporary=True)
        assert info and info["output_plugin"] == "pgoutput"
        k = 30_000 + int.from_bytes(os.urandom(3), "big")  # collision-free id
        c.simple_query(
            f"INSERT INTO live_test(id, name) VALUES ({k}, 'tls-{run}')"
        )
        # no queries after this point: START_REPLICATION puts the
        # connection in CopyBoth mode where simple queries are invalid
        c.start(parse_lsn(info["consistent_point"]))
        for row in c.stream():
            op, _ts, _db, _ns, table, _lsn, _before, after, _seq = row
            if f"tls-{run}" in (after or ""):
                assert op == "c" and table == "live_test"
                break
    finally:
        c.sock.close()


@pytest.mark.live("pg")
def test_live_pg_tls_verify_full_with_sslrootcert(live_pg_server):
    """sslmode=verify-full + sslrootcert against the real server: the
    provisioner's self-signed cert (IP subjectAltName 127.0.0.1) is its
    own CA, so trusting exactly that file must let full verification pass
    — and the SAME mode WITHOUT the CA file must fail certificate
    verification against the system store, proving the check is real and
    not silently CERT_NONE."""
    import ssl as _ssl
    import uuid

    from librarian_spark.sources.pgrepl_client import ReplicationSlotClient

    crt = "/tmp/librarian_live_pgdata/server.crt"
    if not os.path.exists(crt) or not os.access(crt, os.R_OK):
        pytest.skip("provisioner cert not readable (external live server?)")

    user = os.environ.get("LIBRARIAN_LIVE_PG_USER", "postgres")
    password = os.environ.get("LIBRARIAN_LIVE_PG_PASSWORD", "postgres")
    db = os.environ.get("LIBRARIAN_LIVE_PG_DB", "postgres")
    run = uuid.uuid4().hex[:8]

    # negative first: verify-full with only the system CA store must
    # REJECT the self-signed server cert
    with pytest.raises(_ssl.SSLCertVerificationError):
        ReplicationSlotClient.dial(
            live_dsn("pg"), sslmode="verify-full",
            slot=f"vf_neg_{run}", publication="librarian_pub", db=db,
        )

    # positive: trust the server's own cert as the root
    try:
        c = ReplicationSlotClient.dial(
            live_dsn("pg"), sslmode="verify-full", sslrootcert=crt,
            slot=f"vf_{run}", publication="librarian_pub", db=db,
        )
    except ConnectionError as e:
        if "refused SSL" in str(e):
            pytest.skip("live server has ssl off (reload-enable failed)")
        raise
    try:
        assert isinstance(c.sock, _ssl.SSLSocket)
        peer = c.sock.getpeercert()
        assert ("IP Address", "127.0.0.1") in peer.get("subjectAltName", ())
        c.startup(user=user, database=db, password=password)
        info = c.create_slot(temporary=True)  # full auth'd round-trip works
        assert info and info["output_plugin"] == "pgoutput"
    finally:
        c.sock.close()


@pytest.mark.live("pg")
def test_pgsnapshot_datasource_parallel_consistent_read(
    tmp_path, spark, live_pg_server
):
    """The cluster half of the initial-snapshot handoff: N input
    partitions, each a SEPARATE wire connection opened executor-side,
    import the SAME exported snapshot and scan disjoint ctid page ranges.
    Rows committed AFTER slot creation must be invisible to every
    partition (consistency across independent connections — PostgreSQL's
    cross-connection snapshot sharing), while a plain read without the
    snapshot sees them."""
    import uuid

    from librarian_spark.sources.pg_snapshot import register
    from librarian_spark.sources.pgrepl_client import ReplicationSlotClient

    user = os.environ.get("LIBRARIAN_LIVE_PG_USER", "postgres")
    password = os.environ.get("LIBRARIAN_LIVE_PG_PASSWORD", "postgres")
    db = os.environ.get("LIBRARIAN_LIVE_PG_DB", "postgres")
    run = uuid.uuid4().hex[:8]
    table, slot = f"ps_{run}", f"ps_slot_{run}"
    url = f"postgres://{user}:{password}@{live_pg_server}/{db}"

    ctl = ReplicationSlotClient.dial(live_dsn("pg"), slot="x",
                                     publication="x", db=db)
    ctl.startup(user=user, database=db, password=password)
    slot_conn = None
    try:
        ctl.simple_query(
            f"CREATE TABLE {table}(id int primary key, v text)"
        )
        ctl.simple_query(
            f"INSERT INTO {table} "
            "SELECT g, repeat('x', 40) FROM generate_series(1, 1000) g"
        )
        ctl.simple_query(f"ANALYZE {table}")  # populate relpages stats

        # the slot-creating walsender connection exports the snapshot and
        # must stay IDLE until the read job finishes (validity contract)
        slot_conn = ReplicationSlotClient.dial(
            live_dsn("pg"), slot=slot, publication="x", db=db
        )
        slot_conn.startup(user=user, database=db, password=password)
        info = slot_conn.create_slot()
        assert info and info["snapshot_name"]

        # post-slot rows: the stream's territory, not the snapshot's
        ctl.simple_query(
            f"INSERT INTO {table} "
            "SELECT g, 'late' FROM generate_series(1001, 1100) g"
        )

        register(spark)
        snap_df = (
            spark.read.format("pgsnapshot")
            .option("url", url)
            .option("table", f"public.{table}")
            .option("snapshot", info["snapshot_name"])
            .option("partitions", "4")
            .load()
        )
        assert snap_df.rdd.getNumPartitions() == 4  # truly parallel
        got = sorted(r["id"] for r in snap_df.collect())
        assert got == list(range(1, 1001)), (
            f"snapshot visibility broke: {len(got)} rows, "
            f"tail {got[-5:] if got else []}"
        )
        assert [f.dataType.simpleString() for f in snap_df.schema.fields] \
            == ["int", "string"]  # decoder's int4/text typing rule

        # same source WITHOUT the snapshot: current state, late rows seen
        cur_df = (
            spark.read.format("pgsnapshot")
            .option("url", url)
            .option("table", f"public.{table}")
            .option("partitions", "4")
            .load()
        )
        assert cur_df.count() == 1100
    finally:
        if slot_conn is not None:
            slot_conn.sock.close()  # non-temporary slot: drop explicitly
        try:
            ctl.simple_query(f"DROP TABLE IF EXISTS {table}")
            ctl.simple_query(f"DROP_REPLICATION_SLOT {slot}")
        except Exception:  # noqa: BLE001 — cleanup is best-effort
            pass
        ctl.sock.close()
