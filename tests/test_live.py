"""Live-service integration: the SAME wire clients the mock tests pin,
dialed at a real postgres/mongod/kafka over TCP.

Skipped by default — this sandbox has no services (SURVEY §2A #23). To run
(e.g. against the reference's own dev/compose.yml stack):

    LIBRARIAN_LIVE_KAFKA_DSN=localhost:9092 \
    LIBRARIAN_LIVE_PG_DSN=localhost:5432 \
    LIBRARIAN_LIVE_MONGO_DSN=localhost:27017 \
        python -m pytest tests/test_live.py -m live -q

Each test exercises the smallest real-server round-trip that proves the
dial + handshake path: Kafka Metadata v9 + one produced record, Postgres
StartupMessage + SCRAM-SHA-256 auth, Mongo hello + ping.
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
def test_live_pg_startup_and_scram():
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
