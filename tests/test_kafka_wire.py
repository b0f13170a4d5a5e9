"""Kafka producer wire client against a mock broker speaking the public
Kafka protocol: framed header-v2 requests, Metadata v9 partition discovery,
Produce v9 with magic-v2 record batches (CRC32C-validated by the broker's
log layer), the reference's producer tuning (acks=1, retries=3,
batch.size=16384, linger.ms=5 — `internal/integrations/kafka/
repository.go:45-60`), its `{db}.{schema}.{table}` key format
(`repository.go:152-157`), and byte-identical envelope read-back from the
broker's log.
"""

from __future__ import annotations

import struct

import pytest

from librarian_spark.sources.kafka_mock import MockKafkaBroker, read_klog, dump_klog
from librarian_spark.sources.kafka_wire import (
    KafkaProducerClient,
    KafkaProtocolError,
    crc32c,
    decode_record_batch,
    decode_uvarint,
    decode_varint,
    encode_record_batch,
    encode_uvarint,
    encode_varint,
)


# -- primitives -------------------------------------------------------------


def test_crc32c_check_value():
    # the standard CRC32C (Castagnoli) check vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_varint_round_trips():
    for n in [0, 1, 127, 128, 300, 2**31 - 1]:
        assert decode_uvarint(encode_uvarint(n), 0) == (n, len(encode_uvarint(n)))
    for n in [0, -1, 1, -64, 63, 12345, -12345, 2**40, -(2**40)]:
        buf = encode_varint(n)
        assert decode_varint(buf, 0) == (n, len(buf))


def test_record_batch_round_trip_and_crc():
    recs = [
        (1_700_000_000_000, b"k1", b"v1"),
        (1_700_000_000_007, None, b"v2"),
        (1_700_000_000_003, b"k3", b"longer value bytes \x00\xff"),
    ]
    raw = encode_record_batch(recs, base_offset=41)
    batch, end = decode_record_batch(raw)
    assert end == len(raw)
    assert batch["crc_ok"] and batch["base_offset"] == 41
    assert [(o, t, k, v) for o, t, k, v in batch["records"]] == [
        (41, 1_700_000_000_000, b"k1", b"v1"),
        (42, 1_700_000_000_007, None, b"v2"),
        (43, 1_700_000_000_003, b"k3", b"longer value bytes \x00\xff"),
    ]
    # a single flipped payload bit must fail the CRC
    corrupt = bytearray(raw)
    corrupt[-1] ^= 0x01
    assert not decode_record_batch(bytes(corrupt))[0]["crc_ok"]


# -- client ↔ broker --------------------------------------------------------


def _client(broker, **kw):
    sock, thread = broker.connect()
    c = KafkaProducerClient(sock, topic=broker.topic, **kw)
    return c, sock, thread


def test_metadata_discovers_partitions():
    broker = MockKafkaBroker("librarian.events", n_partitions=6)
    c, sock, _ = _client(broker)
    assert c.connect() == [0, 1, 2, 3, 4, 5]
    meta_reqs = [r for r in broker.requests if r["api"] == "metadata"]
    assert meta_reqs[0]["topics"] == ["librarian.events"]
    assert meta_reqs[0]["client_id"] == "librarian-replicator"
    assert meta_reqs[0]["api_version"] == 9
    sock.close()


def test_produce_round_trip_byte_identical():
    broker = MockKafkaBroker("librarian.events", n_partitions=4)
    c, sock, _ = _client(broker, linger_ms=10_000)  # flush() drives egress
    c.connect()
    msgs = [
        (f"appdb.public.t{i % 3}".encode(), f'{{"n":{i}}}'.encode())
        for i in range(50)
    ]
    for k, v in msgs:
        c.produce(k, v, timestamp_ms=1_700_000_000_000 + len(v))
    reports = c.flush()
    assert sum(r["count"] for r in reports) == 50

    rows = []
    for p in range(4):
        if broker.log[p]:
            import tempfile, os

            with tempfile.TemporaryDirectory() as d:
                paths = dump_klog(broker, d)
                for path in paths:
                    rows += read_klog(path)
                break
    # byte-identical key+value multiset, CRC-verified on the way out
    assert sorted((k, v) for _, _, _, k, v in rows) == sorted(msgs)
    # per-partition offsets are contiguous from 0
    by_p: dict[int, list[int]] = {}
    for p, off, _, _, _ in rows:
        by_p.setdefault(p, []).append(off)
    for offs in by_p.values():
        assert sorted(offs) == list(range(len(offs)))
    # keyed consistency: every copy of a key landed on ONE partition
    key_parts: dict[bytes, set[int]] = {}
    for p, _, _, k, _ in rows:
        key_parts.setdefault(k, set()).add(p)
    assert all(len(ps) == 1 for ps in key_parts.values())
    sock.close()


def test_reference_tuning_on_the_wire():
    """acks=1, request.timeout.ms=5000, client.id=librarian-replicator —
    the exact values the reference configures — must appear in the Produce
    request itself."""
    broker = MockKafkaBroker("t", n_partitions=1)
    c, sock, _ = _client(broker, linger_ms=10_000)
    c.connect()
    c.produce(b"appdb.public.users", b"{}", timestamp_ms=1)
    c.flush()
    preq = [r for r in broker.requests if r["api"] == "produce"][0]
    assert preq["acks"] == 1
    assert preq["timeout_ms"] == 5000
    assert preq["client_id"] == "librarian-replicator"
    assert preq["api_version"] == 9
    sock.close()


def test_batch_size_triggers_flush_without_explicit_flush():
    """batch.size=16384: crossing the byte budget flushes mid-produce (the
    reference's repository.Flush is a no-op BECAUSE the producer batches)."""
    broker = MockKafkaBroker("t", n_partitions=1)
    c, sock, _ = _client(broker, batch_size=2_000, linger_ms=10_000)
    c.connect()
    v = b"x" * 100
    for i in range(40):
        c.produce(b"appdb.public.users", v, timestamp_ms=i)
    produces = [r for r in broker.requests if r["api"] == "produce"]
    assert len(produces) >= 2  # batched, not one-request-per-message
    c.flush()
    assert broker.next_offset[0] == 40
    sock.close()


def test_linger_ms_flushes_aged_batches():
    import time

    broker = MockKafkaBroker("t", n_partitions=1)
    c, sock, _ = _client(broker, linger_ms=5)
    c.connect()
    c.produce(b"appdb.public.users", b"{}", timestamp_ms=1)
    time.sleep(0.02)
    c.produce(b"appdb.public.users", b"{}", timestamp_ms=2)  # linger expired
    produces = [r for r in broker.requests if r["api"] == "produce"]
    assert produces, "aged batch should have flushed on the next produce"
    sock.close()


def test_linger_flushes_quiet_partition_on_other_partition_produce():
    """The linger check must age EVERY pending partition: one message on a
    quiet partition must ship once linger expires even when all subsequent
    produces land on a different partition (the indefinite-delay trap)."""
    import time

    broker = MockKafkaBroker("t", n_partitions=4)
    c, sock, _ = _client(broker, linger_ms=5)
    c.connect()
    # two keys that hash to different partitions
    keys = [f"appdb.public.t{i}".encode() for i in range(16)]
    k_a = keys[0]
    k_b = next(k for k in keys if c.partition_for(k) != c.partition_for(k_a))
    p_b = c.partition_for(k_b)
    c.produce(k_b, b"{}", timestamp_ms=1)  # lone message, quiet partition
    time.sleep(0.02)
    c.produce(k_a, b"{}", timestamp_ms=2)  # different partition
    assert broker.next_offset.get(p_b, 0) == 1, (
        "aged batch on the quiet partition must flush without an explicit "
        "flush() even though later produces hit another partition"
    )
    sock.close()


def test_produce_response_multi_topic_decodes():
    """decode_produce_response must consume the topic-level tagged-field
    byte — a two-topic response misparses from topic 2 on without it."""
    from librarian_spark.sources.kafka_wire import (
        decode_produce_response,
        encode_produce_response,
    )

    one = encode_produce_response(7, "alpha", [(0, 0, 41)])
    two = encode_produce_response(7, "beta", [(3, 0, 99)])
    # splice beta's topic entry into alpha's response. Layout: corr(4) +
    # header-tags(1) + topic-count(1, compact: n+1) + topic-entry... +
    # throttle(4) + response-tags(1) — so [6:-5] is the topic entry and the
    # count byte is bumped 2 -> 3 for two topics.
    assert one[5] == 2 and two[5] == 2
    spliced = one[:5] + encode_uvarint(3) + one[6:-5] + two[6:-5] + one[-5:]
    out = decode_produce_response(spliced)
    assert out["alpha"][0]["base_offset"] == 41
    assert out["beta"][3]["base_offset"] == 99


def test_retriable_error_retries_then_succeeds():
    broker = MockKafkaBroker("t", n_partitions=2, fail_produces=2)
    c, sock, _ = _client(broker, linger_ms=10_000)
    c.connect()
    c.produce(b"appdb.public.users", b'{"a":1}', timestamp_ms=1)
    reports = c.flush()
    assert reports[0]["base_offset"] == 0 and reports[0]["count"] == 1
    produces = [r for r in broker.requests if r["api"] == "produce"]
    metas = [r for r in broker.requests if r["api"] == "metadata"]
    assert len(produces) == 3  # 2 NOT_LEADER failures + 1 success
    assert len(metas) == 3  # connect + one refresh per retry
    sock.close()


def test_retries_exhausted_raises():
    broker = MockKafkaBroker("t", n_partitions=1, fail_produces=99)
    c, sock, _ = _client(broker, retries=3, linger_ms=10_000)
    c.connect()
    c.produce(b"k", b"v", timestamp_ms=1)
    with pytest.raises(KafkaProtocolError) as ei:
        c.flush()
    assert ei.value.code == 6  # NOT_LEADER_OR_FOLLOWER
    produces = [r for r in broker.requests if r["api"] == "produce"]
    assert len(produces) == 4  # initial + 3 retries, then fail loudly
    sock.close()


def test_acks_zero_fire_and_forget():
    """acks=0 is the protocol's no-response mode: the client must NOT wait
    (a read would hang forever — the broker sends nothing)."""
    broker = MockKafkaBroker("t", n_partitions=1)
    c, sock, _ = _client(broker, acks=0, linger_ms=10_000)
    c.connect()
    c.produce(b"k", b"v", timestamp_ms=1)
    reports = c.flush()
    assert reports[0]["base_offset"] == -1  # no broker confirmation
    # the broker still appended it
    import time

    for _ in range(100):
        if broker.next_offset[0] == 1:
            break
        time.sleep(0.01)
    assert broker.next_offset[0] == 1
    sock.close()


def test_corrupt_batch_rejected_by_broker_log_layer():
    """The mock validates CRC like a real broker: hand-corrupt a batch and
    produce it raw — INVALID_RECORD (87), nothing appended."""
    import socket as socket_mod

    from librarian_spark.sources.kafka_wire import (
        encode_produce_request,
        encode_request_header,
        decode_produce_response,
        read_frame,
        write_frame,
    )

    broker = MockKafkaBroker("t", n_partitions=1)
    sock, _ = broker.connect()
    batch = bytearray(encode_record_batch([(1, b"k", b"v")]))
    batch[-1] ^= 0x01
    hdr = encode_request_header(0, 9, 7, "librarian-replicator")
    write_frame(
        sock, hdr + encode_produce_request("t", 1, 5000, {0: bytes(batch)})
    )
    resp = decode_produce_response(read_frame(sock))
    assert resp["t"][0]["error"] == 87
    assert broker.next_offset[0] == 0
    sock.close()


def test_envelope_egress_key_format_end_to_end(spark):
    """The reference's Write(): key = {db}.{schema}.{table}, value = the
    JSON envelope — produced through the wire and read back byte-identical
    from the broker log (`repository.go:142-183`)."""
    from librarian_spark.streaming.envelope import (
        kafka_key,
        snapshot_as_events,
    )

    df = spark.createDataFrame(
        [(1, "alice"), (2, "bob")], "id int, name string"
    )
    ev = snapshot_as_events(
        df, db="appdb", schema="public", table="users"
    ).select("key", "value")
    rows = ev.collect()
    assert all(r["key"] == "appdb.public.users" for r in rows)

    broker = MockKafkaBroker("librarian.cdc", n_partitions=4)
    c, sock, _ = _client(broker, linger_ms=10_000)
    c.connect()
    for r in rows:
        c.produce(r["key"].encode(), r["value"].encode(), timestamp_ms=1)
    c.flush()
    got = []
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        for path in dump_klog(broker, d):
            got += read_klog(path)
    assert sorted(v for _, _, _, _, v in got) == sorted(
        r["value"].encode() for r in rows
    )
    assert {k for _, _, _, k, _ in got} == {b"appdb.public.users"}
    sock.close()


# -- snappy compression (attributes=2, xerial framing) -----------------------


def test_snappy_codec_round_trips_and_format_conformance():
    """Pure-Python snappy: raw-block + xerial round trips across edge shapes,
    plus a HAND-BUILT conformance vector (literal + 1-byte-offset copy over
    an overlapping RLE run) decoded independently of our compressor."""
    import os
    import random

    from librarian_spark.sources.snappy_codec import (
        XERIAL_HEADER,
        compress_block,
        decompress_block,
        xerial_compress,
        xerial_decompress,
    )

    random.seed(11)
    cases = [
        b"",
        b"a",
        b"abc",
        b"a" * 100,
        b"ab" * 5000,
        bytes(range(256)) * 300,
        os.urandom(70_000),  # incompressible, crosses the 64 KiB fragment
        b"x" * 70_000 + os.urandom(40) + b"x" * 70_000,
    ] + [
        bytes(random.choices(b'abcdef{}:,"0123456789', k=random.randint(0, 4000)))
        for _ in range(25)
    ]
    for c in cases:
        assert decompress_block(compress_block(c)) == c
        assert xerial_decompress(xerial_compress(c)) == c
        # bare raw blocks are accepted (old-producer compatibility)
        assert xerial_decompress(compress_block(c)) == c
    # compression must actually compress the repetitive-JSON shape the
    # envelopes have
    j = b'{"op":"u","table":"public.users","id":12345}' * 400
    assert len(compress_block(j)) < len(j) // 5
    # xerial header: magic + version=1 + compat=1, big-endian
    assert XERIAL_HEADER == bytes.fromhex("82534e41505059000000000100000001")
    # format conformance independent of the compressor: uvarint(10),
    # literal 'a', then a copy1 of length 9 at offset 1 == "a" * 10
    hand = bytes([10, 0x00]) + b"a" + bytes([0x01 | ((9 - 4) << 2), 1])
    assert decompress_block(hand) == b"a" * 10
    # strict failure modes
    for bad in [bytes([10, 0x00]) + b"a", bytes([2, 0x01, 0x05])]:
        try:
            decompress_block(bad)
            raise AssertionError("should have raised")
        except (ValueError, IndexError):
            pass


def test_compressed_batch_wire_round_trip():
    """attributes=2 batches: records section xerial-compressed, CRC over
    the compressed bytes, decode transparently returns the records."""
    recs = [
        (1_700_000_000_000 + i, b"db.public.users", b'{"f":%d}' % (i % 7))
        for i in range(200)
    ]
    plain = encode_record_batch(recs)
    comp = encode_record_batch(recs, compression="snappy")
    assert len(comp) < len(plain) // 2, "repetitive records should compress"
    (attributes,) = struct.unpack_from(">h", comp, 21)
    assert attributes & 0x07 == 2
    batch, end = decode_record_batch(comp)
    assert end == len(comp) and batch["crc_ok"] and batch["codec"] == 2
    assert [(t, k, v) for _, t, k, v in batch["records"]] == recs
    # a flipped bit inside the COMPRESSED payload fails the CRC
    corrupt = bytearray(comp)
    corrupt[-1] ^= 0x01
    assert not decode_record_batch(bytes(corrupt))[0]["crc_ok"]


def test_broker_validates_compressed_batches_structurally():
    """A compressed batch whose xerial frame is broken but whose CRC was
    RE-STAMPED to match (CRC alone can't catch it) must still be rejected
    by the broker's log layer, which decodes through the codec."""
    from librarian_spark.sources.kafka_wire import (
        decode_produce_response,
        encode_produce_request,
        encode_request_header,
        read_frame,
        write_frame,
    )

    broker = MockKafkaBroker("t", n_partitions=1)
    sock, _ = broker.connect()
    raw = bytearray(encode_record_batch([(1, b"k", b"v" * 100)], compression="snappy"))
    # corrupt the xerial magic inside the records section (offset: 8 base_offset +
    # 4 length + 4 epoch + 1 magic + 4 crc + 40 batch header = 61)
    raw[61] ^= 0xFF
    # re-stamp the CRC so only structural validation can reject it
    raw[17:21] = struct.pack(">I", crc32c(bytes(raw[21:])))
    hdr = encode_request_header(0, 9, 7, "librarian-replicator")
    write_frame(sock, hdr + encode_produce_request("t", 1, 5000, {0: bytes(raw)}))
    resp = decode_produce_response(read_frame(sock))
    assert resp["t"][0]["error"] == 87
    assert broker.next_offset[0] == 0
    sock.close()


def test_producer_default_matches_reference_compression():
    """The client's default mirrors the reference's compression.type=snappy
    (`kafka/repository.go:54`): batches on the broker log carry codec=2 and
    read back intact through the shared decoder."""
    broker = MockKafkaBroker("librarian.events", n_partitions=2)
    c, sock, _ = _client(broker)
    c.connect()
    for i in range(50):
        c.produce(b"db.public.users", b'{"seq":%d,"pad":"%s"}' % (i, b"z" * 64))
    c.flush()
    batches = []
    for p, buf in broker.log.items():
        pos = 0
        while pos < len(buf):
            b, pos = decode_record_batch(buf, pos)
            batches.append(b)
    assert batches, "broker log should hold batches"
    assert all(b["codec"] == 2 and b["crc_ok"] for b in batches)
    n = sum(len(b["records"]) for b in batches)
    assert n == 50
    sock.close()
