"""Pure-Python Kafka producer wire client (Produce/Metadata v9).

The reference's replicate loop produces every envelope to Kafka through
librdkafka (`/root/reference/internal/integrations/kafka/repository.go:45-60,
142-183`): key ``{db}.{schema}.{table}``, JSON envelope value, and the tuning
block ``acks=1, retries=3, batch.size=16384, linger.ms=5,
request.timeout.ms=5000``. No broker, connector jar, or client library exists
in this sandbox (evidence in SURVEY §2A #23), so — exactly like the Postgres
replication and Mongo OP_MSG clients — this module implements the PUBLIC
Kafka wire protocol itself, from the Apache Kafka protocol guide
(https://kafka.apache.org/protocol): framed requests with header v2, compact
(flexible) encodings, Metadata v9 for partition discovery, Produce v9
carrying magic-v2 record batches with CRC32C integrity, and the producer
semantics the reference configures (acks, bounded retries on retriable
errors, byte-budget batching with linger).

Compression: the reference asks librdkafka for snappy
(`kafka/repository.go:54`); batches here carry attributes=2 with the
records section xerial-framed-snappy compressed via the pure-Python codec
in :mod:`librarian_spark.sources.snappy_codec` (no snappy library is
importable in this sandbox). The CRC32C covers the COMPRESSED bytes, per
the protocol guide.

Everything here is public protocol knowledge; nothing is derived from the
reference's (closed) librdkafka internals.
"""

from __future__ import annotations

import struct
import time
import zlib

from librarian_spark.sources.snappy_codec import (
    xerial_compress,
    xerial_decompress,
)

__all__ = [
    "API_PRODUCE",
    "API_METADATA",
    "ERR_NONE",
    "ERR_NOT_LEADER_OR_FOLLOWER",
    "ERR_REQUEST_TIMED_OUT",
    "KafkaProducerClient",
    "KafkaProtocolError",
    "crc32c",
    "decode_record_batch",
    "encode_record_batch",
    "read_frame",
    "write_frame",
]

API_PRODUCE = 0
API_METADATA = 3

ERR_NONE = 0
ERR_NOT_LEADER_OR_FOLLOWER = 6
ERR_REQUEST_TIMED_OUT = 7
# the retriable subset the client backs off on (public error-code table)
RETRIABLE_ERRORS = {ERR_NOT_LEADER_OR_FOLLOWER, ERR_REQUEST_TIMED_OUT}


class KafkaProtocolError(RuntimeError):
    """A broker-reported, non-retriable (or retries-exhausted) error."""

    def __init__(self, code: int, where: str):
        super().__init__(f"kafka error {code} in {where}")
        self.code = code


# --------------------------------------------------------------------------
# CRC32C (Castagnoli) — record-batch integrity. Table-driven, reflected
# polynomial 0x82F63B78; check value crc32c(b"123456789") == 0xE3069283.
# --------------------------------------------------------------------------

def _make_crc32c_table() -> list[int]:
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
        table.append(c)
    return table


_CRC32C_TABLE = _make_crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    tab = _CRC32C_TABLE
    for b in data:
        crc = tab[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# --------------------------------------------------------------------------
# Primitive encodings: varints + compact (flexible) types
# --------------------------------------------------------------------------

def encode_uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift, n = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def encode_varint(n: int) -> bytes:
    """Zigzag varint (record-field lengths/deltas)."""
    return encode_uvarint((n << 1) ^ (n >> 63))


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    u, pos = decode_uvarint(buf, pos)
    return (u >> 1) ^ -(u & 1), pos


def encode_compact_string(s: str | None) -> bytes:
    if s is None:
        return b"\x00"
    b = s.encode("utf-8")
    return encode_uvarint(len(b) + 1) + b


def decode_compact_string(buf: bytes, pos: int) -> tuple[str | None, int]:
    n, pos = decode_uvarint(buf, pos)
    if n == 0:
        return None, pos
    n -= 1
    return buf[pos : pos + n].decode("utf-8"), pos + n


def encode_compact_bytes(b: bytes | None) -> bytes:
    if b is None:
        return b"\x00"
    return encode_uvarint(len(b) + 1) + b


def decode_compact_bytes(buf: bytes, pos: int) -> tuple[bytes | None, int]:
    n, pos = decode_uvarint(buf, pos)
    if n == 0:
        return None, pos
    n -= 1
    return buf[pos : pos + n], pos + n


def encode_legacy_string(s: str | None) -> bytes:
    """int16-length string — request header v2 keeps client_id legacy."""
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode("utf-8")
    return struct.pack(">h", len(b)) + b


def decode_legacy_string(buf: bytes, pos: int) -> tuple[str | None, int]:
    (n,) = struct.unpack_from(">h", buf, pos)
    pos += 2
    if n < 0:
        return None, pos
    return buf[pos : pos + n].decode("utf-8"), pos + n


_EMPTY_TAGS = b"\x00"  # tagged-field count 0


# --------------------------------------------------------------------------
# Framing + headers
# --------------------------------------------------------------------------

def write_frame(sock, payload: bytes) -> None:
    sock.sendall(struct.pack(">i", len(payload)) + payload)


def _read_exact(sock, n: int) -> bytes:
    out = b""
    while len(out) < n:
        chunk = sock.recv(n - len(out))
        if not chunk:
            raise ConnectionError("kafka peer closed the connection")
        out += chunk
    return out


def read_frame(sock) -> bytes:
    (n,) = struct.unpack(">i", _read_exact(sock, 4))
    return _read_exact(sock, n)


def encode_request_header(
    api_key: int, api_version: int, correlation_id: int, client_id: str
) -> bytes:
    """Request header v2 (flexible APIs): client_id stays LEGACY-encoded."""
    return (
        struct.pack(">hhi", api_key, api_version, correlation_id)
        + encode_legacy_string(client_id)
        + _EMPTY_TAGS
    )


def decode_request_header(buf: bytes) -> tuple[dict, int]:
    api_key, api_version, corr = struct.unpack_from(">hhi", buf, 0)
    client_id, pos = decode_legacy_string(buf, 8)
    _, pos = decode_uvarint(buf, pos)  # tag count (0)
    return (
        {
            "api_key": api_key,
            "api_version": api_version,
            "correlation_id": corr,
            "client_id": client_id,
        },
        pos,
    )


# --------------------------------------------------------------------------
# Record batch v2 (magic 2) — the on-wire AND on-log format
# --------------------------------------------------------------------------

def _encode_record(
    offset_delta: int, ts_delta: int, key: bytes | None, value: bytes | None
) -> bytes:
    body = (
        b"\x00"  # record attributes (unused)
        + encode_varint(ts_delta)
        + encode_varint(offset_delta)
        + (encode_varint(-1) if key is None
           else encode_varint(len(key)) + key)
        + (encode_varint(-1) if value is None
           else encode_varint(len(value)) + value)
        + encode_varint(0)  # headers
    )
    return encode_varint(len(body)) + body


def encode_record_batch(
    records: list[tuple[int, bytes | None, bytes | None]],
    base_offset: int = 0,
    compression: str | None = None,
) -> bytes:
    """``records`` = [(timestamp_ms, key, value)] → one magic-v2 batch.

    Layout per the public protocol guide: the CRC is CRC32C over everything
    from ``attributes`` to the end (compressed bytes when a codec is set);
    ``batchLength`` counts the bytes after itself; producerId/epoch/sequence
    are -1 (non-transactional, non-idempotent — matching the reference's
    plain producer). ``compression="snappy"`` sets attributes=2 and
    xerial-frames the records section, the exact on-wire shape Kafka
    clients produce for snappy.
    """
    if not records:
        raise ValueError("empty record batch")
    base_ts = records[0][0]
    max_ts = max(r[0] for r in records)
    recs = b"".join(
        _encode_record(i, ts - base_ts, k, v)
        for i, (ts, k, v) in enumerate(records)
    )
    if compression is None:
        attributes = 0
    elif compression == "snappy":
        attributes = 2
        recs = xerial_compress(recs)
    else:
        raise ValueError(f"unsupported compression {compression!r}")
    after_crc = (
        struct.pack(">h", attributes)  # codec bits 0-2, create-time
        + struct.pack(">i", len(records) - 1)  # lastOffsetDelta
        + struct.pack(">q", base_ts)
        + struct.pack(">q", max_ts)
        + struct.pack(">q", -1)  # producerId
        + struct.pack(">h", -1)  # producerEpoch
        + struct.pack(">i", -1)  # baseSequence
        + struct.pack(">i", len(records))
        + recs
    )
    crc = crc32c(after_crc)
    tail = struct.pack(">ibI", 0, 2, crc) + after_crc  # epoch, magic, crc
    return struct.pack(">qi", base_offset, len(tail)) + tail


def decode_record_batch(buf: bytes, pos: int = 0) -> tuple[dict, int]:
    """One batch → {base_offset, crc_ok, records: [(offset, ts, key, value)]}
    plus the position after the batch (klog files concatenate batches)."""
    base_offset, batch_len = struct.unpack_from(">qi", buf, pos)
    body = buf[pos + 12 : pos + 12 + batch_len]
    _epoch, magic, crc = struct.unpack_from(">ibI", body, 0)
    if magic != 2:
        raise ValueError(f"unsupported record-batch magic {magic}")
    after = body[9:]
    crc_ok = crc32c(after) == crc  # CRC covers the compressed bytes
    attributes, = struct.unpack_from(">h", after, 0)
    base_ts, = struct.unpack_from(">q", after, 6)
    count, = struct.unpack_from(">i", after, 36)
    codec = attributes & 0x07
    if codec == 0:
        recs = after[40:]
    elif codec == 2:
        recs = xerial_decompress(after[40:])
    else:
        raise ValueError(f"unsupported record-batch codec {codec}")
    rpos, out = 0, []
    for _ in range(count):
        rlen, rpos = decode_varint(recs, rpos)
        rend = rpos + rlen
        rpos += 1  # record attributes
        ts_delta, rpos = decode_varint(recs, rpos)
        off_delta, rpos = decode_varint(recs, rpos)
        klen, rpos = decode_varint(recs, rpos)
        key = None if klen < 0 else recs[rpos : rpos + max(klen, 0)]
        rpos += max(klen, 0)
        vlen, rpos = decode_varint(recs, rpos)
        value = None if vlen < 0 else recs[rpos : rpos + max(vlen, 0)]
        rpos = rend  # skip headers
        out.append((base_offset + off_delta, base_ts + ts_delta, key, value))
    return (
        {
            "base_offset": base_offset,
            "crc_ok": crc_ok,
            "codec": codec,
            "records": out,
        },
        pos + 12 + batch_len,
    )


def decode_batches(buf: bytes) -> list[dict]:
    """Decode a concatenation of record batches (a partition log / klog)."""
    pos, out = 0, []
    while pos < len(buf):
        batch, pos = decode_record_batch(buf, pos)
        out.append(batch)
    return out


def klog_partition(path: str) -> int:
    """Partition index from a mock-broker log filename (``p-NNNN.klog``) —
    the ONE parser of the klog naming scheme (kafka_mock writes it,
    read_klog and the Spark-side decoder both resolve through here)."""
    name = path.rsplit("/", 1)[-1]
    return int(name.split("-")[1].split(".")[0])


def decode_klog_records(
    raw: bytes, source: str = "<bytes>"
) -> list[tuple[int, int, bytes | None, bytes]]:
    """Flatten one partition log's bytes → [(offset, ts, key, value)],
    refusing on any batch CRC mismatch. Shared by the mock broker's test
    reader and the executor-side Spark decoder so the CRC policy and
    batch-walk live in exactly one place."""
    out: list[tuple[int, int, bytes | None, bytes]] = []
    for batch in decode_batches(raw):
        if not batch["crc_ok"]:
            raise ValueError(f"CRC mismatch in {source}")
        out.extend(batch["records"])
    return out


# --------------------------------------------------------------------------
# Metadata v9
# --------------------------------------------------------------------------

def encode_metadata_request(topic: str) -> bytes:
    return (
        encode_uvarint(2)  # compact array, 1 topic
        + encode_compact_string(topic)
        + _EMPTY_TAGS
        + b"\x01\x00\x00"  # allow_auto_topic_creation, incl-authz ×2
        + _EMPTY_TAGS
    )


def decode_metadata_request(buf: bytes, pos: int) -> dict:
    n, pos = decode_uvarint(buf, pos)
    topics = []
    for _ in range(n - 1):
        name, pos = decode_compact_string(buf, pos)
        _, pos = decode_uvarint(buf, pos)
        topics.append(name)
    return {"topics": topics}


def encode_metadata_response(
    correlation_id: int, topic: str, partitions: list[int],
    node_id: int = 1, host: str = "localhost", port: int = 9092,
    error_code: int = ERR_NONE,
) -> bytes:
    parts = encode_uvarint(len(partitions) + 1)
    for p in partitions:
        parts += (
            struct.pack(">hiii", ERR_NONE, p, node_id, 0)
            + encode_uvarint(2) + struct.pack(">i", node_id)  # replicas
            + encode_uvarint(2) + struct.pack(">i", node_id)  # isr
            + encode_uvarint(1)  # offline
            + _EMPTY_TAGS
        )
    return (
        struct.pack(">i", correlation_id) + _EMPTY_TAGS  # response header v1
        + struct.pack(">i", 0)  # throttle
        + encode_uvarint(2)  # 1 broker
        + struct.pack(">i", node_id) + encode_compact_string(host)
        + struct.pack(">i", port) + encode_compact_string(None) + _EMPTY_TAGS
        + encode_compact_string("mock-cluster")
        + struct.pack(">i", node_id)  # controller
        + encode_uvarint(2)  # 1 topic
        + struct.pack(">h", error_code) + encode_compact_string(topic)
        + b"\x00"  # is_internal
        + parts
        + struct.pack(">i", -2147483648)  # topic_authorized_operations
        + _EMPTY_TAGS
        + struct.pack(">i", -2147483648)  # cluster_authorized_operations
        + _EMPTY_TAGS
    )


def decode_metadata_response(buf: bytes) -> dict:
    pos = 4  # correlation id
    _, pos = decode_uvarint(buf, pos)  # header tags
    pos += 4  # throttle
    nb, pos = decode_uvarint(buf, pos)
    brokers = []
    for _ in range(nb - 1):
        (node,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        host, pos = decode_compact_string(buf, pos)
        (port,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        _, pos = decode_compact_string(buf, pos)  # rack
        _, pos = decode_uvarint(buf, pos)
        brokers.append({"node_id": node, "host": host, "port": port})
    _, pos = decode_compact_string(buf, pos)  # cluster id
    pos += 4  # controller
    nt, pos = decode_uvarint(buf, pos)
    topics = {}
    for _ in range(nt - 1):
        (err,) = struct.unpack_from(">h", buf, pos)
        pos += 2
        name, pos = decode_compact_string(buf, pos)
        pos += 1  # is_internal
        np_, pos = decode_uvarint(buf, pos)
        parts = []
        for _ in range(np_ - 1):
            perr, pidx, leader, _epoch = struct.unpack_from(">hiii", buf, pos)
            pos += 14
            for _ in range(3):  # replicas, isr, offline
                cnt, pos = decode_uvarint(buf, pos)
                pos += 4 * (cnt - 1)
            _, pos = decode_uvarint(buf, pos)
            parts.append({"index": pidx, "leader": leader, "error": perr})
        pos += 4  # topic_authorized_operations
        _, pos = decode_uvarint(buf, pos)
        topics[name] = {"error": err, "partitions": parts}
    return {"brokers": brokers, "topics": topics}


# --------------------------------------------------------------------------
# Produce v9
# --------------------------------------------------------------------------

def encode_produce_request(
    topic: str, acks: int, timeout_ms: int,
    partition_batches: dict[int, bytes],
) -> bytes:
    parts = encode_uvarint(len(partition_batches) + 1)
    for p, batch in sorted(partition_batches.items()):
        parts += (
            struct.pack(">i", p)
            + encode_compact_bytes(batch)
            + _EMPTY_TAGS
        )
    return (
        encode_compact_string(None)  # transactional_id
        + struct.pack(">hi", acks, timeout_ms)
        + encode_uvarint(2)  # 1 topic
        + encode_compact_string(topic)
        + parts
        + _EMPTY_TAGS
        + _EMPTY_TAGS
    )


def decode_produce_request(buf: bytes, pos: int) -> dict:
    _txid, pos = decode_compact_string(buf, pos)
    acks, timeout_ms = struct.unpack_from(">hi", buf, pos)
    pos += 6
    nt, pos = decode_uvarint(buf, pos)
    topics = []
    for _ in range(nt - 1):
        name, pos = decode_compact_string(buf, pos)
        np_, pos = decode_uvarint(buf, pos)
        parts = []
        for _ in range(np_ - 1):
            (pidx,) = struct.unpack_from(">i", buf, pos)
            pos += 4
            batch, pos = decode_compact_bytes(buf, pos)
            _, pos = decode_uvarint(buf, pos)
            parts.append({"index": pidx, "records": batch})
        _, pos = decode_uvarint(buf, pos)
        topics.append({"name": name, "partitions": parts})
    return {"acks": acks, "timeout_ms": timeout_ms, "topics": topics}


def encode_produce_response(
    correlation_id: int, topic: str,
    results: list[tuple[int, int, int]],  # (partition, error_code, base_off)
) -> bytes:
    parts = encode_uvarint(len(results) + 1)
    for pidx, err, base in results:
        parts += (
            struct.pack(">ihqqq", pidx, err, base, -1, 0)
            + encode_uvarint(1)  # record_errors: empty
            + encode_compact_string(None)  # error_message
            + _EMPTY_TAGS
        )
    return (
        struct.pack(">i", correlation_id) + _EMPTY_TAGS
        + encode_uvarint(2)
        + encode_compact_string(topic)
        + parts
        + _EMPTY_TAGS
        + struct.pack(">i", 0)  # throttle
        + _EMPTY_TAGS
    )


def decode_produce_response(buf: bytes) -> dict:
    pos = 4
    _, pos = decode_uvarint(buf, pos)
    nt, pos = decode_uvarint(buf, pos)
    out = {}
    for _ in range(nt - 1):
        name, pos = decode_compact_string(buf, pos)
        np_, pos = decode_uvarint(buf, pos)
        parts = {}
        for _ in range(np_ - 1):
            pidx, err, base, _lat, _lso = struct.unpack_from(
                ">ihqqq", buf, pos
            )
            pos += 30
            ne, pos = decode_uvarint(buf, pos)
            for _ in range(ne - 1):
                pos += 4
                _, pos = decode_compact_string(buf, pos)
                _, pos = decode_uvarint(buf, pos)
            _, pos = decode_compact_string(buf, pos)  # error_message
            _, pos = decode_uvarint(buf, pos)
            parts[pidx] = {"error": err, "base_offset": base}
        _, pos = decode_uvarint(buf, pos)  # topic-level tagged fields
        out[name] = parts
    return out


# --------------------------------------------------------------------------
# The producer client
# --------------------------------------------------------------------------

class KafkaProducerClient:
    """Socket-level producer with the reference's semantics
    (`kafka/repository.go:45-60`): acks=1, retries=3, batch.size=16384,
    linger.ms=5, request.timeout.ms=5000, compression.type=snappy
    (xerial-framed via the pure-Python codec), client.id=librarian-replicator.

    Messages accumulate per partition (the librdkafka "consistent"
    partitioner: CRC32 of the key modulo partition count, so one table's
    events stay ordered on one partition); a partition flushes when its
    byte estimate crosses ``batch_size`` or its oldest message outlives
    ``linger_ms``, and ``flush()`` drains the rest — the repository.Flush
    no-op relies on exactly this producer-side batching. Retriable produce
    errors refresh metadata and retry up to ``retries`` times; with acks=0
    the broker sends no response and the client does not wait (fire and
    forget, the protocol's own contract)."""

    def __init__(
        self,
        sock,
        topic: str,
        client_id: str = "librarian-replicator",
        acks: int = 1,
        retries: int = 3,
        batch_size: int = 16_384,
        linger_ms: int = 5,
        request_timeout_ms: int = 5_000,
        compression_type: str | None = "snappy",
    ):
        self.sock = sock
        self.topic = topic
        self.client_id = client_id
        self.acks = acks
        self.retries = retries
        self.batch_size = batch_size
        self.linger_ms = linger_ms
        self.request_timeout_ms = request_timeout_ms
        self.compression_type = compression_type
        self._corr = 0
        self.partitions: list[int] = []
        self._pending: dict[int, list[tuple[int, bytes | None, bytes]]] = {}
        self._pending_bytes: dict[int, int] = {}
        self._pending_first_ms: dict[int, float] = {}
        self.delivery_reports: list[dict] = []

    @classmethod
    def dial(cls, dsn: str, topic: str, **kw) -> "KafkaProducerClient":
        """Live-socket construction (``host:port`` -> TCP): the mock-to-live
        switch is this one call — every protocol byte is identical."""
        from librarian_spark.sources.dial import dial as _dial

        return cls(_dial(dsn), topic=topic, **kw)

    # -- request plumbing --------------------------------------------------

    def _send(self, api_key: int, api_version: int, body: bytes) -> None:
        self._corr += 1
        hdr = encode_request_header(
            api_key, api_version, self._corr, self.client_id
        )
        write_frame(self.sock, hdr + body)

    def connect(self) -> list[int]:
        """Metadata round-trip — partition discovery for the topic."""
        self._send(API_METADATA, 9, encode_metadata_request(self.topic))
        meta = decode_metadata_response(read_frame(self.sock))
        t = meta["topics"].get(self.topic)
        if t is None or t["error"] != ERR_NONE:
            raise KafkaProtocolError(
                t["error"] if t else -1, "metadata"
            )
        self.partitions = sorted(p["index"] for p in t["partitions"])
        return self.partitions

    def partition_for(self, key: bytes | None) -> int:
        """librdkafka's default ("consistent_random") partitioner hashes a
        non-null key with CRC32 modulo partition count; null keys would
        scatter randomly — the reference always keys, so hash-only here."""
        if key is None:
            raise ValueError("the reference's producer always sets a key")
        if not self.partitions:
            raise RuntimeError(
                "no partition metadata — call connect() before produce()"
            )
        return self.partitions[zlib.crc32(key) % len(self.partitions)]

    # -- produce path -------------------------------------------------------

    def produce(
        self, key: bytes | None, value: bytes,
        timestamp_ms: int | None = None,
    ) -> None:
        ts = (
            timestamp_ms
            if timestamp_ms is not None
            else int(time.time() * 1000)
        )
        p = self.partition_for(key)
        q = self._pending.setdefault(p, [])
        if not q:
            self._pending_first_ms[p] = time.monotonic() * 1000
            self._pending_bytes[p] = 0
        q.append((ts, key, value))
        self._pending_bytes[p] += (
            len(value) + (len(key) if key else 0) + 32  # per-record overhead
        )
        if self._pending_bytes[p] >= self.batch_size:
            self._flush_partition(p)
        # linger check covers EVERY pending partition, not just the one this
        # message landed on: a batch on a quiet partition must still ship
        # once its oldest message outlives linger_ms (librdkafka does this
        # from a background poll; this synchronous client piggybacks the
        # check on each produce call)
        now = time.monotonic() * 1000
        for aged in [
            part
            for part, first in self._pending_first_ms.items()
            if now - first >= self.linger_ms and self._pending.get(part)
        ]:
            self._flush_partition(aged)

    def flush(self) -> list[dict]:
        """Drain every pending batch; returns all delivery reports so far."""
        for p in sorted(self._pending):
            if self._pending[p]:
                self._flush_partition(p)
        return self.delivery_reports

    def _flush_partition(self, p: int) -> None:
        records = self._pending.pop(p, [])
        self._pending_bytes.pop(p, None)
        self._pending_first_ms.pop(p, None)
        if not records:
            return
        batch = encode_record_batch(records, compression=self.compression_type)
        attempt = 0
        while True:
            self._send(
                API_PRODUCE,
                9,
                encode_produce_request(
                    self.topic, self.acks, self.request_timeout_ms,
                    {p: batch},
                ),
            )
            if self.acks == 0:
                # fire-and-forget: the broker sends NO response for acks=0
                self.delivery_reports.append(
                    {"partition": p, "base_offset": -1, "count": len(records)}
                )
                return
            resp = decode_produce_response(read_frame(self.sock))
            res = resp[self.topic][p]
            if res["error"] == ERR_NONE:
                self.delivery_reports.append(
                    {
                        "partition": p,
                        "base_offset": res["base_offset"],
                        "count": len(records),
                    }
                )
                return
            if res["error"] in RETRIABLE_ERRORS and attempt < self.retries:
                attempt += 1
                self.connect()  # leadership may have moved: refresh metadata
                continue
            raise KafkaProtocolError(res["error"], f"produce p{p}")
