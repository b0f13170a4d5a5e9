"""In-process Kafka broker fixture — the dev-environment analog.

The reference's compose file ships a real Kafka for development; this
sandbox has no broker (and no client jar — evidence in SURVEY §2A #23), so
parity testing uses an in-process server speaking the same public protocol
subset the client implements (:mod:`.kafka_wire`): framed requests with
header v2, Metadata v9 (single-node cluster, N partitions), and Produce v9
— validating each record batch's magic and CRC32C like a real broker's log
layer, assigning contiguous base offsets per partition, and appending the
batch (base offset rewritten in place, which is exactly what a broker's
log append does) to an in-memory partition log that :func:`dump_klog`
persists as one ``.klog`` file per partition for executor-parallel decode.

Error injection (``fail_produces``) answers the first N Produce requests
with NOT_LEADER_OR_FOLLOWER so the client's bounded-retry path is testable.
Used by both the test suite and the ``cdc_kafka_egress`` registry query.
"""

from __future__ import annotations

import os
import socket
import struct
import threading

from librarian_spark.sources.kafka_wire import (
    API_METADATA,
    API_PRODUCE,
    ERR_NONE,
    ERR_NOT_LEADER_OR_FOLLOWER,
    crc32c,
    decode_metadata_request,
    decode_record_batch,
    decode_produce_request,
    decode_request_header,
    encode_metadata_response,
    encode_produce_response,
    read_frame,
    write_frame,
)

__all__ = ["MockKafkaBroker", "dump_klog", "read_klog"]


class MockKafkaBroker:
    def __init__(
        self, topic: str, n_partitions: int = 4, fail_produces: int = 0
    ):
        self.topic = topic
        self.n_partitions = n_partitions
        self.fail_produces = fail_produces
        # (partition) → bytearray of appended record batches (base offsets
        # rewritten at append, so the log is directly decodable)
        self.log: dict[int, bytearray] = {
            p: bytearray() for p in range(n_partitions)
        }
        self.next_offset: dict[int, int] = dict.fromkeys(
            range(n_partitions), 0
        )
        self.requests: list[dict] = []  # every parsed request, for asserts

    def serve(self, sock) -> None:
        """One connection's request loop; returns when the peer closes."""
        try:
            while True:
                frame = read_frame(sock)
                hdr, pos = decode_request_header(frame)
                if hdr["api_key"] == API_METADATA:
                    req = decode_metadata_request(frame, pos)
                    self.requests.append({**hdr, **req, "api": "metadata"})
                    write_frame(
                        sock,
                        encode_metadata_response(
                            hdr["correlation_id"],
                            self.topic,
                            list(range(self.n_partitions)),
                        ),
                    )
                elif hdr["api_key"] == API_PRODUCE:
                    req = decode_produce_request(frame, pos)
                    self.requests.append({**hdr, **req, "api": "produce"})
                    results = []
                    for t in req["topics"]:
                        for part in t["partitions"]:
                            results.append(self._append(part))
                    if req["acks"] != 0:  # acks=0 → no response at all
                        write_frame(
                            sock,
                            encode_produce_response(
                                hdr["correlation_id"], self.topic, results
                            ),
                        )
                else:
                    raise ValueError(f"unsupported api {hdr['api_key']}")
        except (ConnectionError, OSError):
            return

    def _append(self, part: dict) -> tuple[int, int, int]:
        p, raw = part["index"], part["records"]
        if self.fail_produces > 0:
            self.fail_produces -= 1
            return (p, ERR_NOT_LEADER_OR_FOLLOWER, -1)
        # log-layer validation, like a real broker: magic, batch CRC (over
        # the compressed bytes), then a full structural decode — which
        # snappy-decompresses the records section, so a compressed batch
        # with a broken frame or bad record varints is rejected, not stored
        _epoch, magic, crc = struct.unpack_from(">ibI", raw, 12)
        if magic != 2 or crc32c(raw[21:]) != crc:
            return (p, 87, -1)  # INVALID_RECORD
        try:
            decoded, _ = decode_record_batch(raw, 0)
            if len(decoded["records"]) == 0:
                raise ValueError("empty batch")
        except (ValueError, IndexError, struct.error):
            return (p, 87, -1)  # INVALID_RECORD
        base = self.next_offset[p]
        (count,) = struct.unpack_from(">i", raw, 57)
        rewritten = struct.pack(">q", base) + raw[8:]
        self.log[p] += rewritten
        self.next_offset[p] = base + count
        return (p, ERR_NONE, base)

    def connect(self) -> tuple[socket.socket, threading.Thread]:
        """One session on a socketpair; returns (client end, thread)."""
        c, s = socket.socketpair()
        t = threading.Thread(target=self.serve, args=(s,), daemon=True)
        t.start()
        return c, t


def dump_klog(broker: MockKafkaBroker, out_dir: str) -> list[str]:
    """Persist each non-empty partition log as ``p-NNNN.klog`` (raw
    concatenated record batches — decode with ``kafka_wire.decode_batches``),
    one file per partition so Spark decodes partitions in parallel."""
    os.makedirs(out_dir, exist_ok=True)
    out = []
    for p, buf in sorted(broker.log.items()):
        if not buf:
            continue
        path = os.path.join(out_dir, f"p-{p:04d}.klog")
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(bytes(buf))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)
        out.append(path)
    return out


def read_klog(path: str) -> list[tuple[int, int, int, bytes, bytes]]:
    """Decode one partition's klog → [(partition, offset, ts, key, value)],
    verifying every batch CRC."""
    from librarian_spark.sources.kafka_wire import (
        decode_klog_records,
        klog_partition,
    )

    p = klog_partition(path)
    with open(path, "rb") as fh:
        raw = fh.read()
    return [
        (p, off, ts, key, value)
        for off, ts, key, value in decode_klog_records(raw, source=path)
    ]
