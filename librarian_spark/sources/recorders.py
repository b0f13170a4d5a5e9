"""Segment recorders — the bridge from the wire clients to the Spark sources.

The reference's architecture is a single-writer network consumer feeding a
replicated store; this repo's Spark-first equivalent splits the same work
at the segment boundary:

    wire client (driver-side, single-writer, ordered)
        → immutable segment files (lexicographic name order = stream order)
            → custom Spark DataSource (one input partition per segment,
              executor-PARALLEL decode, streaming offsets + checkpoint)

The recorders here are the middle arrow. Each drains its protocol client
into the exact segment layout its DataSource consumes, with the
crash-safety ordering both layers already promise:

* segments are written atomically (tmp+rename, so a concurrently polling
  stream reader never sees a half-written file) and named monotonically;
* the client's checkpoint (flushed LSN / resume token) only advances
  AFTER the segment holding that data is durable — a crash between the
  two replays the tail into a fresh segment, and the decoders' keyed
  downstream (LSN/position) makes the replay idempotent;
* ``.pgwal`` segments are SELF-CONTAINED: every segment is prefixed with
  the Relation registry as it stood when the segment's first frame was
  buffered, and any Relation CHANGE that arrives mid-segment is written
  inline in stream order (pgoutput emits the changed Relation inside the
  transaction, before the DML that uses the new schema — preserving that
  order is what keeps pre-ALTER rows decoding against the pre-ALTER
  schema). That is what lets Spark decode segments in parallel with no
  cross-segment state, and it means a schema change never forces a
  rotation that would split an in-progress transaction across segments.
"""

from __future__ import annotations

import json
import os

from librarian_spark.sources import pgoutput as _pg

__all__ = ["PgWalRecorder", "ChangeStreamRecorder", "fsync_file_and_dir"]


def fsync_file_and_dir(path: str) -> None:
    """Force the file AND its directory entry to stable storage — an
    os.replace alone leaves both in the page cache, and acking the server
    on page-cache-only data means a power loss loses transactions the
    server has already discarded."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    dfd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


class PgWalRecorder:
    """Drain :class:`..pgrepl_client.ReplicationSlotClient` frames into
    self-contained ``.pgwal`` segments, rotating every N transactions."""

    def __init__(self, out_dir: str, txns_per_segment: int = 1):
        self.out_dir = out_dir
        self.txns_per_segment = txns_per_segment
        os.makedirs(out_dir, exist_ok=True)
        self.relations: dict[int, bytes] = {}  # rel_id → latest 'R' bytes
        # driver-side skip-with-counter mirror of PgOutputDecoder: message
        # tags the decoders will NOT turn into CDC rows (Truncate 'T',
        # Origin 'O', logical Message 'M', Type 'Y', …). The payloads still
        # land in segments verbatim — the stream is recorded raw — but the
        # live tailer can surface "N truncates skipped" without decoding.
        self.skipped_other: dict[str, int] = {}
        self._buf: list[bytes] = []
        self._prefix: list[bytes] = []  # registry snapshot at buffer start
        self._txns = 0
        existing = [
            f for f in os.listdir(out_dir) if f.endswith(".pgwal")
        ]
        # max+1, NOT len(): a retention gap in the sequence would make
        # len() collide with (and atomically clobber) a live segment
        self._next_seg = 1 + max(
            (int(f.split("-")[1].split(".")[0]) for f in existing), default=-1
        )

    def _flush(self) -> None:
        if not self._buf:
            return
        name = os.path.join(self.out_dir, f"seg-{self._next_seg:08d}.pgwal")
        # self-contained: prefix the registry AS OF the buffer's first
        # frame — mid-buffer Relation changes ride inline in stream order
        _pg.write_segment(name, self._prefix + self._buf)
        fsync_file_and_dir(name)  # durable BEFORE the caller acks
        self._next_seg += 1
        self._buf = []
        self._txns = 0

    def record(
        self,
        client,
        max_txns: int | None = None,
        until_lsn: int | None = None,
        idle_timeout: float | None = None,
    ) -> int:
        """Consume ``client.frames()`` until the stream ends (or
        ``max_txns`` transactions landed, or — the CLI's bounded live
        drain — ``until_lsn`` is reached at a transaction boundary);
        returns transactions recorded. Durable-before-ack:
        ``client.commit_ack`` fires only AFTER the segment holding that
        commit is flushed — a crash in between replays the un-acked tail
        into a fresh segment, and the LSN-keyed positions keep the replay
        idempotent downstream."""
        recorded = 0
        pending_commit: bytes | None = None
        for payload in client.frames(until_lsn=until_lsn,
                                     idle_timeout=idle_timeout):
            tag = payload[:1]
            if tag == b"R":
                rel = _pg.parse_message(payload)["relation"]
                if self.relations.get(rel.rel_id) == payload:
                    continue  # re-sent unchanged (new stream session)
                self.relations[rel.rel_id] = payload
                if self._buf:
                    # NEW or CHANGED Relation mid-buffer: keep it INLINE at
                    # its stream position. pgoutput emits the Relation
                    # inside the transaction, before the DML using the new
                    # schema — flushing here would split that transaction
                    # across segments (its Commit would land Begin-less,
                    # decoding with txn_lsn=None and losing LSN ordering).
                    self._buf.append(payload)
                continue
            if tag not in (b"B", b"C", b"I", b"U", b"D"):
                t = tag.decode("latin1")
                self.skipped_other[t] = self.skipped_other.get(t, 0) + 1
            if not self._buf:
                self._prefix = list(self.relations.values())
            self._buf.append(payload)
            if tag == b"C":
                self._txns += 1
                recorded += 1
                pending_commit = payload  # highest buffered commit
                if self._txns >= self.txns_per_segment:
                    self._flush()
                    client.commit_ack(pending_commit)
                    pending_commit = None
                if max_txns is not None and recorded >= max_txns:
                    break
        self._flush()  # tail (possibly an uncommitted fragment on abort)
        if pending_commit is not None:
            client.commit_ack(pending_commit)
        return recorded


class ChangeStreamRecorder:
    """Drain :class:`..mongo_wire.MongoChangeStreamClient` batches into
    ``.cstream`` segments (JSONL change documents) — one segment per
    non-empty cursor batch."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        existing = [
            f for f in os.listdir(out_dir) if f.endswith(".cstream")
        ]
        self._next_seg = 1 + max(
            (int(f.split("-")[1].split(".")[0]) for f in existing), default=-1
        )

    def record_batches(self, batches) -> int:
        """Write each document batch as one durable segment; returns
        documents written. Shared by the live drain (:meth:`record`) and
        the initial-sync copy (synthesized snapshot docs)."""
        docs = 0
        for batch in batches:
            name = os.path.join(
                self.out_dir, f"seg-{self._next_seg:08d}.cstream"
            )
            tmp = name + ".tmp"
            with open(tmp, "w", encoding="utf-8") as fh:
                for doc in batch:
                    fh.write(json.dumps(doc, separators=(",", ":")) + "\n")
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, name)
            fsync_file_and_dir(name)  # durable BEFORE the token advances
            self._next_seg += 1
            docs += len(batch)
        return docs

    def record(self, client, max_batches: int | None = None,
               stop_on_empty: bool = False) -> int:
        """Consume ``client.batches()``; returns documents recorded. The
        segment is durable before the yield returns, so the resume-token
        checkpoint (which advances after the yield) never outruns disk.
        ``stop_on_empty`` bounds a drain against a live tailing cursor."""
        return self.record_batches(
            client.batches(max_batches, stop_on_empty=stop_on_empty)
        )
