"""pgoutput binary decode — the Postgres logical-replication wire format.

The reference ingests live change data by decoding pgoutput messages from a
replication slot (`/root/reference/pkg/postgres/source.go:181-445`). The
sandbox has no Postgres, but the WIRE FORMAT is public and fixed — the
PostgreSQL "Logical Replication Message Formats" documentation (protocol
version 1): ``Begin 'B' / Commit 'C' / Relation 'R' / Insert 'I' /
Update 'U' / Delete 'D'`` with TupleData column kinds ``'n'`` (null),
``'u'`` (unchanged TOAST), ``'t'`` (text). This module implements that
format at the byte level, three ways:

* an **encoder** (the fixture recorder): produces the exact bytes a
  replication slot hands a client, so tests and pipelines can record
  deterministic WAL streams without a live server;
* a **decoder state machine**: Relation messages register schemas, Begin
  carries the transaction LSN + commit timestamp, Insert/Update/Delete
  become flattened CDC rows — mirroring the reference's handler mapping
  (Insert→``c`` / Update→``u`` / Delete→``d``,
  `pkg/postgres/source.go:243-378`) and its text-tuple typing rule
  (int4/int8 parse to integers, everything else stays text,
  `source.go:404-445`). One deliberate improvement: events are stamped
  with the ENCLOSING transaction's LSN and commit timestamp (from Begin),
  where the reference stamps the previous commit's LSN and wall-clock
  ``time.Now()`` — WAL-derived stamps are deterministic and replayable;
* a **Spark DataSource** (format ``"pgoutput"``): batch + micro-batch
  streaming over a directory of ``.pgwal`` segment files, one input
  partition per segment (executor-parallel decode, the same layout
  contract as ``cdc_jsonl``). Segments are length-prefixed CopyData
  frames and must be self-contained (each begins with the Relation
  messages its rows need) — exactly what a recorder that rotates
  segments per connection produces, since a WAL sender resends Relation
  messages on every new stream.

Rows decode into ``CDC_ROW_SCHEMA`` — the same shape ``cdc_jsonl``
produces — so everything downstream (envelope construction, replicate
drain, SCD2/materialize) runs unchanged on raw-WAL input.
"""

from __future__ import annotations

import json
import os
import struct
from dataclasses import dataclass

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, DataSourceStreamReader

from librarian_spark.sources import segments as _seg
from librarian_spark.sources.cdc_datasource import CDC_ROW_SCHEMA

__all__ = [
    "PG_EPOCH_US",
    "OID_INT4",
    "OID_INT8",
    "encode_begin",
    "encode_commit",
    "encode_relation",
    "encode_insert",
    "encode_update",
    "encode_delete",
    "write_segment",
    "read_segment_frames",
    "parse_message",
    "PgOutputDecoder",
    "decode_segment",
    "PgOutputDataSource",
    "register",
]

FORMAT_NAME = "pgoutput"

# PostgreSQL epoch (2000-01-01T00:00:00Z) in unix microseconds — pgoutput
# timestamps count µs from here, not from the unix epoch
PG_EPOCH_US = 946_684_800_000_000

OID_INT4 = 23
OID_INT8 = 20


# --------------------------------------------------------------------------
# Encoding — the fixture recorder (bytes a replication slot would send)
# --------------------------------------------------------------------------


def _cstr(s: str) -> bytes:
    return s.encode("utf-8") + b"\x00"


def encode_begin(final_lsn: int, commit_ts_ms: int, xid: int) -> bytes:
    """Begin: 'B', Int64 final LSN, Int64 commit ts (pg-epoch µs), Int32 xid."""
    return b"B" + struct.pack(
        ">QqI", final_lsn, commit_ts_ms * 1000 - PG_EPOCH_US, xid
    )


def encode_commit(commit_lsn: int, end_lsn: int, commit_ts_ms: int) -> bytes:
    """Commit: 'C', Int8 flags(0), Int64 commit LSN, Int64 end LSN, Int64 ts."""
    return b"C" + struct.pack(
        ">BQQq", 0, commit_lsn, end_lsn, commit_ts_ms * 1000 - PG_EPOCH_US
    )


def encode_relation(
    rel_id: int,
    namespace: str,
    name: str,
    columns: list[tuple[str, int]],
    replica_identity: int = ord("d"),
) -> bytes:
    """Relation: 'R', Int32 oid, String ns, String name, Int8 replident,
    Int16 ncols, then (Int8 flags, String colname, Int32 type oid,
    Int32 atttypmod) per column."""
    out = b"R" + struct.pack(">I", rel_id) + _cstr(namespace) + _cstr(name)
    out += struct.pack(">BH", replica_identity, len(columns))
    for colname, type_oid in columns:
        out += struct.pack(">B", 1) + _cstr(colname)
        out += struct.pack(">Ii", type_oid, -1)
    return out


def _tuple_data(values: list[str | None]) -> bytes:
    """TupleData: Int16 ncols; per col 'n' (null) or 't' + Int32 len + text."""
    out = struct.pack(">H", len(values))
    for v in values:
        if v is None:
            out += b"n"
        else:
            b = str(v).encode("utf-8")
            out += b"t" + struct.pack(">I", len(b)) + b
    return out


def encode_insert(rel_id: int, values: list[str | None]) -> bytes:
    return b"I" + struct.pack(">I", rel_id) + b"N" + _tuple_data(values)


def encode_update(
    rel_id: int,
    new_values: list[str | None],
    old_values: list[str | None] | None = None,
    old_kind: bytes = b"O",
) -> bytes:
    out = b"U" + struct.pack(">I", rel_id)
    if old_values is not None:
        out += old_kind + _tuple_data(old_values)
    return out + b"N" + _tuple_data(new_values)


def encode_delete(
    rel_id: int, old_values: list[str | None], old_kind: bytes = b"K"
) -> bytes:
    return b"D" + struct.pack(">I", rel_id) + old_kind + _tuple_data(old_values)


def encode_snapshot_marker(seq_base: int = 0) -> bytes:
    """Container-level frame (NOT a pgoutput wire message — no real
    walsender ever sends it): written by the initial-snapshot exporter at
    the head of a snapshot segment's transaction, it switches the decoder
    so the Inserts that follow decode as op=``r`` (snapshot read, the
    Debezium ``r`` op the envelope already supports — S8) instead of
    ``c``. The tag byte ``S`` is unused by the pgoutput protocol
    (B C O R Y I U D T M), so a segment replaying REAL wal can never
    trip it.

    ``seq_base`` seeds the decoder's per-row sequence: snapshot segments
    all share the consistent-point LSN and each segment decodes with a
    FRESH decoder, so without a base every chunk would restart positions
    at ``lsn:1`` — colliding across chunks/tables and breaking consumers
    that dedup or order on position. The exporter threads a global row
    counter through, making every snapshot row's position unique."""
    return b"S" + struct.pack(">Q", seq_base)


def encode_truncate(rel_ids: list[int], options: int = 0) -> bytes:
    """Truncate message (pgoutput protocol): option bits 1 = CASCADE,
    2 = RESTART IDENTITY; one message may truncate several relations."""
    return (
        b"T"
        + struct.pack(">IB", len(rel_ids), options)
        + struct.pack(f">{len(rel_ids)}I", *rel_ids)
    )


def write_segment(path: str, messages: list[bytes]) -> None:
    """One ``.pgwal`` segment: length-prefixed CopyData frames, written
    atomically (tmp + rename) so a concurrently-polling stream reader never
    observes a half-written segment."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        for m in messages:
            fh.write(struct.pack(">I", len(m)) + m)
    os.replace(tmp, path)


def read_segment_frames(path: str):
    """Yield raw message bytes from a segment file."""
    with open(path, "rb") as fh:
        while True:
            hdr = fh.read(4)
            if not hdr:
                return
            (n,) = struct.unpack(">I", hdr)
            data = fh.read(n)
            if len(data) != n:
                raise ValueError(f"truncated frame in {path}")
            yield data


# --------------------------------------------------------------------------
# Decoding
# --------------------------------------------------------------------------


@dataclass
class RelationInfo:
    rel_id: int
    namespace: str
    name: str
    columns: list[tuple[str, int]]  # (name, type oid)


def _read_cstr(buf: bytes, pos: int) -> tuple[str, int]:
    end = buf.index(b"\x00", pos)
    return buf[pos:end].decode("utf-8"), end + 1


def _parse_tuple(buf: bytes, pos: int) -> tuple[list[str | None], int]:
    (ncols,) = struct.unpack_from(">H", buf, pos)
    pos += 2
    vals: list[str | None] = []
    for _ in range(ncols):
        kind = buf[pos : pos + 1]
        pos += 1
        if kind in (b"n", b"u"):
            vals.append(None)
        elif kind == b"t":
            (n,) = struct.unpack_from(">I", buf, pos)
            pos += 4
            vals.append(buf[pos : pos + n].decode("utf-8"))
            pos += n
        elif kind == b"b":
            (n,) = struct.unpack_from(">I", buf, pos)
            pos += 4
            vals.append(buf[pos : pos + n].hex())
            pos += n
        else:
            raise ValueError(f"unknown TupleData column kind {kind!r}")
    return vals, pos


def parse_message(buf: bytes) -> dict:
    """Parse one pgoutput message into a tagged dict (the pglogrepl.Parse
    analog, `pkg/postgres/source.go:187`)."""
    tag = buf[0:1]
    if tag == b"B":
        lsn, ts, xid = struct.unpack_from(">QqI", buf, 1)
        return {
            "type": "begin",
            "final_lsn": lsn,
            "commit_ts_ms": (ts + PG_EPOCH_US) // 1000,
            "xid": xid,
        }
    if tag == b"C":
        _, clsn, elsn, ts = struct.unpack_from(">BQQq", buf, 1)
        return {
            "type": "commit",
            "commit_lsn": clsn,
            "end_lsn": elsn,
            "commit_ts_ms": (ts + PG_EPOCH_US) // 1000,
        }
    if tag == b"R":
        (rel_id,) = struct.unpack_from(">I", buf, 1)
        pos = 5
        ns, pos = _read_cstr(buf, pos)
        name, pos = _read_cstr(buf, pos)
        _replident, ncols = struct.unpack_from(">BH", buf, pos)
        pos += 3
        cols: list[tuple[str, int]] = []
        for _ in range(ncols):
            pos += 1  # per-column flags
            cname, pos = _read_cstr(buf, pos)
            type_oid, _mod = struct.unpack_from(">Ii", buf, pos)
            pos += 8
            cols.append((cname, type_oid))
        return {
            "type": "relation",
            "relation": RelationInfo(rel_id, ns, name, cols),
        }
    if tag == b"I":
        (rel_id,) = struct.unpack_from(">I", buf, 1)
        assert buf[5:6] == b"N", "Insert must carry a new tuple"
        vals, _ = _parse_tuple(buf, 6)
        return {"type": "insert", "rel_id": rel_id, "new": vals}
    if tag == b"U":
        (rel_id,) = struct.unpack_from(">I", buf, 1)
        pos = 5
        old = None
        if buf[pos : pos + 1] in (b"K", b"O"):
            pos += 1
            old, pos = _parse_tuple(buf, pos)
        assert buf[pos : pos + 1] == b"N"
        new, _ = _parse_tuple(buf, pos + 1)
        return {"type": "update", "rel_id": rel_id, "old": old, "new": new}
    if tag == b"D":
        (rel_id,) = struct.unpack_from(">I", buf, 1)
        old, _ = _parse_tuple(buf, 6)
        return {"type": "delete", "rel_id": rel_id, "old": old}
    if tag == b"S":
        # snapshot marker — our container extension (encode_snapshot_marker)
        (base,) = struct.unpack_from(">Q", buf, 1) if len(buf) >= 9 else (0,)
        return {"type": "snapshot_mode", "seq_base": base}
    if tag == b"T":
        # Truncate (pgoutput protocol): Int32 nrelids, Int8 option bits
        # (1 = CASCADE, 2 = RESTART IDENTITY), Int32[] relation OIDs.
        # Decoded so the skip can be COUNTED per relation — the reference's
        # switch has no Truncate case and silently drops it
        # (`pkg/postgres/source.go` default branch); see
        # :meth:`PgOutputDecoder.feed` for the documented skip decision.
        nrels, opt = struct.unpack_from(">IB", buf, 1)
        rel_ids = list(struct.unpack_from(f">{nrels}I", buf, 6))
        return {"type": "truncate", "rel_ids": rel_ids, "options": opt}
    return {"type": "other", "tag": tag.decode("latin1")}


class PgOutputDecoder:
    """Stateful message → CDC-row converter (one per segment/connection).

    Holds the relation registry the way the reference's Source does
    (`pkg/postgres/source.go:194-199`) and converts each DML message into a
    flattened row matching ``CDC_ROW_SCHEMA``. Tuple values type per the
    reference's rule (`source.go:404-445`): int4/int8 parse to integers,
    everything else stays text; nulls stay null.
    """

    def __init__(self, db: str):
        self.db = db
        self.relations: dict[int, RelationInfo] = {}
        self.txn_lsn: int | None = None
        self.txn_ts_ms: int | None = None
        self.seq = 0
        # skip-with-counter (see feed): {"T": n, "M": n, ...} per raw tag,
        # plus per-table truncate counts under "truncate:<ns>.<table>"
        self.skipped_other: dict[str, int] = {}
        # snapshot-read mode: set by the container's 'S' marker frame;
        # Inserts decode as op='r' until the enclosing Commit
        self.snapshot_op = False

    def _tuple_to_map(self, rel: RelationInfo, vals: list[str | None]) -> dict:
        out: dict = {}
        for (cname, oid), v in zip(rel.columns, vals):
            if v is not None and oid in (OID_INT4, OID_INT8):
                try:
                    out[cname] = int(v)
                except ValueError:
                    out[cname] = v
            else:
                out[cname] = v
        return out

    def _row(self, rel: RelationInfo, op: str, before: dict | None, after: dict | None):
        dump = lambda v: (
            None
            if v is None
            else json.dumps(v, separators=(",", ":"), sort_keys=True)
        )
        self.seq += 1
        return (
            op,
            self.txn_ts_ms,
            self.db,
            rel.namespace,
            rel.name,
            self.txn_lsn,
            dump(before),
            dump(after),
            f"{self.txn_lsn}:{self.seq}",
        )

    def feed(self, raw: bytes):
        """Decode one message; yield 0 or 1 CDC rows (Relation/Begin/Commit
        update state and yield nothing, like ErrNoEventsFound)."""
        msg = parse_message(raw)
        t = msg["type"]
        if t == "relation":
            rel = msg["relation"]
            self.relations[rel.rel_id] = rel
            return
        if t == "begin":
            self.txn_lsn = msg["final_lsn"]
            self.txn_ts_ms = msg["commit_ts_ms"]
            return
        if t == "commit":
            self.snapshot_op = False  # 'r' mode is per snapshot transaction
            return
        if t == "snapshot_mode":
            self.snapshot_op = True
            self.seq = msg["seq_base"]  # unique positions across chunks
            return
        if t == "truncate":
            # DECISION — skip-with-counter. The reference's message switch
            # has no Truncate arm, so a TRUNCATE on a replicated table
            # vanishes from its stream too (`pkg/postgres/source.go`
            # default case); matching that keeps oracle/envelope parity
            # (the Debezium-min envelope has no truncate op either). But a
            # SILENT vanish is a data-loss footgun for consumers that
            # assume row-level completeness, so every skip is counted here
            # and surfaced through the tailer/CLI stats. Emitting a typed
            # ``t`` event is the documented extension path if a downstream
            # materializer ever needs to clear state on truncate.
            self.skipped_other["T"] = self.skipped_other.get("T", 0) + 1
            for rid in msg["rel_ids"]:
                rel = self.relations.get(rid)
                key = (
                    f"truncate:{rel.namespace}.{rel.name}"
                    if rel is not None
                    else f"truncate:oid={rid}"
                )
                self.skipped_other[key] = self.skipped_other.get(key, 0) + 1
            return
        if t == "other":
            tag = msg["tag"]
            self.skipped_other[tag] = self.skipped_other.get(tag, 0) + 1
            return
        if t in ("insert", "update", "delete"):
            rel = self.relations.get(msg["rel_id"])
            if rel is None:
                raise ValueError(
                    f"unknown relation ID: {msg['rel_id']} — segment is not "
                    "self-contained (Relation message missing)"
                )
            if t == "insert":
                op = "r" if self.snapshot_op else "c"
                yield self._row(rel, op, None, self._tuple_to_map(rel, msg["new"]))
            elif t == "update":
                before = (
                    self._tuple_to_map(rel, msg["old"])
                    if msg["old"] is not None
                    else None
                )
                yield self._row(
                    rel, "u", before, self._tuple_to_map(rel, msg["new"])
                )
            else:
                yield self._row(rel, "d", self._tuple_to_map(rel, msg["old"]), None)


def decode_segment(path: str, db: str):
    """Decode one self-contained ``.pgwal`` segment into CDC rows."""
    dec = PgOutputDecoder(db)
    for frame in read_segment_frames(path):
        yield from dec.feed(frame)


# --------------------------------------------------------------------------
# Spark DataSource
# --------------------------------------------------------------------------


class _PgReaderMixin:
    """Per-format bits: the .pgwal extension and the stateful decoder."""

    exts = (".pgwal",)

    def _init(self, options) -> None:
        self.db = options.get("db", "postgres")

    def rows_of(self, path: str, fname: str):
        yield from decode_segment(os.path.join(path, fname), self.db)


class _PgBatchReader(_PgReaderMixin, _seg.SegmentBatchReader):
    """Full-WAL replay (backfill path)."""


class _PgStreamReader(_PgReaderMixin, _seg.SegmentStreamReader):
    """Micro-batch reader over WAL segments — offset semantics and the
    true-pause protocol live in :mod:`.segments`, shared verbatim with
    ``cdc_jsonl`` (segments immutable once written)."""


class PgOutputDataSource(DataSource):
    """``spark.read/readStream.format("pgoutput").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        return CDC_ROW_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _PgBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _PgStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the format (by-value pickling — the
    cdc_datasource rationale: executors must not need this repo on path)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(_seg)
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(PgOutputDataSource)
