"""MongoDB change-stream wire client — the NETWORK half of the Mongo source.

:mod:`.mongo_changestream` implements change-EVENT decoding (op mapping,
Extended-JSON unwrap, resume-token ordering) over recorded documents; this
module implements the protocol that delivers them, per the public MongoDB
specifications ("MongoDB Wire Protocol" OP_MSG + the BSON spec):

* OP_MSG framing: little-endian header (messageLength, requestID,
  responseTo, opCode=2013), uint32 flagBits, section kind 0 carrying one
  BSON command document;
* a BSON codec for the subset change-stream traffic uses (double, string,
  document, array, bool, null, int32, int64, ObjectId, UTC datetime,
  binary, and the 0x11 timestamp type — ObjectId/datetime/binary decode
  to their Extended-JSON wrappers (``{"$oid"}``/``{"$date"}``/
  ``{"$binary"}``), and the timestamp to the ``{"$timestamp": {t, i}}``
  shape :func:`..mongo_changestream.unwrap_extended_json`
  already understands);
* the change-stream cursor protocol: an ``aggregate`` command whose
  pipeline starts with ``$changeStream`` (``resumeAfter`` when resuming)
  opens the cursor, ``getMore`` with ``maxTimeMS`` polls it — exactly what
  the reference's driver call expands to
  (`/root/reference/pkg/mongo/source.go:71-96`: ``coll.Watch`` with
  ``SetMaxAwaitTime(5s)`` and ``SetResumeAfter`` from the checkpoint).

Checkpoint parity with the reference (`source.go:76-82,180`): the position
is the BASE64 of the raw resume-token BSON document, persisted atomically
(tmp+rename) after each processed batch; ``watch()`` decodes it back into
``resumeAfter``. The wire conversation runs over any connected socket — a
mock mongod in tests (no Mongo in the sandbox), a real server's socket in
production (after the hello/auth exchange, which is out of scope here).

Decoded change documents feed :func:`..mongo_changestream.decode_change_event`
unchanged, so everything downstream (CDC rows, envelope, replicate drain)
is shared with the recorded-segment path.
"""

from __future__ import annotations

import base64
import os
import struct

from librarian_spark.sources.mongo_changestream import decode_change_event

__all__ = [
    "bson_encode",
    "bson_decode",
    "encode_op_msg",
    "read_op_msg",
    "MongoChangeStreamClient",
]


# --------------------------------------------------------------------------
# BSON (subset) — little-endian throughout, per the public BSON spec
# --------------------------------------------------------------------------


def _enc_value(v) -> tuple[int, bytes]:
    """→ (type byte, payload)."""
    if isinstance(v, bool):  # before int: bool is an int subclass
        return 0x08, b"\x01" if v else b"\x00"
    if isinstance(v, float):
        return 0x01, struct.pack("<d", v)
    if isinstance(v, str):
        b = v.encode("utf-8") + b"\x00"
        return 0x02, struct.pack("<i", len(b)) + b
    if isinstance(v, dict):
        if set(v) == {"$timestamp"}:  # Extended-JSON shape → BSON 0x11
            t, i = int(v["$timestamp"]["t"]), int(v["$timestamp"]["i"])
            return 0x11, struct.pack("<II", i, t)
        if set(v) == {"$oid"}:  # ObjectId → 0x07 (12 raw bytes)
            return 0x07, bytes.fromhex(v["$oid"])
        if set(v) == {"$date"}:  # UTC datetime → 0x09 (int64 epoch ms)
            return 0x09, struct.pack("<q", int(v["$date"]))
        if set(v) == {"$binary"}:  # → 0x05 (len, subtype byte, bytes)
            raw = base64.b64decode(v["$binary"]["base64"])
            sub = int(v["$binary"]["subType"], 16)
            return 0x05, struct.pack("<iB", len(raw), sub) + raw
        return 0x03, bson_encode(v)
    if isinstance(v, (list, tuple)):
        return 0x04, bson_encode({str(i): x for i, x in enumerate(v)})
    if v is None:
        return 0x0A, b""
    if isinstance(v, int):
        if -(2**31) <= v < 2**31:
            return 0x10, struct.pack("<i", v)
        return 0x12, struct.pack("<q", v)
    raise TypeError(f"unsupported BSON value: {type(v).__name__}")


def bson_encode(doc: dict) -> bytes:
    body = b""
    for k, v in doc.items():
        t, payload = _enc_value(v)
        body += bytes([t]) + k.encode("utf-8") + b"\x00" + payload
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def _dec_value(t: int, buf: bytes, pos: int):
    if t == 0x01:
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == 0x02:
        (n,) = struct.unpack_from("<i", buf, pos)
        s = buf[pos + 4 : pos + 4 + n - 1].decode("utf-8")
        return s, pos + 4 + n
    if t in (0x03, 0x04):
        (n,) = struct.unpack_from("<i", buf, pos)
        inner = bson_decode(buf[pos : pos + n])
        if t == 0x04:
            return [inner[str(i)] for i in range(len(inner))], pos + n
        return inner, pos + n
    if t == 0x05:  # binary → Extended-JSON wrapper
        (n,) = struct.unpack_from("<i", buf, pos)
        sub = buf[pos + 4]
        raw = buf[pos + 5 : pos + 5 + n]
        return {
            "$binary": {
                "base64": base64.b64encode(raw).decode(),
                "subType": f"{sub:02x}",
            }
        }, pos + 5 + n
    if t == 0x07:  # ObjectId — the default _id type on a real server
        return {"$oid": buf[pos : pos + 12].hex()}, pos + 12
    if t == 0x08:
        return buf[pos] != 0, pos + 1
    if t == 0x09:  # UTC datetime → {"$date": epoch_ms}
        return {"$date": struct.unpack_from("<q", buf, pos)[0]}, pos + 8
    if t == 0x0A:
        return None, pos
    if t == 0x10:
        return struct.unpack_from("<i", buf, pos)[0], pos + 4
    if t == 0x11:  # timestamp: uint32 increment, then uint32 seconds
        i, s = struct.unpack_from("<II", buf, pos)
        return {"$timestamp": {"t": s, "i": i}}, pos + 8
    if t == 0x12:
        return struct.unpack_from("<q", buf, pos)[0], pos + 8
    raise ValueError(f"unsupported BSON type 0x{t:02x}")


def bson_decode(buf: bytes) -> dict:
    (total,) = struct.unpack_from("<i", buf, 0)
    if total != len(buf):
        raise ValueError(f"BSON length {total} != buffer {len(buf)}")
    out: dict = {}
    pos = 4
    while buf[pos] != 0:
        t = buf[pos]
        pos += 1
        end = buf.index(b"\x00", pos)
        key = buf[pos:end].decode("utf-8")
        pos = end + 1
        out[key], pos = _dec_value(t, buf, pos)
    return out


# --------------------------------------------------------------------------
# OP_MSG framing
# --------------------------------------------------------------------------

OP_MSG = 2013


def encode_op_msg(doc: dict, request_id: int, response_to: int = 0) -> bytes:
    body = struct.pack("<I", 0) + b"\x00" + bson_encode(doc)  # flags, kind 0
    return (
        struct.pack("<iiii", len(body) + 16, request_id, response_to, OP_MSG)
        + body
    )


def _recv_exact(sock, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("connection closed mid-message")
        buf += chunk
    return buf


def read_op_msg(sock) -> tuple[int, int, dict]:
    """→ (request_id, response_to, command document)."""
    length, req, resp, op = struct.unpack("<iiii", _recv_exact(sock, 16))
    body = _recv_exact(sock, length - 16)
    if op != OP_MSG:
        raise ConnectionError(f"unsupported opCode {op}")
    if body[4:5] != b"\x00":
        raise ConnectionError("only OP_MSG section kind 0 is supported")
    return req, resp, bson_decode(body[5:])


# --------------------------------------------------------------------------
# The client
# --------------------------------------------------------------------------


class MongoChangeStreamClient:
    """``coll.Watch`` at the wire level: aggregate($changeStream) opens the
    cursor, getMore polls it, the resume token checkpoints as base64 raw
    BSON after each batch (`source.go:76-82,180` parity)."""

    def __init__(self, sock, db: str, collection: str,
                 checkpoint_path: str | None = None,
                 max_await_ms: int = 5000):
        self.sock = sock
        self.db = db
        self.collection = collection
        self.checkpoint_path = checkpoint_path
        self.max_await_ms = max_await_ms  # SetMaxAwaitTime(5s) default
        self.cursor_id = 0
        self.resume_token: dict | None = None
        self.start_token: dict | None = None  # stream position at open
        self.operation_time = None  # server $timestamp at open
        self._req = 0
        self._seq = 0

    @classmethod
    def dial(cls, dsn: str, **kw) -> "MongoChangeStreamClient":
        """Live-socket construction (``host:port`` -> TCP): the mock-to-live
        switch is this one call — every protocol byte is identical."""
        from librarian_spark.sources.dial import dial as _dial

        return cls(_dial(dsn), **kw)

    # -- checkpoint --------------------------------------------------------
    def load_checkpoint(self) -> dict | None:
        if self.checkpoint_path and os.path.exists(self.checkpoint_path):
            with open(self.checkpoint_path, encoding="utf-8") as fh:
                return bson_decode(base64.b64decode(fh.read().strip()))
        return None

    def save_checkpoint(self) -> None:
        if not self.checkpoint_path or self.resume_token is None:
            return
        tmp = self.checkpoint_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(
                base64.b64encode(bson_encode(self.resume_token)).decode()
            )
            fh.flush()
            os.fsync(fh.fileno())  # the token is a durability promise
        os.replace(tmp, self.checkpoint_path)

    # -- wire --------------------------------------------------------------
    def _command(self, doc: dict) -> dict:
        self._req += 1
        self.sock.sendall(encode_op_msg(doc, self._req))
        _req, resp, reply = read_op_msg(self.sock)
        if resp != self._req:
            raise ConnectionError(
                f"responseTo {resp} does not match request {self._req}"
            )
        if reply.get("ok") != 1.0:
            raise ConnectionError(f"server error: {reply}")
        return reply

    def hello(self, app_name: str = "librarian-replicator") -> dict:
        """The connection handshake every driver runs on socket open
        (``mongo.Connect`` does this inside the reference,
        `pkg/mongo/source.go:49-64`): a ``hello`` command on the admin
        database carrying the client-metadata document the spec requires
        (application/driver/os), answered with the server's wire-version
        window. Change streams need wire version ≥ 7 (MongoDB 4.0) —
        refuse older servers up front instead of failing mid-watch."""
        reply = self._command(
            {
                "hello": 1,
                "$db": "admin",
                "client": {
                    "application": {"name": app_name},
                    "driver": {
                        "name": "librarian-spark-wire",
                        "version": "1.0.0",
                    },
                    "os": {"type": "Linux"},
                },
            }
        )
        if reply.get("maxWireVersion", 0) < 7:
            raise ConnectionError(
                "server wire version "
                f"{reply.get('maxWireVersion')} < 7 — change streams "
                "unsupported"
            )
        self.server_info = reply
        return reply

    def ping(self) -> None:
        """`client.Ping` (`source.go:63`) — liveness probe on admin."""
        self._command({"ping": 1, "$db": "admin"})

    def connect(self, app_name: str = "librarian-replicator") -> None:
        """hello → ping → watch: the reference's full Connect sequence
        (`source.go:49-96`) in one call, from byte zero on a fresh
        socket."""
        self.hello(app_name)
        self.ping()
        self.watch()

    def watch(self) -> None:
        """Open the change-stream cursor, resuming from the checkpointed
        token when one exists (`coll.Watch` + SetResumeAfter). On a FRESH
        stream, the open reply's ``postBatchResumeToken`` (the stream's
        start position) and ``operationTime`` are captured — the initial
        sync anchors on them: copy the collection AFTER opening the
        stream, then resume from this token, and every change that raced
        the copy is re-applied (at-least-once, last-writer-wins — the
        Debezium/mongo initial-sync contract; exactly-once needs the
        snapshot-export semantics only PostgreSQL offers)."""
        stage: dict = {"$changeStream": {}}
        token = self.load_checkpoint()
        if token is not None:
            stage["$changeStream"]["resumeAfter"] = token
            self.resume_token = token
        reply = self._command(
            {
                "aggregate": self.collection,
                "pipeline": [stage],
                "cursor": {},
                "$db": self.db,
            }
        )
        cur = reply["cursor"]
        self.cursor_id = cur["id"]
        self._batch = cur.get("firstBatch", [])
        self.start_token = cur.get("postBatchResumeToken")
        self.operation_time = reply.get("operationTime")  # $timestamp or None

    def find_batches(self, batch_size: int = 1000):
        """Collection scan (``find`` + ``getMore``) yielding document
        batches — the initial-sync copy. Runs its OWN cursor (local id),
        so the open change-stream cursor is untouched; call between
        :meth:`watch` and the first :meth:`batches` sweep."""
        reply = self._command(
            {
                "find": self.collection,
                "batchSize": batch_size,
                "$db": self.db,
            }
        )
        cur = reply["cursor"]
        cursor_id = cur["id"]
        batch = cur.get("firstBatch", [])
        while True:
            if batch:
                yield batch
            if cursor_id == 0:
                return
            reply = self._command(
                {
                    "getMore": cursor_id,
                    "collection": self.collection,
                    "$db": self.db,
                    "batchSize": batch_size,
                }
            )
            cur = reply["cursor"]
            cursor_id = cur["id"]
            batch = cur.get("nextBatch", [])

    def batches(self, max_batches: int | None = None,
                stop_on_empty: bool = False):
        """Yield raw change-document batches; the resume-token checkpoint
        advances AFTER the consumer returns from each yield (so a recorder
        persists the batch before the token moves). Ends when the server
        closes the cursor (id 0) or after ``max_batches``.
        ``stop_on_empty`` bounds a drain against a LIVE tailing cursor
        (which never closes): an empty getMore — the server waited the
        full maxAwaitTime with nothing new — ends the sweep."""
        batches = 0
        batch = getattr(self, "_batch", [])
        self._batch = []  # consume: a later batches() call must not replay
        # the firstBatch (duplicate rows + a checkpoint REGRESSION to its
        # token) — the buffer is single-shot
        while True:
            if batch:
                yield batch
                token = batch[-1].get("_id")
                if token is None:
                    # a change doc with no _id would silently null the
                    # resume token, making save_checkpoint a no-op — the
                    # stream keeps running but durability stops advancing
                    # and a later resume replays from a stale token with
                    # no error surfaced. Fail loudly instead.
                    raise ValueError(
                        "change document missing _id resume token — "
                        "cannot advance the checkpoint"
                    )
                self.resume_token = token
                self.save_checkpoint()
            batches += 1
            if self.cursor_id == 0:
                return
            if max_batches is not None and batches >= max_batches:
                return
            reply = self._command(
                {
                    "getMore": self.cursor_id,
                    "collection": self.collection,
                    "$db": self.db,
                    "maxTimeMS": self.max_await_ms,
                }
            )
            cur = reply["cursor"]
            self.cursor_id = cur["id"]
            batch = cur.get("nextBatch", [])
            if stop_on_empty and not batch:
                return

    def events(self, max_batches: int | None = None):
        """Yield CDC rows (decoded batch by batch — the Watch consumer)."""
        for batch in self.batches(max_batches):
            for doc in batch:
                self._seq += 1
                yield decode_change_event(doc, self._seq)

    def close(self) -> None:
        """killCursors — the Watch close (`source.go:120-127`)."""
        if self.cursor_id:
            self._command(
                {
                    "killCursors": self.collection,
                    "cursors": [self.cursor_id],
                    "$db": self.db,
                }
            )
            self.cursor_id = 0
