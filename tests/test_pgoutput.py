"""pgoutput wire decode: codec round-trip, decoder semantics matching the
reference's handler mapping (`/root/reference/pkg/postgres/source.go:181-445`),
envelope goldens, and the ``pgoutput`` DataSource driven through real batch
and Structured Streaming machinery over recorded WAL segments.
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from librarian_spark.sources.pgoutput import (
    OID_INT4,
    OID_INT8,
    PgOutputDecoder,
    decode_segment,
    encode_begin,
    encode_commit,
    encode_delete,
    encode_insert,
    encode_relation,
    encode_update,
    parse_message,
    read_segment_frames,
    register,
    write_segment,
)

OID_TEXT = 25
OID_FLOAT8 = 701

USERS_COLS = [("id", OID_INT8), ("name", OID_TEXT), ("score", OID_FLOAT8)]


def _txn(rel_id: int, lsn: int, ts_ms: int, xid: int, dml: list[bytes]) -> list[bytes]:
    return [encode_begin(lsn, ts_ms, xid), *dml, encode_commit(lsn, lsn + 8, ts_ms)]


def _users_segment(path: str, lsn: int, ts_ms: int, dml: list[bytes]) -> None:
    """A self-contained segment: Relation preamble + one transaction."""
    rel = encode_relation(55001, "public", "users", USERS_COLS)
    write_segment(path, [rel, *_txn(55001, lsn, ts_ms, 700 + lsn, dml)])


def test_codec_round_trip():
    """encode → parse is the identity on every message type and field."""
    b = parse_message(encode_begin(7777, 1_700_000_000_123, 42))
    assert b == {
        "type": "begin",
        "final_lsn": 7777,
        "commit_ts_ms": 1_700_000_000_123,
        "xid": 42,
    }
    c = parse_message(encode_commit(7777, 7785, 1_700_000_000_123))
    assert (c["commit_lsn"], c["end_lsn"], c["commit_ts_ms"]) == (
        7777,
        7785,
        1_700_000_000_123,
    )
    r = parse_message(encode_relation(9, "public", "users", USERS_COLS))
    rel = r["relation"]
    assert (rel.rel_id, rel.namespace, rel.name) == (9, "public", "users")
    assert rel.columns == USERS_COLS
    i = parse_message(encode_insert(9, ["1", "alice", None]))
    assert i == {"type": "insert", "rel_id": 9, "new": ["1", "alice", None]}
    u = parse_message(encode_update(9, ["1", "bob", "2.5"], ["1", "alice", None]))
    assert u["old"] == ["1", "alice", None] and u["new"] == ["1", "bob", "2.5"]
    d = parse_message(encode_delete(9, ["1", None, None]))
    assert d == {"type": "delete", "rel_id": 9, "old": ["1", None, None]}
    # non-ASCII text survives the UTF-8 round trip
    i2 = parse_message(encode_insert(9, ["1", "héllo wörld", None]))
    assert i2["new"][1] == "héllo wörld"


def test_decoder_semantics():
    """Handler mapping (Insert→c/Update→u/Delete→d), int4/int8 typing, and
    WAL-derived lsn/ts stamps — the reference's tupleToMap rule
    (`source.go:404-445`) with deterministic transaction stamps."""
    dec = PgOutputDecoder("appdb")
    rows = []
    msgs = [
        encode_relation(9, "public", "users", USERS_COLS),
        encode_begin(500, 1_700_000_111_000, 31),
        encode_insert(9, ["1", "alice", "2.25"]),
        encode_update(9, ["1", "alice2", None], ["1", "alice", "2.25"]),
        encode_delete(9, ["1", None, None]),
        encode_commit(500, 508, 1_700_000_111_000),
    ]
    for m in msgs:
        rows.extend(dec.feed(m))
    assert [r[0] for r in rows] == ["c", "u", "d"]
    # int8 column parses to int; float8 stays TEXT (the reference only
    # special-cases int4/int8); nulls stay null; keys sort Go-style
    assert rows[0][7] == '{"id":1,"name":"alice","score":"2.25"}'
    assert rows[1][6] == '{"id":1,"name":"alice","score":"2.25"}'  # before
    assert rows[1][7] == '{"id":1,"name":"alice2","score":null}'
    assert rows[2][7] is None and rows[2][6] == '{"id":1,"name":null,"score":null}'
    # every event stamped with the ENCLOSING txn's lsn + commit ts
    assert all(r[5] == 500 and r[1] == 1_700_000_111_000 for r in rows)
    assert (rows[0][2], rows[0][3], rows[0][4]) == ("appdb", "public", "users")
    assert rows[0][8] == "500:1" and rows[2][8] == "500:3"


def test_truncate_skip_with_counter():
    """TRUNCATE on a replicated table produces NO CDC row — matching the
    reference's message switch, which has no Truncate arm
    (`pkg/postgres/source.go` default case) — but the skip is COUNTED
    per-tag and per-table so it is observable, not a silent vanish.
    Unknown tags ('M' logical Message, 'O' Origin, …) count the same way."""
    from librarian_spark.sources.pgoutput import encode_truncate

    raw = encode_truncate([9, 14], options=2)
    msg = parse_message(raw)
    assert msg == {"type": "truncate", "rel_ids": [9, 14], "options": 2}

    dec = PgOutputDecoder("appdb")
    rows = []
    msgs = [
        encode_relation(9, "public", "users", USERS_COLS),
        encode_begin(500, 1_700_000_111_000, 31),
        encode_insert(9, ["1", "a", None]),
        encode_truncate([9]),
        b"M" + b"\x00" * 8,  # logical decoding Message — unknown tag
        encode_insert(9, ["2", "b", None]),
        encode_commit(500, 508, 1_700_000_111_000),
    ]
    for m in msgs:
        rows.extend(dec.feed(m))
    assert [r[0] for r in rows] == ["c", "c"]  # truncate yielded nothing
    assert dec.skipped_other["T"] == 1
    assert dec.skipped_other["truncate:public.users"] == 1
    assert dec.skipped_other["M"] == 1
    # unregistered relation OID still counts, labeled by oid
    list(dec.feed(encode_truncate([777])))
    assert dec.skipped_other["truncate:oid=777"] == 1


def test_snapshot_marker_decodes_inserts_as_r():
    """The container's 'S' frame (initial-snapshot segments) flips Inserts
    to op='r' for the enclosing transaction only — the next real streamed
    transaction in the same decode session is back to 'c'. The snapshot
    rows carry the consistent-point LSN so (ts_ms, lsn) ordering puts them
    before every streamed change."""
    from librarian_spark.sources.pgoutput import encode_snapshot_marker

    dec = PgOutputDecoder("appdb")
    rows = []
    msgs = [
        encode_relation(9, "public", "users", USERS_COLS),
        encode_snapshot_marker(),
        encode_begin(400, 1_700_000_000_000, 0),
        encode_insert(9, ["1", "a", None]),
        encode_insert(9, ["2", "b", None]),
        encode_commit(400, 400, 1_700_000_000_000),
        # a later REAL transaction: ordinary ops again
        encode_begin(500, 1_700_000_111_000, 31),
        encode_insert(9, ["3", "c", None]),
        encode_commit(500, 508, 1_700_000_111_000),
    ]
    for m in msgs:
        rows.extend(dec.feed(m))
    assert [(r[0], r[5]) for r in rows] == [
        ("r", 400), ("r", 400), ("c", 500)
    ]
    assert rows[0][7] == '{"id":1,"name":"a","score":null}'  # typed same rule

    # chunked snapshots: every chunk decodes with a FRESH decoder (one
    # Spark input partition per segment) but shares the consistent-point
    # LSN — the marker's seq_base is what keeps positions globally unique
    chunk2 = PgOutputDecoder("appdb")
    rows2 = []
    for m in [
        encode_relation(9, "public", "users", USERS_COLS),
        encode_snapshot_marker(seq_base=2),
        encode_begin(400, 1_700_000_000_000, 0),
        encode_insert(9, ["3", "cc", None]),
        encode_commit(400, 400, 1_700_000_000_000),
    ]:
        rows2.extend(chunk2.feed(m))
    positions = [r[8] for r in rows] + [r[8] for r in rows2]
    assert positions[:2] == ["400:1", "400:2"] and rows2[0][8] == "400:3"
    assert len(set(positions)) == len(positions)


def test_decoder_unknown_relation_raises():
    dec = PgOutputDecoder("appdb")
    list(dec.feed(encode_begin(1, 1000, 1)))
    with pytest.raises(ValueError, match="unknown relation ID"):
        list(dec.feed(encode_insert(12345, ["1"])))


def test_truncated_frame_raises(tmp_path):
    p = str(tmp_path / "bad.pgwal")
    write_segment(p, [encode_begin(1, 1000, 1)])
    with open(p, "ab") as fh:
        fh.write(b"\x00\x00\x00\xff")  # frame header promising 255 bytes
    with pytest.raises(ValueError, match="truncated"):
        list(read_segment_frames(p))


def test_decoded_rows_build_reference_envelopes(spark, tmp_path):
    """WAL bytes → decode → build_envelope_json must produce the exact byte
    shape the reference's Kafka producer emits (Go json.Marshal field order,
    `pkg/replicator/event.go:14-56`) — fixture bytes in, envelope goldens out."""
    from librarian_spark.streaming.envelope import build_envelope_json

    seg = str(tmp_path / "seg-000.pgwal")
    _users_segment(
        seg, 600, 1_700_000_222_000, [encode_insert(55001, ["7", "carol", None])]
    )
    rows = list(decode_segment(seg, "appdb"))
    assert len(rows) == 1
    df = spark.createDataFrame(rows, schema="op string, ts_ms long, db string, "
                               "schema_name string, table string, lsn long, "
                               "before string, after string, position string")
    got = df.select(
        build_envelope_json(
            before_json=F.col("before"),
            after_json=F.col("after"),
            version=F.lit("1.0.0"),
            connector=F.lit("postgresql"),
            name=F.col("db"),
            source_ts_ms=F.col("ts_ms"),
            snapshot=F.lit("false"),
            db=F.col("db"),
            schema=F.col("schema_name"),
            table=F.col("table"),
            op=F.col("op"),
            ts_ms=F.col("ts_ms"),
            lsn=F.col("lsn"),
        ).alias("value")
    ).collect()[0].value
    expected = (
        '{"payload":{"before":null,'
        '"after":{"id":7,"name":"carol","score":null},'
        '"source":{"version":"1.0.0","connector":"postgresql","name":"appdb",'
        '"ts_ms":1700000222000,"snapshot":"false","db":"appdb","schema":"public",'
        '"table":"users","lsn":600,"xmin":null},'
        '"op":"c","ts_ms":1700000222000,"transaction":null}}'
    )
    assert got == expected


@pytest.fixture
def wal_dir(tmp_path):
    d = tmp_path / "wal"
    d.mkdir()
    _users_segment(
        str(d / "seg-000.pgwal"),
        100,
        1_700_000_000_000,
        [
            encode_insert(55001, ["1", "alice", None]),
            encode_insert(55001, ["2", "bob", "1.5"]),
        ],
    )
    _users_segment(
        str(d / "seg-001.pgwal"),
        200,
        1_700_000_001_000,
        [encode_update(55001, ["1", "alice2", None], ["1", "alice", None])],
    )
    return str(d)


def test_batch_replay(spark, wal_dir):
    register(spark)
    df = spark.read.format("pgoutput").option("path", wal_dir).option("db", "appdb").load()
    rows = sorted(df.collect(), key=lambda r: (r["lsn"], r["position"]))
    assert [r["op"] for r in rows] == ["c", "c", "u"]
    assert rows[0]["after"] == '{"id":1,"name":"alice","score":null}'
    assert rows[2]["before"] == '{"id":1,"name":"alice","score":null}'
    assert rows[2]["after"] == '{"id":1,"name":"alice2","score":null}'
    assert [r["lsn"] for r in rows] == [100, 100, 200]
    assert rows[0]["db"] == "appdb" and rows[0]["table"] == "users"


def test_stream_incremental_and_resume(spark, wal_dir, tmp_path):
    """Micro-batch consumption + restart-from-checkpoint over WAL segments —
    resume ≡ LSN restart (`pkg/postgres/source.go:597-621`)."""
    register(spark)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def start():
        return (
            spark.readStream.format("pgoutput")
            .option("path", wal_dir)
            .option("db", "appdb")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
        assert spark.read.parquet(out).count() == 3
        _users_segment(
            os.path.join(wal_dir, "seg-002.pgwal"),
            300,
            1_700_000_002_000,
            [encode_delete(55001, ["2", None, None])],
        )
        q.processAllAvailable()
        got = spark.read.parquet(out)
        assert got.count() == 4
        assert got.filter("op = 'd'").collect()[0]["lsn"] == 300
    finally:
        q.stop()

    # segment lands while the query is down; restart consumes ONLY the new one
    _users_segment(
        os.path.join(wal_dir, "seg-003.pgwal"),
        400,
        1_700_000_003_000,
        [encode_insert(55001, ["3", "dora", None])],
    )
    q2 = start()
    try:
        q2.processAllAvailable()
        lsns = sorted(r["lsn"] for r in spark.read.parquet(out).collect())
        assert lsns == [100, 100, 200, 300, 400]
    finally:
        q2.stop()


def test_replicator_pgoutput_source_end_to_end(spark, wal_dir, tmp_path):
    """The full replicate loop over raw WAL bytes: pgoutput source →
    parquet sink, no Kafka hop, exactly-once counts."""
    from librarian_spark.streaming.replicate import ReplicateConfig, Replicator

    out, ckpt = str(tmp_path / "rout"), str(tmp_path / "rckpt")
    rep = Replicator(
        spark,
        ReplicateConfig(
            replicator_id="pg_repl",
            checkpoint_dir=ckpt,
            source_format="pgoutput",
            source_path=wal_dir,
            source_options={"db": "appdb"},
            target_format="parquet",
            target_path=out,
        ),
    )
    q = rep.start()
    try:
        q.processAllAvailable()
    finally:
        rep.stop()
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert {r["op"] for r in got.collect()} == {"c", "u"}
    # decoded rows are fully typed — downstream SCD2/materialize run unchanged
    assert dict(got.dtypes)["lsn"] == "bigint"


def test_pause_resume_true_suspend(spark, wal_dir, tmp_path):
    """Reference-FSM pause parity (`fsm.go:50-129`): pause suspends a LIVE
    query (no teardown — the query object stays active), events arriving
    during the pause are neither consumed nor lost, and resume picks them up
    on the next trigger with exactly-once counts (no re-read of consumed
    segments — the parquet sink would show duplicate lsns)."""
    import time

    from librarian_spark.streaming.replicate import ReplicateConfig, Replicator

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    rep = Replicator(
        spark,
        ReplicateConfig(
            replicator_id="pg_pause",
            checkpoint_dir=ckpt,
            source_format="pgoutput",
            source_path=wal_dir,
            source_options={"db": "appdb"},
            target_format="parquet",
            target_path=out,
            trigger_processing_time="0 seconds",
        ),
    )
    q = rep.start()
    try:
        q.processAllAvailable()
        assert spark.read.parquet(out).count() == 3
        rep.pause()
        assert rep.state == "paused"
        assert q.isActive  # true suspend: the query was NOT torn down
        # a segment lands mid-pause…
        _users_segment(
            os.path.join(wal_dir, "seg-010.pgwal"),
            900,
            1_700_000_009_000,
            [encode_insert(55001, ["9", "eve", None])],
        )
        # …and the paused query must not consume it (frozen latestOffset
        # means processAllAvailable sees nothing pending and returns)
        q.processAllAvailable()
        time.sleep(0.5)
        assert spark.read.parquet(out).count() == 3
        rep.resume()
        assert rep.state == "streaming"
        q.processAllAvailable()
        rows = spark.read.parquet(out).collect()
        assert len(rows) == 4  # the paused-era segment, exactly once
        assert sorted(r["lsn"] for r in rows) == [100, 100, 200, 900]
    finally:
        rep.stop()


def test_restart_clears_stale_pause_marker(spark, wal_dir, tmp_path):
    """Regression: a pause marker must not survive into a NEW query — a
    fresh reader has no held offset, so it would drain the paused-era
    backlog while `state` still reported "paused". start() clears the
    marker: after restart the replicator reports streaming and consumes
    the backlog exactly once."""
    from librarian_spark.streaming.replicate import ReplicateConfig, Replicator

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    rep = Replicator(
        spark,
        ReplicateConfig(
            replicator_id="pg_pause_restart",
            checkpoint_dir=ckpt,
            source_format="pgoutput",
            source_path=wal_dir,
            source_options={"db": "appdb"},
            target_format="parquet",
            target_path=out,
            trigger_processing_time="0 seconds",
        ),
    )
    q = rep.start()
    try:
        q.processAllAvailable()
        rep.pause()
        _users_segment(
            os.path.join(wal_dir, "seg-020.pgwal"),
            950,
            1_700_000_010_000,
            [encode_insert(55001, ["12", "mallory", None])],
        )
    finally:
        rep.stop()
    assert os.path.exists(rep.pause_marker)  # stop() keeps the marker…
    q2 = rep.restart()  # …but a new query starts unpaused, by contract
    try:
        assert not os.path.exists(rep.pause_marker)
        assert rep.state == "streaming"
        q2.processAllAvailable()
        lsns = sorted(r["lsn"] for r in spark.read.parquet(out).collect())
        assert lsns == [100, 100, 200, 950]  # backlog exactly once
    finally:
        rep.stop()
