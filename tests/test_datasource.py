"""Custom ``cdc_jsonl`` Python DataSource: batch replay, incremental
micro-batches, and checkpoint resume — the reference's source/checkpoint
contract (`pkg/replicator/replicator.go:46-60`, `checkpoint.go:14-18`) driven
through real Structured Streaming machinery.
"""

from __future__ import annotations

import json
import os

import pytest

from librarian_spark.sources.cdc_datasource import register
from librarian_spark.streaming.replicate import ReplicateConfig, Replicator


def _envelope(op: str, lsn: int, after: dict | None, before: dict | None = None):
    return json.dumps(
        {
            "payload": {
                "before": before,
                "after": after,
                "source": {
                    "version": "1.0.0",
                    "connector": "postgresql",
                    "name": "src",
                    "ts_ms": 1000 + lsn,
                    "snapshot": "false",
                    "db": "app",
                    "schema": "public",
                    "table": "users",
                    "lsn": lsn,
                    "xmin": None,
                },
                "op": op,
                "ts_ms": 1000 + lsn,
                "transaction": None,
            }
        }
    )


def _write_segment(dirpath: str, name: str, lines: list[str]) -> None:
    with open(os.path.join(dirpath, name), "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")


@pytest.fixture
def segments(tmp_path):
    d = tmp_path / "cdc"
    d.mkdir()
    _write_segment(
        str(d),
        "seg-000.jsonl",
        [
            _envelope("c", 101, {"id": 1, "name": "alice"}),
            _envelope("c", 102, {"id": 2, "name": "bob"}),
        ],
    )
    _write_segment(
        str(d),
        "seg-001.jsonl",
        [_envelope("u", 103, {"id": 1, "name": "alice2"}, {"id": 1, "name": "alice"})],
    )
    return str(d)


def test_batch_replay(spark, segments):
    register(spark)
    df = spark.read.format("cdc_jsonl").option("path", segments).load()
    rows = sorted(df.collect(), key=lambda r: r["lsn"])
    assert [r["op"] for r in rows] == ["c", "c", "u"]
    assert rows[0]["db"] == "app" and rows[0]["schema_name"] == "public"
    assert rows[0]["table"] == "users"
    # after/before render as Go-style sorted-key JSON text
    assert rows[2]["after"] == '{"id":1,"name":"alice2"}'
    assert rows[2]["before"] == '{"id":1,"name":"alice"}'
    assert rows[2]["position"] == "seg-001.jsonl:0"
    assert rows[0]["ts_ms"] == 1101


def test_stream_incremental_and_resume(spark, segments, tmp_path):
    register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def start():
        return (
            spark.readStream.format("cdc_jsonl")
            .option("path", segments)
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
        # a new segment arrives → exactly the new rows, in the next micro-batch
        _write_segment(segments, "seg-002.jsonl", [_envelope("d", 104, None, {"id": 2})])
        q.processAllAvailable()
        got = spark.read.parquet(out)
        assert got.count() == 4
        assert got.filter("op = 'd'").collect()[0]["before"] == '{"id":2}'
    finally:
        q.stop()

    # segment written while the query is DOWN, then restart from checkpoint:
    # only the unseen segment is processed (resume ≡ LSN restart,
    # `pkg/postgres/source.go:597-621`) — the file sink is exactly-once, so a
    # replay would surface as duplicate lsn rows
    _write_segment(segments, "seg-003.jsonl", [_envelope("c", 105, {"id": 3})])
    q2 = start()
    try:
        q2.processAllAvailable()
        lsns = sorted(r["lsn"] for r in spark.read.parquet(out).collect())
        assert lsns == [101, 102, 103, 104, 105]
    finally:
        q2.stop()


def test_replicator_cdc_source_end_to_end(spark, segments, tmp_path):
    cfg = ReplicateConfig(
        replicator_id="cdc_repl_mem",
        checkpoint_dir=str(tmp_path / "ckpt2"),
        source_format="cdc_jsonl",
        source_path=segments,
        target_format="memory",
    )
    r = Replicator(spark, cfg)
    r.start()
    try:
        r.process_available()
        df = spark.table("cdc_repl_mem")
        assert df.count() == 3
        assert set(df.select("op").toPandas()["op"]) == {"c", "u"}
    finally:
        r.stop()
    assert r.state == "stopped"


def test_snapshot_rows_as_cdc_matches_decoder_json(spark):
    """The parallel-snapshot bridge must produce byte-identical after
    images to the segment exporter's decode path (sorted keys, compact,
    nulls KEPT) — otherwise a key loaded via the cluster path and then
    updated via the stream would show a spurious image diff."""
    from librarian_spark.sources.pg_snapshot import snapshot_rows_as_cdc
    from librarian_spark.sources.pgoutput import (
        PgOutputDecoder,
        encode_begin,
        encode_commit,
        encode_insert,
        encode_relation,
        encode_snapshot_marker,
    )

    df = spark.createDataFrame(
        [(2, None), (1, "a")], "id int, v string"
    )
    out = snapshot_rows_as_cdc(
        df, db="appdb", schema_name="public", table="users",
        lsn=400, ts_ms=1_700_000_000_000,
    )
    rows = {r["after"]: r for r in out.collect()}
    assert set(rows) == {'{"id":2,"v":null}', '{"id":1,"v":"a"}'}
    r = rows['{"id":2,"v":null}']
    assert (r["op"], r["ts_ms"], r["lsn"], r["before"]) == (
        "r", 1_700_000_000_000, 400, None
    )
    assert r["position"].startswith("400:")
    assert len({x["position"] for x in rows.values()}) == 2

    # the decoder path, same logical rows: identical after-image bytes
    dec = PgOutputDecoder("appdb")
    decoded = []
    for m in [
        encode_relation(7, "public", "users", [("id", 23), ("v", 25)]),
        encode_snapshot_marker(),
        encode_begin(400, 1_700_000_000_000, 0),
        encode_insert(7, ["2", None]),
        encode_insert(7, ["1", "a"]),
        encode_commit(400, 400, 1_700_000_000_000),
    ]:
        decoded.extend(dec.feed(m))
    assert {d[7] for d in decoded} == set(rows)
