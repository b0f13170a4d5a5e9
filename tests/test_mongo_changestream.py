"""Mongo change-stream decode: Extended-JSON unwrapping, the reference's
op mapping (`/root/reference/pkg/mongo/source.go:189-234`), and the
``mongo_changestream`` DataSource through batch + streaming machinery.
The offset/pause protocol is shared scaffolding (sources/segments.py)
already pinned by the pgoutput/cdc_jsonl suites; here the per-format
decode and end-to-end paths are covered.
"""

from __future__ import annotations

import json
import os

import pytest

from librarian_spark.sources.mongo_changestream import (
    decode_change_event,
    register,
    unwrap_extended_json,
)


def _ev(i, t_s, op, key, full=None, before=None):
    doc = {
        "_id": {"_data": f"{i:012d}"},
        "operationType": op,
        "clusterTime": {"$timestamp": {"t": t_s, "i": i}},
        "ns": {"db": "appdb", "coll": "users"},
        "documentKey": {"_id": {"$numberLong": str(key)}},
    }
    if full is not None:
        doc["fullDocument"] = full
    if before is not None:
        doc["fullDocumentBeforeChange"] = before
    return doc


def test_extended_json_unwrap():
    assert unwrap_extended_json({"$numberLong": "9007199254740993"}) == 9007199254740993
    assert unwrap_extended_json({"$numberInt": "-5"}) == -5
    assert unwrap_extended_json({"$numberDouble": "2.5"}) == 2.5
    assert unwrap_extended_json({"$oid": "65f0a1b2c3d4e5f6a7b8c9d0"}) == (
        "65f0a1b2c3d4e5f6a7b8c9d0"
    )
    # the oplog ordinal folds into the sub-second field (clamped at 999)
    # so same-second events keep their order through ts_ms
    assert unwrap_extended_json({"$timestamp": {"t": 1700000000, "i": 7}}) == (
        1_700_000_000_007
    )
    assert unwrap_extended_json({"$timestamp": {"t": 1700000000, "i": 5000}}) == (
        1_700_000_000_999
    )
    nested = {"a": [{"$numberLong": "1"}, {"b": {"$numberInt": "2"}}]}
    assert unwrap_extended_json(nested) == {"a": [1, {"b": 2}]}
    # unknown wrappers pass through untouched (loud in parity, not coerced)
    assert unwrap_extended_json({"$unknown": "x"}) == {"$unknown": "x"}


def test_decode_op_mapping_and_images():
    """insert→c, update/replace→u, delete→d, unknown→r; delete without
    pre-images surfaces documentKey as the before image; collection plays
    schema AND table; clusterTime stamps ts_ms."""
    ins = decode_change_event(
        _ev(1, 1_700_000_000, "insert", 5, {"_id": {"$numberLong": "5"}, "n": "a"}),
        0,
    )
    assert ins[0] == "c" and ins[1] == 1_700_000_000_001
    assert (ins[2], ins[3], ins[4], ins[5]) == ("appdb", "users", "users", None)
    assert ins[7] == '{"_id":5,"n":"a"}' and ins[6] is None
    assert ins[8] == "000000000001"

    rep = decode_change_event(
        _ev(2, 1_700_000_001, "replace", 5, {"_id": {"$numberLong": "5"}, "n": "b"}),
        1,
    )
    assert rep[0] == "u" and rep[7] == '{"_id":5,"n":"b"}'

    upd = decode_change_event(
        _ev(
            3,
            1_700_000_002,
            "update",
            5,
            {"_id": {"$numberLong": "5"}, "n": "c"},
            before={"_id": {"$numberLong": "5"}, "n": "b"},
        ),
        2,
    )
    assert upd[0] == "u" and upd[6] == '{"_id":5,"n":"b"}'

    dele = decode_change_event(_ev(4, 1_700_000_003, "delete", 5), 3)
    assert dele[0] == "d" and dele[7] is None
    assert dele[6] == '{"_id":5}'  # documentKey as the before image

    other = decode_change_event(_ev(5, 1_700_000_004, "invalidate", 5), 4)
    assert other[0] == "r"  # the reference's default branch


@pytest.fixture
def stream_dir(tmp_path):
    d = tmp_path / "cs"
    d.mkdir()
    with open(d / "seg-0000.cstream", "w") as fh:
        fh.write(
            "\n".join(
                json.dumps(e, separators=(",", ":"))
                for e in [
                    _ev(1, 1_700_000_000, "insert", 1,
                        {"_id": {"$numberLong": "1"}, "n": "a"}),
                    _ev(2, 1_700_000_000, "insert", 2,
                        {"_id": {"$numberLong": "2"}, "n": "b"}),
                ]
            )
            + "\n"
        )
    with open(d / "seg-0001.cstream", "w") as fh:
        fh.write(
            json.dumps(
                _ev(3, 1_700_000_001, "replace", 1,
                    {"_id": {"$numberLong": "1"}, "n": "a2"}),
                separators=(",", ":"),
            )
            + "\n"
        )
    return str(d)


def test_batch_replay(spark, stream_dir):
    register(spark)
    df = spark.read.format("mongo_changestream").option("path", stream_dir).load()
    rows = sorted(df.collect(), key=lambda r: r["position"])
    assert [r["op"] for r in rows] == ["c", "c", "u"]
    assert rows[2]["after"] == '{"_id":1,"n":"a2"}'
    assert rows[0]["db"] == "appdb" and rows[0]["table"] == "users"
    assert rows[0]["lsn"] is None  # no LSN concept; resume token is position


def test_replicator_mongo_source_end_to_end(spark, stream_dir, tmp_path):
    from librarian_spark.streaming.replicate import ReplicateConfig, Replicator

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    rep = Replicator(
        spark,
        ReplicateConfig(
            replicator_id="mcs_repl",
            checkpoint_dir=ckpt,
            source_format="mongo_changestream",
            source_path=stream_dir,
            target_format="parquet",
            target_path=out,
            trigger_processing_time="0 seconds",
        ),
    )
    q = rep.start()
    try:
        q.processAllAvailable()
        # a new segment lands → exactly the new rows
        with open(os.path.join(stream_dir, "seg-0002.cstream"), "w") as fh:
            fh.write(
                json.dumps(_ev(4, 1_700_000_002, "delete", 2), separators=(",", ":"))
                + "\n"
            )
        q.processAllAvailable()
    finally:
        rep.stop()
    got = spark.read.parquet(out)
    assert got.count() == 4
    assert got.filter("op = 'd'").collect()[0]["before"] == '{"_id":2}'
