"""Replicator lifecycle FSM: the reference's transition table
(`pkg/replicator/fsm.go:14-26,55-88`) enforced and observable, and the
reconnect-with-backoff path driven end-to-end — a source that dies
mid-stream surfaces as error, reconnects through reconnecting back to
streaming, and loses no events (the failed batch's offsets were never
committed, so it replays).
"""

from __future__ import annotations

import json
import os

import pytest

from librarian_spark.streaming.fsm import InvalidTransitionError, ReplicatorFSM
from librarian_spark.streaming.replicate import ReplicateConfig, Replicator


def test_fsm_transition_table():
    f = ReplicatorFSM()
    assert f.current == "created"
    for s in ("connecting", "streaming", "paused", "streaming",
              "reconnecting", "streaming", "stopped", "connecting",
              "error", "reconnecting", "error", "stopped"):
        f.transition(s)
        assert f.current == s
    assert f.history[0] == "created" and f.history[-1] == "stopped"


def test_fsm_invalid_transitions_raise():
    f = ReplicatorFSM()
    with pytest.raises(InvalidTransitionError, match="created -> streaming"):
        f.transition("streaming")  # must connect first
    f.transition("connecting")
    f.transition("streaming")
    f.transition("stopped")
    with pytest.raises(InvalidTransitionError):
        f.transition("paused")  # stopped can only restart via connecting
    with pytest.raises(ValueError, match="unknown state"):
        f.transition("draining")


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


def _write(d: str, name: str, lines: list[str]) -> None:
    with open(os.path.join(d, name), "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")


def test_error_reconnecting_streaming_no_event_loss(spark, tmp_path):
    """Kill the source mid-stream (corrupt segment), observe
    error → reconnecting → streaming, and verify zero loss: the failed
    batch never committed, so the repaired segment replays exactly once."""
    seg = str(tmp_path / "cdc")
    os.makedirs(seg)
    _write(seg, "seg-000.jsonl", [
        _envelope("c", 101, {"id": 1, "name": "alice"}),
        _envelope("c", 102, {"id": 2, "name": "bob"}),
    ])
    rep = Replicator(
        spark,
        ReplicateConfig(
            replicator_id="fsm_repl",
            checkpoint_dir=str(tmp_path / "ckpt"),
            source_format="cdc_jsonl",
            source_path=seg,
            target_format="parquet",
            target_path=str(tmp_path / "out"),
            trigger_processing_time="0 seconds",
        ),
    )
    q = rep.start()
    try:
        q.processAllAvailable()
        assert rep.state == "streaming"
        assert spark.read.parquet(str(tmp_path / "out")).count() == 2

        # the stream breaks: a garbage segment kills the decode task
        _write(seg, "seg-001.jsonl", ["this is not an envelope {"])
        with pytest.raises(Exception):
            q.processAllAvailable()
        assert rep.state == "error"
        assert rep.last_error  # exception surfaced

        # the HTTP info surface reports the error state + message
        from librarian_spark.streaming.server import ReplicatorServer

        info = ReplicatorServer().info(rep)
        assert info["state"] == "error"
        assert info["stats"]["replicator"]["last_error"]

        # source repaired → reconnect walks error → reconnecting → streaming
        _write(seg, "seg-001.jsonl", [
            _envelope("u", 103, {"id": 1, "name": "alice2"},
                      {"id": 1, "name": "alice"}),
            _envelope("c", 104, {"id": 3, "name": "carol"}),
        ])
        q = rep.reconnect(max_attempts=3, backoff_s=0.05, verify_drain=True)
        assert rep.state == "streaming"
        tail = list(rep.fsm.history)
        i = max(j for j, s in enumerate(tail) if s == "error")
        assert tail[i : i + 3] == ["error", "reconnecting", "streaming"]

        # no loss, no duplication: 2 pre-failure + 2 replayed rows
        got = spark.read.parquet(str(tmp_path / "out"))
        assert got.count() == 4
        assert sorted(r["lsn"] for r in got.collect()) == [101, 102, 103, 104]
    finally:
        rep.stop()


def test_reconnect_exhausted_lands_in_error(spark, tmp_path):
    """A source that stays broken: reconnect retries with backoff, then
    gives up in error (reference: reconnecting → error, fsm.go:75-77)."""
    seg = str(tmp_path / "cdc")
    os.makedirs(seg)
    _write(seg, "seg-000.jsonl", [_envelope("c", 101, {"id": 1})])
    rep = Replicator(
        spark,
        ReplicateConfig(
            replicator_id="fsm_repl2",
            checkpoint_dir=str(tmp_path / "ckpt"),
            source_format="cdc_jsonl",
            source_path=seg,
            target_format="parquet",
            target_path=str(tmp_path / "out"),
            trigger_processing_time="0 seconds",
        ),
    )
    q = rep.start()
    try:
        q.processAllAvailable()
        _write(seg, "seg-001.jsonl", ["still broken {"])
        with pytest.raises(Exception):
            q.processAllAvailable()
        assert rep.state == "error"
        with pytest.raises(RuntimeError, match="reconnect failed after 2"):
            rep.reconnect(max_attempts=2, backoff_s=0.01, verify_drain=True)
        assert rep.state == "error"
    finally:
        rep.stop()
