"""Streaming stats, mirroring the reference's observability surface.

Reference (`/root/reference/pkg/replicator/stats.go:5-45`): per-source stats
(total_events, total_bytes, last_event_at, connection health), per-target stats
(total_events, last_write_at), and replicator stats (started_at, uptime, state,
checkpoint_count). Served over HTTP (`pkg/replicator/server.go:57-165`).

Spark equivalent: a ``StreamingQueryListener`` accumulates the same fields from
query progress events — ``numInputRows`` feeds total_events, each committed
micro-batch is one checkpoint, and the query lifecycle drives state. The dict
from :meth:`StatsListener.stats` is JSON-shape-compatible with the reference so
an HTTP layer (or anything scraping it) sees the same keys.
"""

from __future__ import annotations

import datetime as _dt
import json
import threading

from pyspark.sql.streaming import StreamingQueryListener

__all__ = ["StatsListener"]


def _utcnow() -> str:
    return _dt.datetime.now(_dt.timezone.utc).isoformat()


class StatsListener(StreamingQueryListener):
    """Accumulates reference-shaped stats per streaming query."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._stats: dict[str, dict] = {}

    # -- listener hooks ----------------------------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._stats[str(event.id)] = {
                "source": {
                    "total_events": 0,
                    "total_bytes": 0,
                    "last_event_at": None,
                    "last_connect_at": _utcnow(),
                    "connection_healthy": True,
                    "connection_retries": 0,
                    "event_error_count": 0,
                },
                "target": {
                    "total_events": 0,
                    "connection_healthy": True,
                    "connection_retries": 0,
                    "event_error_count": 0,
                    "last_write_at": None,
                    "write_error_count": 0,
                },
                "replicator": {
                    "started_at": _utcnow(),
                    "uptime_seconds": 0,
                    "state": "streaming",
                    "checkpoint_count": 0,
                    "last_checkpoint_at": None,
                    "signals_received": 0,
                    "name": event.name,
                },
            }

    def onQueryProgress(self, event) -> None:
        p = event.progress
        with self._lock:
            s = self._stats.get(str(p.id))
            if s is None:
                return
            rows = p.numInputRows or 0
            now = _utcnow()
            if rows:
                s["source"]["total_events"] += rows
                s["source"]["last_event_at"] = now
                s["target"]["total_events"] += rows
                s["target"]["last_write_at"] = now
            # every committed micro-batch advances the offset/commit WAL — the
            # analogue of one reference checkpoint (`replicator.go:346-373`)
            s["replicator"]["checkpoint_count"] += 1
            s["replicator"]["last_checkpoint_at"] = now
            started = _dt.datetime.fromisoformat(s["replicator"]["started_at"])
            s["replicator"]["uptime_seconds"] = int(
                (_dt.datetime.now(_dt.timezone.utc) - started).total_seconds()
            )

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            s = self._stats.get(str(event.id))
            if s is None:
                return
            s["replicator"]["state"] = "error" if event.exception else "stopped"
            if event.exception:
                s["source"]["last_error"] = str(event.exception)
                s["source"]["connection_healthy"] = False

    def onQueryIdle(self, event) -> None:
        # empty-poll tick (reference: ErrNoEventsFound sleep, replicator.go:256-259)
        pass

    # -- accessors (the HTTP surface of server.go, minus the server) --------
    def stats(self, query_id: str) -> dict | None:
        with self._lock:
            s = self._stats.get(str(query_id))
            return json.loads(json.dumps(s)) if s else None

    def all_stats(self) -> dict[str, dict]:
        with self._lock:
            return json.loads(json.dumps(self._stats))
