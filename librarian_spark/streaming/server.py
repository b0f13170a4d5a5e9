"""Stats/control HTTP server for replicators.

Reference surface (`/root/reference/pkg/replicator/server.go:57-165`):

    GET  /api/v1/replicators            → {"replicators": [...], "count": N}
    GET  /api/v1/replicators/{id}       → {"id", "state", "stats"}
    POST /api/v1/replicators/{id}/pause|resume|restart|stop
                                        → {"status": "<sig> signal sent", "replicator_id": id}

Same routes and JSON shapes here, over :class:`~librarian_spark.streaming.replicate.Replicator`
objects. Signal semantics on Spark (`fsm.go:14-26` parity, documented deltas):

- ``stop``    → ``query.stop()`` (checkpoint retained)
- ``pause``   → TRUE suspend for the custom sources (cdc_jsonl/pgoutput):
  the live query holds its offset via the pause-marker protocol, state and
  checkpoint stay warm (`fsm.go:50-129` parity). Spark-owned sources
  (kafka/files) have no offset-freeze hook, so pause degrades to
  stop-with-checkpoint there.
- ``resume``  → drop the marker (live query continues next trigger), or
  restart from checkpoint after a degraded pause
- ``restart`` → stop + start from checkpoint

Stdlib ``http.server`` on a daemon thread — the control plane is driver-side
and tiny; the data plane is unaffected.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from librarian_spark.streaming.replicate import Replicator

__all__ = ["ReplicatorServer"]

_ROUTE = re.compile(r"^/api/v1/replicators(?:/([^/]+))?(?:/(pause|resume|restart|stop))?$")


class ReplicatorServer:
    """Registry of replicators + HTTP control plane."""

    def __init__(self) -> None:
        self._replicators: dict[str, Replicator] = {}
        self._source_stats: dict[str, object] = {}  # id → callable → dict
        self._lock = threading.RLock()
        self._httpd: ThreadingHTTPServer | None = None

    # -- registry ------------------------------------------------------------
    def add(self, rep: Replicator, source_stats=None) -> None:
        """Register a replicator; ``source_stats`` is an optional callable
        returning extra source-side observability (the live tailer's
        skipped-message counters — e.g. TRUNCATEs that by design produce
        no CDC row) merged into this replicator's stats payload."""
        with self._lock:
            self._replicators[rep.cfg.replicator_id] = rep
            if source_stats is not None:
                self._source_stats[rep.cfg.replicator_id] = source_stats

    def get(self, rep_id: str) -> Replicator | None:
        with self._lock:
            return self._replicators.get(rep_id)

    def info(self, rep: Replicator) -> dict:
        q = rep.query
        progress = None
        if q is not None:
            try:
                progress = q.lastProgress
            except Exception:
                progress = None
        state = rep.state  # one read: reconciles error/stopped exactly once
        info = {
            "id": rep.cfg.replicator_id,
            "state": state,
            "stats": {
                "replicator": {
                    "state": state,
                    "last_error": rep.last_error,
                    "state_history": list(rep.fsm.history),
                },
                "progress": progress,
            },
        }
        src = self._source_stats.get(rep.cfg.replicator_id)
        if src is not None:
            try:
                info["stats"]["source"] = src()
            except Exception as e:  # noqa: BLE001 — stats must never 500
                info["stats"]["source"] = {"error": str(e)}
        return info

    # -- signals (reference: signalHandler, `server.go:81-107`) --------------
    def signal(self, rep: Replicator, sig: str) -> None:
        if sig == "stop":
            rep.stop()
        elif sig == "pause":
            rep.pause()  # true suspend for custom sources; stop-with-checkpoint else
        elif sig == "resume":
            rep.resume()
        elif sig == "restart":
            rep.restart()
        else:
            raise ValueError(f"unknown signal: {sig}")

    # -- http ----------------------------------------------------------------
    def _handler_class(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _json(self, code: int, payload) -> None:
                # default=str: StreamingQueryProgress carries timestamps/Java
                # wrappers that aren't natively JSON-serializable
                body = json.dumps(payload, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                m = _ROUTE.match(self.path)
                if not m or m.group(2):
                    return self._json(404, {"error": "not found"})
                rep_id = m.group(1)
                if rep_id is None:
                    with server._lock:
                        reps = [server.info(r) for r in server._replicators.values()]
                    return self._json(200, {"replicators": reps, "count": len(reps)})
                rep = server.get(rep_id)
                if rep is None:
                    return self._json(404, {"error": "replicator not found"})
                return self._json(200, server.info(rep))

            def do_POST(self):
                m = _ROUTE.match(self.path)
                if not m or not m.group(1) or not m.group(2):
                    return self._json(404, {"error": "not found"})
                rep_id, sig = m.group(1), m.group(2)
                rep = server.get(rep_id)
                if rep is None:
                    return self._json(404, {"error": "replicator not found"})
                try:
                    server.signal(rep, sig)
                except Exception as e:  # noqa: BLE001 — a failed signal must
                    # return the reference's JSON error shape, not a dropped
                    # connection with a raw traceback on stderr
                    return self._json(
                        500, {"error": f"{type(e).__name__}: {e}"}
                    )
                return self._json(
                    200, {"status": f"{sig} signal sent", "replicator_id": rep_id}
                )

        return Handler

    def start(self, host: str = "127.0.0.1", port: int = 8080) -> int:
        """Start serving on a daemon thread; returns the bound port (pass
        port=0 for an ephemeral one)."""
        self._httpd = ThreadingHTTPServer((host, port), self._handler_class())
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
