"""Replicator lifecycle FSM — the reference's state machine, verbatim.

Reference (`/root/reference/pkg/replicator/fsm.go:14-26` states,
`:55-88` transition table): created → connecting → streaming ⇄ paused,
streaming → reconnecting → streaming, failures land in error, everything
can stop, stopped can restart via connecting. Invalid transitions are
rejected loudly (`fsm.go:107-121` returns ErrInvalidTransition).

One addition over the reference table: ``error → reconnecting``. The
reference only reaches ``reconnecting`` from ``streaming`` because its
source clients detect the drop inline and retry while the loop is still
alive; on Spark the failure surfaces AFTER the query has terminated (the
exception is observed on a dead StreamingQuery), so the automatic
restart-with-backoff necessarily starts from ``error``. The reference's
own retry edge from ``error`` is ``error → connecting`` — this edge is
the same retry, labeled with the state the HTTP API should report while
backoff is in progress.
"""

from __future__ import annotations

import threading

__all__ = ["ReplicatorFSM", "InvalidTransitionError"]


class InvalidTransitionError(RuntimeError):
    """Raised on a transition the table forbids (ErrInvalidTransition)."""


#: state → allowed next states (`fsm.go:55-88`)
TRANSITIONS: dict[str, set[str]] = {
    "created": {"connecting", "stopped"},
    "connecting": {"streaming", "error", "stopped"},
    "streaming": {"paused", "stopped", "reconnecting", "error"},
    "paused": {"streaming", "stopped", "error"},
    "reconnecting": {"streaming", "error", "stopped"},
    "error": {"connecting", "reconnecting", "stopped"},
    "stopped": {"connecting"},
}


class ReplicatorFSM:
    """Thread-safe state holder with the reference's transition table and a
    transition trail (so tests and operators can audit the observed
    lifecycle, e.g. error → reconnecting → streaming after a source drop)."""

    def __init__(self, initial: str = "created") -> None:
        import collections

        if initial not in TRANSITIONS:
            raise ValueError(f"unknown state: {initial!r}")
        self._lock = threading.Lock()
        self._current = initial
        # bounded: a flapping source transitions forever, and info() ships
        # the trail in every HTTP response — keep the recent tail only
        self.history: collections.deque[str] = collections.deque(
            [initial], maxlen=256
        )

    @property
    def current(self) -> str:
        with self._lock:
            return self._current

    def can(self, to: str) -> bool:
        with self._lock:
            return to in TRANSITIONS[self._current]

    def transition(self, to: str) -> None:
        with self._lock:
            if to not in TRANSITIONS:
                raise ValueError(f"unknown state: {to!r}")
            if to not in TRANSITIONS[self._current]:
                raise InvalidTransitionError(
                    f"invalid state transition: {self._current} -> {to}"
                )
            self._current = to
            self.history.append(to)

    def force(self, to: str) -> None:
        """Reconciliation escape hatch for states OBSERVED from the runtime
        rather than commanded (a query found dead while the FSM still says
        streaming) when the table edge doesn't exist; records the jump."""
        with self._lock:
            if to not in TRANSITIONS:
                raise ValueError(f"unknown state: {to!r}")
            if self._current != to:
                self._current = to
                self.history.append(to)
