"""Scratch-root resolution for run-private dirs (streaming checkpoints,
state versions, staged stream inputs, persisted index caches).

Everything under the scratch root is recomputed from the parquet inputs —
it is working storage, not a result cache. Locally the root prefers a
RAM-backed filesystem when one exists: streaming micro-batches pay an
offset-log + commit-log + state-version fsync per batch, and on a
disk-backed /tmp that I/O tax is billed to every batch of every streaming
operator (measured: pipeline_stream_cdc_apply 8.8 s on ext4 /tmp vs 6.7 s
on /dev/shm, same code — guide §6's "file layout" cost, paid in fsyncs).

On a production cluster this root must be DURABLE, shared storage for
anything a restarted driver needs (streaming checkpoints, registry
versions): set ``SPARK_GRAFT_SCRATCH_DIR`` to that location — the env var
wins unconditionally. The RAM-disk default is for the single-box case
where a crash loses the whole run anyway, so durability of the scratch
tier buys nothing.
"""

from __future__ import annotations

import os
import warnings

__all__ = ["scratch_root"]

_ROOT: str | None = None


def scratch_root() -> str:
    """Resolve (once) the root dir for run-private scratch."""
    global _ROOT
    if _ROOT is None:
        env = os.environ.get("SPARK_GRAFT_SCRATCH_DIR")
        if env:
            _ROOT = env.rstrip("/") or "/"
        elif os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
            # Loud one-time guard: this default puts STREAMING CHECKPOINTS
            # (offset/commit logs, state versions) in volatile RAM. Right for
            # a single test box (a reboot loses the run anyway), wrong for any
            # deployment that needs a restarted driver to resume exactly-once
            # state — there, SPARK_GRAFT_SCRATCH_DIR must point at durable
            # shared storage, and it wins unconditionally.
            warnings.warn(
                "SPARK_GRAFT_SCRATCH_DIR is unset; scratch (incl. streaming "
                "checkpoints and state) resolves to RAM-backed /dev/shm and "
                "will NOT survive a reboot. Set SPARK_GRAFT_SCRATCH_DIR to "
                "durable storage for any deployment that must resume "
                "exactly-once streaming state.",
                RuntimeWarning,
                stacklevel=2,
            )
            _ROOT = "/dev/shm"
        else:
            _ROOT = "/tmp"  # noqa: S108 — bounded, uuid-tagged, swept
    return _ROOT
