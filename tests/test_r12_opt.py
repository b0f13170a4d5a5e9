"""Round-12 optimization contracts: bench runtime echo + scratch-root guard."""

from __future__ import annotations

import os
import warnings

import pytest

from librarian_spark import scratch


@pytest.fixture()
def _reset_scratch_root():
    """scratch_root() memoizes; each case below needs a fresh resolution,
    and the suite must get the original value back afterwards."""
    orig = scratch._ROOT
    scratch._ROOT = None
    yield
    scratch._ROOT = orig


def test_scratch_env_wins_without_warning(monkeypatch, _reset_scratch_root, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH_DIR", str(tmp_path))
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning fails the test
        assert scratch.scratch_root() == str(tmp_path)


def test_scratch_ram_default_warns(monkeypatch, _reset_scratch_root):
    monkeypatch.delenv("SPARK_GRAFT_SCRATCH_DIR", raising=False)
    if not (os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK)):
        pytest.skip("no writable /dev/shm on this box")
    with pytest.warns(RuntimeWarning, match="streaming"):
        assert scratch.scratch_root() == "/dev/shm"


def test_bench_runtime_echo_matches_env(spark):
    """The bench's printed JSON must carry the EFFECTIVE master/parallelism so
    the driver can verify the local[$SPARK_GRAFT_CPUS] contract from the wire
    (round-11 `suspect_cpus_ignored`). The test session is built by the same
    get_spark the bench uses, so its master string is the env-honoring path."""
    import bench

    info = bench.runtime_info(spark)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    assert info["master"] == f"local[{cpus}]"
    assert info["cpus_effective"] == int(cpus)
    assert info["scratch_root"] == scratch.scratch_root()
