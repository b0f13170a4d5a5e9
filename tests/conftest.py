"""Shared test fixtures: one SparkSession per test run, testdata dirs."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from librarian_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="librarian-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", SF_SMOKE)


@pytest.fixture(scope="session")
def oracle_sf_dir():
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", SF_SMOKE)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "live: dials a REAL external service (postgres/mongod/kafka broker) "
        "via LIBRARIAN_LIVE_{PG,MONGO,KAFKA}_DSN; skipped unless the matching "
        "env var is set",
    )


def pytest_collection_modifyitems(config, items):
    from librarian_spark.sources.dial import live_dsn

    for item in items:
        marker = item.get_closest_marker("live")
        if marker is None:
            continue
        service = marker.kwargs.get("service") or (marker.args[0] if marker.args else None)
        if service == "pg":
            # pg tests self-provision AT RUN TIME (the live_pg_server
            # fixture): provisioning here would initdb+start a server at
            # COLLECTION time, before -m deselection — `pytest -m "not
            # live"` would boot a cluster no test uses
            continue
        if service and live_dsn(service) is None:
            item.add_marker(
                pytest.mark.skip(
                    reason=f"no live {service}: set LIBRARIAN_LIVE_"
                    f"{service.upper()}_DSN=host:port to run"
                )
            )


@pytest.fixture()
def live_pg_server():
    """Run-time provisioning for the live pg tests: start (or reuse) the
    throwaway logical-replication cluster, or skip — the sandbox ships
    postgres 15 binaries, so in practice these tests RUN in the plain
    suite (tests/live_pg.py; degrades to skip when binaries are missing
    or provisioning fails)."""
    from tests import live_pg

    dsn = live_pg.ensure_running()
    if dsn is None:
        pytest.skip("no live pg: binaries missing or provisioning failed")
    return dsn
