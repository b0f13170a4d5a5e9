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

    pg_provisioned = False
    for item in items:
        marker = item.get_closest_marker("live")
        if marker is None:
            continue
        service = marker.kwargs.get("service") or (marker.args[0] if marker.args else None)
        if service == "pg" and live_dsn("pg") is None and not pg_provisioned:
            # the sandbox ships postgres 15 binaries: provision a throwaway
            # logical-replication cluster so the live tests actually RUN
            # (tests/live_pg.py; degrades back to skip on any failure)
            from tests import live_pg

            live_pg.ensure_running()
            pg_provisioned = True
        if service and live_dsn(service) is None:
            item.add_marker(
                pytest.mark.skip(
                    reason=f"no live {service}: set LIBRARIAN_LIVE_"
                    f"{service.upper()}_DSN=host:port to run"
                )
            )
