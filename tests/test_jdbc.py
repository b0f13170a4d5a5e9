"""Live JDBC round-trip — the §2A #1 contract against a REAL database.

The reference's snapshot test drives its SQL source against a live Postgres
(`internal/cmd/archiver/snapshot_test.go:138-140`); the sandbox has no
network, so the in-process equivalent is the DuckDB JDBC driver (public
Maven artifact ``org.duckdb:duckdb_jdbc``) loaded into the running session
with ``ADD JAR``. This proves the whole path — DriverRegistry resolution,
query pushdown, partitioned parallel reads, and the snapshot pipeline's
JDBC branch — executes against an actual JDBC endpoint, not just a mock.

Skips cleanly when no duckdb_jdbc jar exists in the local artifact caches.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from librarian_spark.sources.batch import read_jdbc_query

_JAR_GLOBS = [
    "~/.cache/coursier/**/duckdb_jdbc*.jar",
    "~/.ivy2/**/duckdb_jdbc*.jar",
    "~/.m2/**/duckdb_jdbc*.jar",
]


def _find_duckdb_jar() -> str | None:
    for pat in _JAR_GLOBS:
        hits = glob.glob(os.path.expanduser(pat), recursive=True)
        if hits:
            return sorted(hits)[-1]
    return None


_JAR = _find_duckdb_jar()
_PROPS = {"driver": "org.duckdb.DuckDBDriver"}

pytestmark = pytest.mark.skipif(
    _JAR is None, reason="no duckdb_jdbc jar in local artifact caches"
)


@pytest.fixture(scope="module")
def jdbc_db(spark, tmp_path_factory):
    """A real DuckDB database file + the driver jar loaded in the session."""
    db = str(tmp_path_factory.mktemp("jdbc") / "src.duckdb")
    con = duckdb.connect(db)
    con.execute(
        """
        CREATE TABLE accounts AS
        SELECT CAST(range AS INTEGER) AS id,
               'user_' || range AS name,
               CAST(range % 7 AS DOUBLE) * 1.5 AS balance,
               DATE '2024-01-01' + INTERVAL (range % 30) DAY AS opened
        FROM range(500)
        """
    )
    con.close()
    spark.sql(f"ADD JAR {_JAR}")
    return db


def test_jdbc_query_round_trip(spark, jdbc_db):
    """Verbatim-query semantics (`internal/sql/source.go:57-60`): the query
    executes on the source DB; row values round-trip exactly."""
    df = read_jdbc_query(
        spark,
        f"jdbc:duckdb:{jdbc_db}",
        "SELECT id, name, balance FROM accounts WHERE id < 100",
        properties=_PROPS,
    )
    got = sorted((int(r.id), r.name, float(r.balance)) for r in df.collect())
    con = duckdb.connect(jdbc_db)
    want = sorted(
        (int(i), n, float(b))
        for i, n, b in con.execute(
            "SELECT id, name, balance FROM accounts WHERE id < 100"
        ).fetchall()
    )
    con.close()
    assert got == want
    assert len(got) == 100


def test_jdbc_partitioned_parallel_read(spark, jdbc_db):
    """The scale upgrade over the reference's single cursor: the read splits
    into N bounded strides, one connection each, with no row lost or
    duplicated at stride boundaries."""
    df = read_jdbc_query(
        spark,
        f"jdbc:duckdb:{jdbc_db}",
        "SELECT id, name FROM accounts",
        properties=_PROPS,
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=500,
    )
    assert df.rdd.getNumPartitions() == 4
    ids = sorted(int(r.id) for r in df.collect())
    assert ids == list(range(500))


def test_jdbc_snapshot_pipeline(spark, jdbc_db, tmp_path):
    """End-to-end librarian snapshot from a JDBC source (the reference's
    snapshot_test.go shape): config → JDBC read → parquet + catalog, with
    source-count parity asserted by the catalog's own success rule."""
    from librarian_spark.config import load_config_str
    from librarian_spark.snapshot import run_snapshot_config

    out = str(tmp_path / "snap")
    cfg = f"""
archiver:
  name: jdbc-snap
  source:
    format: jdbc
    connection_string: "jdbc:duckdb:{jdbc_db}"
    query: "SELECT id, name, balance FROM accounts"
    properties:
      driver: org.duckdb.DuckDBDriver
  repository:
    type: local
    local:
      path: {out}
  preserver:
    batch_size_num_records: 200
"""
    rec = run_snapshot_config(spark, load_config_str(cfg))
    assert rec.success
    assert rec.num_source_records == 500
    back = spark.read.parquet(out)
    assert back.count() == 500
    # batch_size_num_records=200 → ≥3 part files (the Preserver contract)
    parts = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(parts) >= 3, parts
