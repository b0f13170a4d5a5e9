"""DuckDB-oracle comparison harness, mimicking the driver's t2 gate.

The driver runs each ``queries()[name]`` in Spark and the matching
``oracle_sql()[name]`` in DuckDB over the same parquet tables, then compares
row-count + schema + order-insensitive value-hash (columns sorted by name).
This module reproduces that comparison strictly (exact value equality after
canonicalization) so mismatches surface locally before the driver sees them.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os

import duckdb

from librarian_spark.sources.batch import TABLES

__all__ = ["run_oracle", "canonical_rows", "compare", "assert_query_matches"]


def run_oracle(sql: str, sf_dir: str):
    """Run oracle SQL in DuckDB with the testdata tables registered as views."""
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _canon_value(v):
    """Canonicalize one value for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        # compare decimals by exact numeric value, not trailing-zero form
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return ("ts", v.isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare(spark_cols, spark_rows, ora_cols, ora_rows) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in ora_cols):
        problems.append(
            f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(ora_cols)}"
        )
        return problems
    if len(spark_rows) != len(ora_rows):
        problems.append(f"row count: spark={len(spark_rows)} oracle={len(ora_rows)}")
    a = canonical_rows([c.lower() for c in spark_cols], spark_rows)
    b = canonical_rows([c.lower() for c in ora_cols], ora_rows)
    if a != b:
        diffs = 0
        for i, (ra, rb) in enumerate(zip(a, b)):
            if ra != rb:
                problems.append(f"row {i}: spark={ra!r} oracle={rb!r}")
                diffs += 1
                if diffs >= 5:
                    problems.append("... (more diffs truncated)")
                    break
        if not problems:
            problems.append("value mismatch in tail rows")
    return problems


def assert_query_matches(spark, fn, sql: str, sf_dir: str, name: str = "?"):
    sdf = fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    ora_cols, ora_rows = run_oracle(sql, sf_dir)
    problems = compare(spark_cols, spark_rows, ora_cols, ora_rows)
    assert not problems, f"[{name}] oracle mismatch:\n" + "\n".join(problems[:10])
