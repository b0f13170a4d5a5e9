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

__all__ = [
    "run_oracle",
    "canonical_rows",
    "compare",
    "assert_query_matches",
    "oracle_types",
    "dtype_mismatches",
]


def _connect_views(sf_dir: str):
    """A DuckDB connection with every testdata table registered as a view —
    the one registration path shared by the value gate (run_oracle) and the
    dtype gate (oracle_types), so they can never bind different views."""
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):  # Spark-written dir layout (scaled replicas)
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{path}/*.parquet')"
            )
        elif os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def run_oracle(sql: str, sf_dir: str):
    """Run oracle SQL in DuckDB with the testdata tables registered as views."""
    con = _connect_views(sf_dir)
    try:
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def oracle_types(sql: str, sf_dir: str) -> dict[str, str]:
    """Bind (not execute) the oracle SQL in DuckDB; return {col: duck_type}.

    Uses the lazy relation API so pipelines/aggregations aren't run — only
    the binder resolves output types.
    """
    con = _connect_views(sf_dir)
    try:
        rel = con.sql(sql)
        return {c.lower(): str(t).upper() for c, t in zip(rel.columns, rel.types)}
    finally:
        con.close()


def _duck_to_spark_dtype(duck: str) -> str:
    """Map a DuckDB type name to the Spark dtype string it hash-matches.

    HUGEINT maps to a sentinel no Spark dtype equals: DuckDB widens SUM()
    and SUM() OVER to int128, which the driver's dtype-sensitive hash never
    matches — oracles must CAST those columns explicitly.
    """
    duck = duck.strip().upper()
    if duck.endswith("[]"):
        return f"array<{_duck_to_spark_dtype(duck[:-2])}>"
    if duck.startswith("DECIMAL"):
        return duck.lower().replace(" ", "")
    base = {
        "BIGINT": "bigint",
        "INTEGER": "int",
        "SMALLINT": "smallint",
        "TINYINT": "tinyint",
        "UBIGINT": "!hugeint-or-unsigned",
        "UINTEGER": "bigint",
        "HUGEINT": "!hugeint-or-unsigned",
        "DOUBLE": "double",
        "FLOAT": "float",
        "VARCHAR": "string",
        "BOOLEAN": "boolean",
        "DATE": "date",
        "BLOB": "binary",
        "TIMESTAMP": "timestamp",
        "TIMESTAMP WITH TIME ZONE": "timestamp",
        "TIMESTAMP_NS": "timestamp",
    }
    return base.get(duck, f"?{duck}")


def dtype_mismatches(spark_dtypes: dict[str, str], duck_types: dict[str, str]):
    """Compare Spark df.dtypes against DuckDB binder types; return problems.

    Spark's bigint/int distinction both hash as integers driver-side only
    when the *width class* matches, so int-vs-bigint is tolerated in neither
    direction EXCEPT the documented-safe pair (Spark int vs DuckDB INTEGER
    is exact).  Timestamps compare by family (ltz/ntz both serialize to the
    same canonical instant in the driver's comparison).
    """
    problems = []
    sd = {k.lower(): v for k, v in spark_dtypes.items()}
    for col, duck in duck_types.items():
        if col not in sd:
            problems.append(f"{col}: only in oracle")
            continue
        want = _duck_to_spark_dtype(duck)
        got = sd[col]
        if want.startswith("!") or "!" in want:
            problems.append(f"{col}: oracle type {duck} has no Spark match")
            continue
        g, w = got, want
        if g.startswith("timestamp") and w.startswith("timestamp"):
            continue
        if g != w:
            problems.append(f"{col}: spark={got} oracle={duck}(→{want})")
    for col in sd:
        if col not in duck_types:
            problems.append(f"{col}: only in spark")
    return problems


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
