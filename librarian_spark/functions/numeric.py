"""Cross-engine-deterministic numeric aggregation helpers.

Summing IEEE doubles is order-dependent, and Spark's partial (map-side)
aggregation sums in partition order — so ``SUM(double)`` is not reproducible
against any other engine (or even across runs). Every oracle-checked aggregate
therefore goes through fixed-point arithmetic:

  1. scale each double to an integer: ``round(x · 10^s) as long`` — a
     deterministic function of the input double, identical in Spark and DuckDB
     (both round ties away from zero, and the cast of the integral double is
     exact),
  2. sum exactly as int64 (associative — order no longer matters, and the
     aggregate stays on the codegen long-sum fast path),
  3. one IEEE divide by ``10^s`` at the end (deterministic on identical
     operands).

MEASURED: the previous ``DECIMAL(25,s)`` formulation has identical semantics
but its sum buffer (precision 35) falls off Spark's long-backed decimal fast
path onto per-row BigDecimal allocation — 2.2× slower at sf0.1 and the GC
churn made it the single noisiest query in the bench.

Capacity: the int64 sum bounds ``Σ|x| < 9.2e18 / 10^s`` per aggregate group —
at scale 4 that is ~9.2e14 in column units (e.g. ~10^9 rows of 10^6-sized
money values). ANSI mode fails loudly on overflow rather than wrapping. For
totals beyond that, use ``dec``/``o_dec`` (DECIMAL(25,s), exact to 10^21) and
accept the BigDecimal cost — correctness first, then speed.

Spark-side helpers return ``Column``; ``o_*`` helpers emit the equivalent ANSI
SQL for the DuckDB oracle. Spark and oracle expressions must mirror each other
operation-for-operation (division order included) so both engines perform the
same IEEE steps.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "dec",
    "slong",
    "dsum",
    "davg",
    "o_dec",
    "o_slong",
    "o_dsum",
    "o_davg",
    "hash_bucket",
    "o_hash_bucket",
]

_PRECISION = 25  # wide-decimal fallback for beyond-int64 totals


def dec(col: Column | str, scale: int = 4) -> Column:
    """Wide-decimal cast (exact but BigDecimal-backed — see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({_PRECISION},{scale})")


def slong(col: Column | str, scale: int = 4) -> Column:
    """Fixed-point value: ``round(x · 10^s)`` as long (codegen fast path)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(float(10**scale))).cast("long")


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM over doubles, returned as double."""
    return F.sum(slong(col, scale)).cast("double") / F.lit(float(10**scale))


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent AVG: exact fixed-point sum (as double) / count."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def o_dec(expr: str, scale: int = 4) -> str:
    return f"CAST({expr} AS DECIMAL({_PRECISION},{scale}))"


def o_slong(expr: str, scale: int = 4) -> str:
    return f"CAST(ROUND(({expr}) * {float(10 ** scale)}) AS BIGINT)"


def o_dsum(expr: str, scale: int = 4) -> str:
    return f"(CAST(SUM({o_slong(expr, scale)}) AS DOUBLE) / {float(10 ** scale)})"


def o_davg(expr: str, scale: int = 4) -> str:
    return f"({o_dsum(expr, scale)} / COUNT({expr}))"


def hash_bucket(col: Column | str, n: int = 100) -> Column:
    """Deterministic bucket in [0, n) from a stable key: first 4 hex chars of
    md5(key-as-string) mod n. The cross-engine-reproducible sampling idiom
    every sampler/splitter shares (same rows selected on every run, engine,
    partitioning, and re-ingestion); ``o_hash_bucket`` is its DuckDB twin —
    change them TOGETHER or every hash-based sample silently reshuffles."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string").cast("binary")), 1, 4), 16, 10)
        .cast("long")
        % n
    )


def o_hash_bucket(col_sql: str, n: int = 100) -> str:
    """DuckDB twin of :func:`hash_bucket`."""
    return (
        f"CAST(('0x' || SUBSTRING(MD5(CAST({col_sql} AS VARCHAR)), 1, 4))::UBIGINT"
        f" AS BIGINT) % {n}"
    )
