"""Cross-engine-deterministic numeric aggregation helpers.

Summing IEEE doubles is order-dependent, and Spark's partial (map-side) aggregation
sums in partition order — so ``SUM(double)`` is not reproducible against any other
engine (or even across runs). Every oracle-checked aggregate therefore goes through
fixed-point arithmetic:

  1. cast each double to ``DECIMAL(25, s)`` (round-to-nearest at scale s — a
     deterministic function of the input double, identical in Spark and DuckDB),
  2. sum exactly in decimal (associative — order no longer matters),
  3. cast the exact decimal result back to double (deterministic nearest-double).

Averages divide the exact decimal sum (as double) by the count — one IEEE division
on identical operands, hence identical results.

This costs one decimal-sum per aggregate (still JVM-side whole-stage codegen) and is
the standard technique for money-typed analytics at any scale; at 100 TB it also
protects against partial-aggregation reordering across AQE re-plans.

Spark-side helpers return ``Column``; ``o_*`` helpers emit the equivalent ANSI SQL
for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dec", "dsum", "davg", "o_dec", "o_dsum", "o_davg"]

_PRECISION = 25


def dec(col: Column | str, scale: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({_PRECISION},{scale})")


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM over doubles, returned as double."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum (as double) / count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).cast("double") / F.count(c)


def o_dec(expr: str, scale: int = 4) -> str:
    return f"CAST({expr} AS DECIMAL({_PRECISION},{scale}))"


def o_dsum(expr: str, scale: int = 4) -> str:
    return f"CAST(SUM({o_dec(expr, scale)}) AS DOUBLE)"


def o_davg(expr: str, scale: int = 4) -> str:
    return f"(CAST(SUM({o_dec(expr, scale)}) AS DOUBLE) / COUNT({expr}))"
