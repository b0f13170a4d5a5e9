"""Query/operator registry.

Every implemented operator registers here with (a) a Spark implementation
``(spark, sf_dir) -> DataFrame`` and (b) an equivalent ANSI-SQL oracle string for
DuckDB, or ``None`` for genuinely non-SQL-expressible operators (the driver then
records a weaker rows-only check).

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = ["QuerySpec", "REGISTRY", "register", "query"]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, fn, oracle: str | None, doc: str = "") -> None:
    if name in REGISTRY:
        raise ValueError(f"duplicate query name: {name}")
    REGISTRY[name] = QuerySpec(name, fn, oracle, doc)


def query(name: str, oracle: str | None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query implementation."""

    def deco(fn):
        register(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so registrations run; return the registry."""
    from librarian_spark.operators import (  # noqa: F401
        cdc,
        dedup,
        multimodal,
        pipeline,
        relational,
        similarity,
        text,
    )

    return REGISTRY
