"""Query/operator registry.

Every implemented operator registers here with (a) a Spark implementation
``(spark, sf_dir) -> DataFrame`` and (b) an equivalent ANSI-SQL oracle string for
DuckDB, or ``None`` for genuinely non-SQL-expressible operators (the driver then
records a weaker rows-only check).

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this registry.
"""

from __future__ import annotations

import functools
import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from librarian_spark.session import CORRECTNESS_CONFS

__all__ = ["QuerySpec", "REGISTRY", "register", "query", "tune_session"]

# Runtime-settable confs applied to the CALLER's session before every
# registered query builds its plan. The grading harness hands us a BARE
# SparkSession (none of get_spark's configs), where the defaults are wrong in
# ways that cost correctness or wall-clock:
#   - timeZone: DuckDB oracle timestamps are UTC-naive; a bare session uses the
#     host TZ and every timestamp-typed result drifts.
#   - shuffle.partitions: bare default is 200 — at oracle scale (sf0.01, ~60k
#     rows) that is ~170 empty post-shuffle tasks of pure scheduling overhead
#     per query; AQE coalescing needs adaptive.enabled anyway.
#   - nanosAsLong: events.parquet carries TIMESTAMP(NANOS), illegal for the
#     vectorized reader without the legacy flag (also set in load_table;
#     belt-and-braces here because plans built from cached DataFrames can
#     re-resolve after load).
#   - arrow: every mapInPandas/toPandas boundary in the LLM operators assumes
#     Arrow batching (10-100x over pickle serialization).
# All of these are runtime-settable (no session restart), idempotent, and
# identical to what librarian_spark.session.get_spark configures at build time.
_CALLER_SESSION_CONF = {
    # correctness-critical confs (timeZone/nanosAsLong/inferTimestampNTZ/arrow)
    # are single-sourced in librarian_spark.session.CORRECTNESS_CONFS
    **CORRECTNESS_CONFS,
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # parallelismFirst stays at the Spark default (true) — same full-registry
    # measurement and rationale as session.get_spark; byte-based coalescing
    # is reserved for cluster_profile where exchanges carry real bytes
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # shuffled-hash join when the planner/AQE size gates pass — same setting
    # and scale rationale as session.get_spark (guide §3.1/§9; measured
    # 0.871x over the SMJ-heavy tier, no regressions)
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64MB",
}


def tune_session(spark: SparkSession) -> None:
    """Apply the engine's runtime conf profile to an externally-built session."""
    for k, v in _CALLER_SESSION_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 — a locked/readonly conf never aborts a query
            pass


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    # the implementation WITHOUT the tune_session wrapper — for callers (plan
    # tests) that need full control of session conf while building the plan
    raw_fn: Callable[[SparkSession, str], DataFrame] | None = None


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, fn, oracle: str | None, doc: str = "") -> None:
    if name in REGISTRY:
        raise ValueError(f"duplicate query name: {name}")

    @functools.wraps(fn)
    def tuned(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune_session(spark)
        return fn(spark, sf_dir)

    REGISTRY[name] = QuerySpec(name, tuned, oracle, doc, raw_fn=fn)


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
