"""SparkSession factory for the engine.

The reference (turbolytics/librarian) is a single-threaded Go process
(`internal/archiver/archiver.go:90-107`); our execution substrate is Spark, so the
session is where scale policy lives: AQE for runtime re-planning (join strategy
switches, skew-join splitting, partition coalescing), UTC session timezone so results
are comparable against a DuckDB oracle, and Arrow for any Python-side exchange.

At cluster scale the same builder is used — only ``master`` and the memory/shuffle
knobs change; every operator in this package is expressed declaratively so Catalyst
picks physical strategy per-cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_SHUFFLE_PARTITIONS"]

# local[32] on the test box; on a 1000-executor cluster this should be
# ~2-3x total cores — overridable via config/env.
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "librarian-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults are tuned for correctness-vs-oracle and for scale-out behavior:

    - ``spark.sql.session.timeZone=UTC``: DuckDB timestamps are UTC-naive; without
      this, timestamp-typed results drift by the host TZ.
    - AQE on (+ coalesce + skew join): at 100 TB the static plan is always wrong
      somewhere — AQE re-plans joins post-shuffle-statistics and splits skewed
      partitions.
    - ``spark.sql.files.maxPartitionBytes=128m`` keeps scan partitions
      executor-memory-sized regardless of input file layout.
    - Arrow enabled: any pandas_udf / toPandas path is Arrow-batched.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        # parquet INT64 TIMESTAMP(NANOS) is otherwise an illegal type for Spark;
        # read as long and normalize to µs timestamps in the source adapter.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # parquet timestamps without isAdjustedToUTC otherwise surface as
        # TIMESTAMP_NTZ, which cannot cast to numeric; read them as UTC instants
        # (session TZ is UTC, so wall-clock values are unchanged).
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
