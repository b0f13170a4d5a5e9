"""Batch sources.

Reference parity: the reference's only batch source is a JDBC/SQL snapshot — it opens
a transaction and streams the rows of one user-supplied query
(`/root/reference/internal/sql/source.go:57-135`), defaulting to
``SELECT * FROM schema.table`` (`internal/sql/source.go:163-177`).

Spark-first mapping: ``spark.read.format("jdbc")`` pushes the whole query to the
database exactly like the reference; parquet/csv/json readers are additional native
sources the reference lacks. ``load_tables`` registers the driver testdata star schema
as temp views so the full SQL surface (SURVEY §2B) runs natively.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

__all__ = ["TABLES", "load_table", "load_tables", "register_views", "read_jdbc_query"]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (columnar parquet scan; Catalyst prunes/pushes).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a
    long which we normalize to a µs timestamp here (integer ``div`` — no precision
    loss from double math on >2^53 nanos). The conf is set defensively on the
    CALLER's session (it is runtime-settable and idempotent): sessions built by
    ``get_spark`` already carry it, but an external harness handing us its own
    bare session would otherwise throw PARQUET_TYPE_ILLEGAL on every
    events-table query.
    """
    from librarian_spark.session import CORRECTNESS_CONFS

    for k, v in CORRECTNESS_CONFS.items():
        try:  # runtime-settable and idempotent; a locked conf never aborts a read
            spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 — the ts-normalizing cast below still fixes NTZ
            pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif f.name == "ts" and isinstance(f.dataType, TimestampNTZType):
            # session TZ is UTC, so NTZ→LTZ here is value-preserving and makes
            # ts castable to numeric epoch seconds downstream
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition before a CPU-heavy map stage.

    The testdata parquet files are single-row-group, so their scans cannot split —
    without this, per-row-expensive operators (minhash folds, vector dots, Pandas
    UDFs) run on one core regardless of cluster size. On a real cluster the same
    pattern applies whenever input file layout under-parallelizes a compute-bound
    stage: the shuffle moves each row once, the compute then scales with cores.
    Scan-bound relational queries should NOT use this (measured: repartition adds
    cost there; parquet decode dominates).
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view for ``spark.sql`` queries."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def read_jdbc_query(
    spark: SparkSession,
    url: str,
    query: str,
    *,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """JDBC snapshot scan — same semantics as the reference's delegated query
    (`internal/sql/source.go:57-60`: the query string executes verbatim on the
    source DB), upgraded with partitioned parallel reads: the reference pulls rows
    on a single cursor; at scale we split the read across executors on a numeric
    partition column.
    """
    reader = spark.read.format("jdbc").option("url", url)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column:
        # Spark rejects `query` + `partitionColumn` together; the partitioned
        # path must wrap the query as a dbtable subselect (each executor then
        # appends its own `WHERE partition_column BETWEEN ...` stride)
        reader = (
            reader.option("dbtable", f"({query}) jdbc_src")
            .option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions or 8)
            .option("lowerBound", lower_bound or 0)
            .option("upperBound", upper_bound or 1 << 31)
        )
    else:
        reader = reader.option("query", query)
    return reader.load()
