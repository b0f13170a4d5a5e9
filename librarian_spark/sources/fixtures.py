"""Synthetic fixture generator ("fixtures generate").

Reference (`/root/reference/internal/cmd/fixtures/gen.go:34-99`): bulk-inserts N
synthetic ``property_sales`` rows into Postgres via CopyFrom in batches of 1000,
single-threaded, with ``math/rand`` values.

Spark-first re-expression: ``spark.range(n)`` + column expressions — the
generator is itself a distributed DataFrame, so fixture synthesis parallelizes
across executors and can feed any sink (parquet dir, JDBC table, streaming
source dir) with no driver-side row loop. At 100 TB-scale testing this is the
difference between hours of single-connection COPY and a normal write job:
``spark.range`` partitions the id space, every derived column is codegen'd, and
the write inherits the session's parallelism.

Randomness is deterministic-by-id (xxhash64-derived), not ``rand()``: fixture
content is a pure function of (seed, id), so regenerating at any partitioning
or parallelism yields byte-identical tables — reference fixtures differ per run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["property_sales", "consumer_complaints", "generate"]


def _unit(seed_col, salt: int):
    """Deterministic uniform [0,1) double from an id column and literal salt."""
    h = F.abs(F.xxhash64(seed_col, F.lit(salt)))
    return (h % F.lit(1_000_000_007)).cast("double") / F.lit(1_000_000_007.0)


def property_sales(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """N synthetic property-sales rows (reference row shape,
    `internal/cmd/fixtures/gen.go:36-51`: serial_number 1-based, list_year in
    [0, 2023), date_recorded = generation date, '<i> Town'-style strings,
    money values < 1e6, ratio < 100)."""
    base = spark.range(n).select((F.col("id") + 1).alias("i"))
    money = lambda salt: F.round(_unit(F.col("i"), seed + salt) * 1_000_000, 2)
    return base.select(
        F.col("i").cast("long").alias("serial_number"),
        (F.abs(F.xxhash64("i", F.lit(seed))) % 2023).cast("int").alias("list_year"),
        F.current_date().alias("date_recorded"),
        F.concat(F.col("i").cast("string"), F.lit(" Town")).alias("town"),
        F.concat(F.col("i").cast("string"), F.lit(" Address")).alias("address"),
        money(1).cast("decimal(12,2)").alias("assessed_value"),
        money(2).cast("decimal(12,2)").alias("sale_amount"),
        F.round(_unit(F.col("i"), seed + 3) * 100, 4)
        .cast("decimal(8,4)")
        .alias("sales_ratio"),
        F.concat((F.col("i") - 1).cast("string"), F.lit(" Type")).alias(
            "property_type"
        ),
        F.concat((F.col("i") - 1).cast("string"), F.lit(" Residential")).alias(
            "residential_type"
        ),
        F.concat((F.col("i") - 1).cast("string"), F.lit(" Code")).alias(
            "non_use_code"
        ),
        F.concat((F.col("i") - 1).cast("string"), F.lit(" Assessor Remarks")).alias(
            "assessor_remarks"
        ),
        F.concat((F.col("i") - 1).cast("string"), F.lit(" OPM Remarks")).alias(
            "opm_remarks"
        ),
        F.concat(F.col("i").cast("string"), F.lit(" Location")).alias("location"),
    )


def consumer_complaints(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """N synthetic consumer-complaint rows (the reference's other fixture table,
    `dev/examples/consumer-complaints.snapshot.yml` — 18-column date+text shape,
    abbreviated to the queried columns)."""
    base = spark.range(n).select((F.col("id") + 1).alias("i"))
    products = F.array(
        F.lit("Mortgage"), F.lit("Credit card"), F.lit("Student loan"),
        F.lit("Checking account"), F.lit("Auto loan"),
    )
    idx = (F.abs(F.xxhash64("i", F.lit(seed))) % 5 + 1).cast("int")
    return base.select(
        F.col("i").cast("long").alias("complaint_id"),
        F.date_sub(F.current_date(), (F.abs(F.xxhash64("i", F.lit(seed + 1))) % 3650).cast("int")).alias("date_received"),
        F.element_at(products, idx).alias("product"),
        F.concat(F.lit("Issue "), ((F.abs(F.xxhash64("i", F.lit(seed + 2))) % 100) + 1).cast("string")).alias("issue"),
        F.concat(F.lit("Company "), ((F.abs(F.xxhash64("i", F.lit(seed + 3))) % 500) + 1).cast("string")).alias("company"),
        F.element_at(
            F.array(F.lit("CA"), F.lit("NY"), F.lit("TX"), F.lit("FL"), F.lit("WA")),
            (F.abs(F.xxhash64("i", F.lit(seed + 4))) % 5 + 1).cast("int"),
        ).alias("state"),
        (_unit(F.col("i"), seed + 5) > 0.5).alias("timely_response"),
    )


_TABLES = {
    "property_sales": property_sales,
    "consumer_complaints": consumer_complaints,
}


def generate(
    spark: SparkSession,
    table: str,
    records: int,
    out_path: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """CLI-shaped entry (`fixtures generate -r N -t table`): build the fixture
    DataFrame and optionally write it as parquet."""
    if table not in _TABLES:
        raise ValueError(
            f"unsupported table: {table} (supported: {sorted(_TABLES)})"
        )
    df = _TABLES[table](spark, records, seed)
    if out_path:
        df.write.mode("overwrite").parquet(out_path)
    return df
