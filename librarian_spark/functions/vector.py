"""Vector (embedding) column functions.

Embeddings are plain ``array<float>`` columns; all math here is expressed with
higher-order functions (``zip_with`` + ``aggregate``) so it runs JVM-side — a
sequential left-fold, which makes the float summation order deterministic and
identical to the DuckDB oracle's list functions.

For very hot paths a Pandas-UDF (numpy dot over Arrow batches) can beat the
fold expression; benchmarked in bench.py before switching — the expression form
wins for d≤~256 because it avoids Python round-trips entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["as_double", "dot", "norm", "cosine"]


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic double summation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double-array columns (sequential fold)."""
    return dot(a, b) / (norm(a) * norm(b))


def unit_vectors(df, vec_col: str = "embedding", out: str = "u"):
    """Add a unit-normalized double-array column.

    Two chained projections so the norm is materialized once per row and then
    referenced by the per-element division — cosine over pre-normalized vectors
    is a single dot fold per pair instead of three (norms computed O(N) once,
    not O(N²) per pair). The pairwise operators all start from this.
    """
    with_norm = df.withColumn("_nrm", norm(as_double(vec_col)))
    return with_norm.withColumn(
        out, F.transform(as_double(vec_col), lambda x: x / F.col("_nrm"))
    ).drop("_nrm")
