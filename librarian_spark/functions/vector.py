"""Vector (embedding) column functions.

Embeddings are plain ``array<float>`` columns; all math here is expressed with
higher-order functions (``zip_with`` + ``aggregate``) so it runs JVM-side — a
sequential left-fold, which makes the float summation order deterministic and
identical to the DuckDB oracle's list functions.

MEASURED dead end (do not redo): unrolling the fold into a 64-term
``element_at(a,i)*element_at(b,i)`` addition chain looks codegen-friendly but
is ~8× SLOWER (sim_pairs_threshold 4.6s → 38.5s at sf0.1) — the 64-deep
nested Add tree exceeds codegen thresholds, falls back to interpreted
expression eval, and bloats task binaries to >1.3 MiB. The HOF fold's tight
loop wins despite being interpreted. A numpy Pandas-UDF would beat both on
raw throughput but uses pairwise/SIMD summation whose rounding differs from
the oracle's sequential fold — not hash-safe.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["as_double", "dot", "norm", "cosine", "unit_vectors", "DIM"]

DIM = 64  # testdata embedding width; callers may pass their own


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column, dim: int = DIM) -> Column:
    """Sequential-fold dot product (deterministic double summation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column, dim: int = DIM) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column, dim: int = DIM) -> Column:
    """Cosine similarity of two double-array columns (sequential fold)."""
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def unit_vectors(df, vec_col: str = "embedding", out: str = "u", dim: int = DIM):
    """Add a unit-normalized double-array column.

    Two chained projections so the norm is materialized once per row and then
    referenced by the per-element division — cosine over pre-normalized vectors
    is a single dot per pair instead of three (norms computed O(N) once,
    not O(N²) per pair). The pairwise operators all start from this.
    """
    with_norm = df.withColumn("_nrm", norm(as_double(vec_col), dim))
    return with_norm.withColumn(
        out, F.transform(as_double(vec_col), lambda x: x / F.col("_nrm"))
    ).drop("_nrm")
