"""Text-analysis column functions (pure Spark expressions — JVM-side, codegen'd).

Building blocks for the LLM-data-pipeline operators (dedup, language ID, quality
scoring). Everything here is a deterministic function of the input text so results
are reproducible across engines — each helper documents its DuckDB-SQL twin, used
by the oracles in :mod:`librarian_spark.operators.text` / ``dedup``.

No UDFs: at 100 TB the tokenizer runs inside whole-stage codegen over billions of
rows; a Python UDF here would dominate job cost.

All helpers take the *column name* (not a Column) so they can inline the expression
into a single codegen'd tree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["tokens", "shingles", "fingerprint", "fingerprint_codes", "STOPWORDS", "FP_MOD"]

# Small per-language stopword lists for the stopword-vote language-ID heuristic.
# Disjoint across languages so votes don't cancel.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "es": ["el", "la", "los", "las", "es", "una", "por", "como"],
    "fr": ["le", "les", "des", "est", "une", "dans", "pour", "que"],
}

FP_MOD = 1_000_000_007


def tokens(col_name: str) -> Column:
    """Whitespace tokens of trimmed, lowercased text.

    DuckDB twin: ``STR_SPLIT(TRIM(LOWER(col)), ' ')``. Single-space split (the
    corpus is single-space separated) so both engines agree exactly; a ``\\s+``
    regex split is the general form but regex dialects differ subtly.
    """
    return F.split(F.trim(F.lower(F.col(col_name))), " ")


def tokens_sql(col_name: str) -> str:
    """Spark-SQL text form of :func:`tokens` (for expression inlining)."""
    return f"split(trim(lower({col_name})), ' ')"


def shingles_of_tokens(tok_col: str, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles over an ALREADY-MATERIALIZED token-array column;
    ``distinct=True`` gives set semantics (what Jaccard/MinHash want).

    Expression shape: ``transform(sequence(1, size(w)-n+1), i ->
    concat_ws(' ', w[i-1], ..., w[i+n-2]))`` — one shingle per window position,
    entirely inside codegen. ``tok_col`` must be a plain column reference (give
    the tokenizer its own projection), NOT an inlined split expression: an
    expression inside the lambda is re-evaluated per window position × n
    accesses, turning shingling O(tokens²) with GC-bound 6-26s/query variance
    at sf0.1 (measured) versus a flat ~1s when bound to a column.

    DuckDB twin: ``LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(w)-(n-2)),
    i -> w[i] || ' ' || w[i+1] || ...))`` (DuckDB lists are 1-indexed, RANGE is
    end-exclusive).

    Docs shorter than ``n`` tokens yield an EMPTY array: a bare
    ``sequence(1, size-n+1)`` would flip to a DESCENDING ``[1, 0]`` when the
    stop is below the start (Spark infers step -1), emitting phantom shingles
    — hence the explicit size guard.
    """
    parts = ", ".join(f"{tok_col}[i - 1 + {j}]" for j in range(n))
    e = F.expr(
        f"CASE WHEN size({tok_col}) >= {n} THEN "
        f"transform(sequence(1, size({tok_col}) - {n - 1}), "
        f"i -> concat_ws(' ', {parts})) "
        f"ELSE CAST(array() AS array<string>) END"
    )
    return F.array_distinct(e) if distinct else e


def shingles(col_name: str, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles of a TEXT column — convenience form for small
    inputs/tests. Hot paths must tokenize into a separate projection and use
    :func:`shingles_of_tokens` (see its docstring for the measured O(tokens²)
    trap this form carries)."""
    w = tokens_sql(col_name)
    parts = ", ".join(f"{w}[i - 1 + {j}]" for j in range(n))
    e = F.expr(
        f"CASE WHEN size({w}) >= {n} THEN "
        f"transform(sequence(1, size({w}) - {n - 1}), "
        f"i -> concat_ws(' ', {parts})) "
        f"ELSE CAST(array() AS array<string>) END"
    )
    return F.array_distinct(e) if distinct else e


def o_shingles(col_expr: str, n: int = 3, distinct: bool = True) -> str:
    """DuckDB-SQL twin of :func:`shingles` over a token-list SQL expression ``w``
    (caller binds ``w`` via a lateral/subquery alias)."""
    parts = " || ' ' || ".join(f"w[i + {j}]" if j else "w[i]" for j in range(n))
    inner = f"LIST_TRANSFORM(RANGE(1, GREATEST(LEN(w) - {n - 2}, 1)), i -> {parts})"
    return f"LIST_DISTINCT({inner})" if distinct else inner


def fingerprint(col: Column | str, mod: int = FP_MOD) -> Column:
    """Polynomial rolling-hash document fingerprint: fold ``h = (h*31 + code) % mod``
    over the characters. Stays in bigint range (h < 1e9; h*31 + 127 << 2^63).
    Accepts a column name or a Column expression (e.g. a lambda variable inside
    a higher-order function) — every Spark-side copy of this fold must live
    here so it can never drift from ``o_fingerprint``.

    DuckDB twin: ``LIST_REDUCE(LIST_PREPEND(0, LIST_TRANSFORM(STR_SPLIT(col, ''),
    c -> ASCII(c))), (a, b) -> (a*31 + b) % mod)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % mod,
    )


def o_fingerprint(col_expr: str, mod: int = FP_MOD) -> str:
    return (
        f"LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), "
        f"LIST_TRANSFORM(STR_SPLIT({col_expr}, ''), c -> CAST(ASCII(c) AS BIGINT))), "
        f"(a, b) -> (a * 31 + b) % {mod})"
    )


def fingerprint_codes(codes: Column, mod: int = FP_MOD) -> Column:
    """THE SAME ``h = (h*31 + code) % mod`` fold as :func:`fingerprint`, over
    an already-materialized array of character codes instead of a string —
    the sliding-window form: split the text into codes ONCE per document,
    then hash each window as a fold over ``slice(codes, p, k)``. One split
    per doc instead of one per window position (the winnowing operator,
    whose positions ≈ doc length, measured 4.4 s → 3.3 s from this alone
    and 0.8 s with fan_out restoring map parallelism). Value-identical to
    ``fingerprint(substr(...))`` by construction; change this fold, its
    string twin, and ``o_fingerprint`` TOGETHER."""
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % mod,
    )
