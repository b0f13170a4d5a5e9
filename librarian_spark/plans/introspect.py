"""Physical-plan introspection helpers.

The reference has no optimizer to inspect (its "plan" is a SQL string executed
by Postgres — `/root/reference/internal/config/config.go:29`,
`internal/sql/source.go:59`). On Spark the plan IS the product: these helpers
make scan pushdown, join strategy, and shuffle count assertable in tests, so
every operator's 100 TB story ("the filter reaches the parquet scan", "the dim
table broadcasts", "the agg combines map-side") is checked by CI rather than
claimed in a docstring.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "shuffle_count",
    "has_partial_aggregate",
    "wholestage_codegen_spans",
    "plan_fingerprint",
]


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (what ``df.explain('formatted')`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter expressions that reached a scan (``PushedFilters: [...]``)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names in every scan's ``ReadSchema`` — the pruning check: a
    2-column projection must not scan 16 columns."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        for fieldspec in m.group(1).split(","):
            name = fieldspec.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan — the scale currency. Counts
    each operator's detail header once (``(N) Exchange``), so tree + detail
    double-printing doesn't double-count, and BroadcastExchange (a replication,
    not a shuffle) is excluded. AQE may remove some at runtime; this counts
    the static plan (upper bound)."""
    return len(re.findall(r"^\(\d+\) Exchange\b", formatted_plan(df), re.M))


def has_partial_aggregate(df: DataFrame) -> bool:
    """True when aggregation combines map-side before the shuffle
    (HashAggregate with a partial mode below the exchange)."""
    plan = formatted_plan(df)
    return bool(
        re.search(r"Functions(?:.*)\bpartial_", plan)
        or re.search(r"HashAggregate.*\n(?:.|\n)*Exchange", plan)
    )


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Count of WholeStageCodegen regions — wider is better (fewer interpreted
    boundaries). Uses ``explain("codegen")`` because formatted mode omits
    codegen ids while an AdaptiveSparkPlan is non-final."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    return int(m.group(1)) if m else 0


# Registry queries whose SinglePartition exchange is REVIEWED AND BOUNDED:
# either the standard final reduce of already-partial-aggregated rows (one
# row per upstream partition — how every global aggregate ends) or a window
# over a provably tiny domain, documented in the query's own docstring. Any
# OTHER registry query that plans a SinglePartition exchange fails the
# global plan gate (tests/test_plans.py) — that is the accidental
# global-window-over-the-fact-table scale bug this list exists to catch.
TINY_DOMAIN_SINGLE_PARTITION = {
    "q07_approx_distinct": "final reduce of per-partition HLL partials",
    "q07_count_distinct": "final reduce of distinct-agg partials",
    "q15_subquery_scalar": "scalar subquery's 1-row aggregate",
    "q42_hll_sketch": "final merge of mergeable sketch partials",
    "q42_kmv_rollup": "KMV merge window over the <= |priorities|*k "
    "sketch-content rows (sketch union, never the corpus), plus the 1-row "
    "global exact-distinct reduce",
    "q68_period_over_period": "window over calendar weeks (tiny domain)",
    "q69_not_in_null_semantics": "1-row NULL-existence aggregate",
    "q70_equi_depth_histogram": "window over distinct-value prefix table",
    "q77_sliding_distinct_exact": "sweep over bounded event-day boundaries",
    "q86_fk_integrity": "per-edge 1-row reduce of audit-aggregate partials",
    "q100_lorenz_gini": "1-row final reduce of per-partition moment partials",
    "sim_embedding_drift": "1-row final reduce of per-partition drift-sum "
    "partials (130 longs), then a local 64-element unpivot",
    "q101_column_stats": "per-column 1-row reduce of stats-aggregate partials",
    "q88_benford": "window over the 9-digit expected table",
    "q91_share_of_total": "global-total window over the ~25-row nation "
    "aggregate (facts reduce first)",
    "graph_assortativity": "1-row final reduce of per-partition "
    "moment-sum partials (M, Sjk, Sj, Sj2 as decimal(38,0))",
}


def plan_fingerprint(df: DataFrame) -> dict:
    """One-line scale summary of a plan — the shared backend of ``cli
    explain`` and ``scripts/gen_plans_md.py`` (one implementation, so the two
    surfaces can never disagree on what they report).

    Keys: exchanges (shuffle count), codegen_stages (distinct whole-stage
    ids; 0 can mean "AQE printed a non-finalized plan", not "interpreted"),
    pushed_filters (any non-empty PushedFilters on a scan), broadcast_join,
    hazards (cartesian / nested-loop / single-partition exchange).
    """
    plan = formatted_plan(df)
    hazards = []
    if "CartesianProduct" in plan:
        hazards.append("cartesian")
    if "BroadcastNestedLoopJoin" in plan:
        hazards.append("nested-loop")
    # formatted-mode explain never prints "Exchange SinglePartition" on one
    # line — the node prints "Exchange (N)" in the tree and its spec as
    # "Arguments: SinglePartition" in the detail block (the literal grep was
    # silently dead and PLANS.md under-reported this hazard class)
    if "Exchange SinglePartition" in plan or "Arguments: SinglePartition" in plan:
        hazards.append("single-partition")
    return {
        "exchanges": shuffle_count(df),
        "codegen_stages": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "broadcast_join": "BroadcastHashJoin" in plan,
        "hazards": hazards,
    }
