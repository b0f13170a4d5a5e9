#!/usr/bin/env python
"""Scale-cliff hunt at sf1: run the most expensive registry queries once at
sf0.1 and once at 10x-replicated sf0.1 (~6 M lineitem rows ≈ sf1) and record
the runtime ratio per query.

The bar: a scan/shuffle-bound operator should grow ~linearly — 10x data →
~10x time. Anything far above that hides a super-linear stage (a cliff) that
sf0.1 was too small to expose; anything far below is fixed-cost-dominated at
this scale (fine). Writes BENCH_SF1_r6.json at the repo root:

    {"replication": 10, "queries": {name: {"sf01_s", "sf1_s", "ratio"}},
     "outliers": [names with ratio > RATIO_BAR]}

Run from repo root: python scripts/scale_cliff_sf1.py [query,query,...]
"""
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

# scale_smoke parses sys.argv at import time (its own replication factor) —
# hide this script's query-list argument from it
_argv, sys.argv = sys.argv, sys.argv[:1]
from scale_smoke import BASE_SF, build_scaled  # noqa: E402

sys.argv = _argv

from librarian_spark.operators.registry import load_all  # noqa: E402
from librarian_spark.session import get_spark  # noqa: E402

REPL = 10
RATIO_BAR = 15.0

# the most expensive registry queries by the round-5 bench, worst first
QUERIES = [
    "pipeline_dedup_gate",
    "q71_grouped_gini",
    "pipeline_scd2",
    "pipeline_stateful_totals",
    "pipeline_late_data_metrics",
    "pipeline_session_agg",
    "sim_recall_eval",
    "mm_phash_dedup",
    "pipeline_stream_join",
    "q80_market_basket",
    "dedup_clusters",
    "dedup_bloom",
    "graph_pagerank",
    "graph_kcore",
    "sim_rrf_fusion",
    "graph_label_propagation",
    "dedup_edit_distance",
    "q60_recursive_hierarchy",
    "sim_kmeans_clusters",
    "text_bpe_apply",
]


def time_query(spark, spec, sf_dir: str) -> float:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    spec.spark_fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    queries = sys.argv[1].split(",") if len(sys.argv) > 1 else QUERIES
    spark = get_spark("scale-cliff")
    scaled = f"/tmp/librarian_scale_x{REPL}"
    if not os.path.exists(f"{scaled}/lineitem.parquet/_SUCCESS"):
        print(f"building {scaled} ...", file=sys.stderr)
        import scale_smoke

        scale_smoke.REPL = REPL
        build_scaled(spark, scaled)
    specs = load_all()
    spark.read.parquet(f"{BASE_SF}/region.parquet").count()  # warm JVM
    out = {}
    for name in queries:
        try:
            b = time_query(spark, specs[name], BASE_SF)
            s = time_query(spark, specs[name], scaled)
            out[name] = {
                "sf01_s": round(b, 2),
                "sf1_s": round(s, 2),
                "ratio": round(s / b, 2),
            }
            print(f"{name}: {b:.2f}s -> {s:.2f}s ({s / b:.2f}x)", file=sys.stderr)
        except Exception as e:  # record, keep hunting
            out[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{name}: ERROR {e}", file=sys.stderr)
    outliers = [
        n for n, r in out.items() if r.get("ratio", 0) > RATIO_BAR
    ]
    doc = {"replication": REPL, "ratio_bar": RATIO_BAR,
           "queries": out, "outliers": outliers}
    with open(REPO / "BENCH_SF1_r6.json", "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc, separators=(",", ":")))


if __name__ == "__main__":
    main()
