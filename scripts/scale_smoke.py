#!/usr/bin/env python
"""Scaling smoke: measure wall-clock growth of representative operators when
the input grows 5x (key-shifted replication of the sf0.1 tables into /tmp).

Not a correctness gate and not a replacement for bench.py — this answers the
scale-review question directly: does each plan's runtime grow ~linearly with
input size (shuffle- and scan-bound operators should), or does something
super-linear hide at small scale? Run from repo root:

    python scripts/scale_smoke.py [factor]

Prints one JSON line {query: {base_s, scaled_s, factor}} and a summary.
"""
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from librarian_spark.operators.registry import load_all  # noqa: E402
from librarian_spark.session import get_spark  # noqa: E402
from librarian_spark.sources.batch import load_table  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
REPL = int(sys.argv[1]) if len(sys.argv) > 1 else 5

# (table, key columns to shift so replicas don't collide)
SHIFT = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "nation": [],
    "region": [],
}

QUERIES = [
    "q06_tpch_q1",          # scan + hash aggregate
    "q14_star_join",        # multi-join star
    "q30_sessionization",   # key window
    "q31_topk_per_group",   # rank window
    "dedup_minhash_lsh",    # fingerprints + band join (replicas ARE dups)
    "dedup_substring",      # span-hash agg + join (replicas share ALL spans)
    "sim_cosine_topk",      # broadcast block matmul
    "sim_pq_topk",          # ADC code scan + shortlist re-rank
    "text_bm25_topk",       # map-only score + TakeOrdered
    "q51_gap_fill",         # agg + spine explode + key window
    "q40_tpch_q3",          # multi-join + agg + top-k
    "cdc_apply",            # max_by aggregate
    "q58_interval_overlap", # sweep-line window
    "q60_recursive_hierarchy",  # pointer-doubling iterative joins
    "q63_skyline",          # bucketed two-phase Pareto frontier
    "graph_triangle_count", # degree-oriented wedge joins
    "q53_ohlc_resample",    # shared window+agg exchange
    "q56_corr_regress",     # exact-moment single aggregate
    "dedup_bloom",          # broadcast bit-set probe + shortlist verify
    "text_heavy_hitters",   # constant-size sketch build/merge/probe
    "text_importance_weights",  # bucket-count aggs + broadcast weights
    "dedup_edit_distance",  # shingle-index shortlist + bounded DP verify
    "mm_phash_dedup",       # batched block hash + slice join + hamming
    "graph_pagerank",       # 5 broadcast+agg fixed-point iterations
    "q64_forward_fill",     # single key window, O(1) frame state
    "text_bpe_train_merges",  # rounds x (pair-count agg + map-only merge)
    "sim_ivf_incremental_add",  # probe cost over the grown index
    "graph_connected_components",  # K fan-out + min-agg rounds
    "q65_bitmap_distinct",  # map-side-combining bitmap words
    "mm_shard_manifest",    # two-level prefix sum + shard agg
    "text_keyword_tfidf",   # tf agg + broadcast df + per-doc window
    "sim_matryoshka_rerank",  # prefix matmul prune + exact rerank
    "q66_event_pattern",    # ordered collect + per-user regex
    "q67_histogram",        # map-side bucket partial agg
    "pipeline_manifest_prune",  # footer manifest cut + pruned scan
    "pipeline_stream_exact_dedup",  # watermarked streaming dedup drain
    "sim_ivf_pq_topk",      # probe-masked ADC over residual codes
    "cdc_merge_upsert",     # one full-outer key join + CASE
    "graph_bfs_levels",     # min-plus frontier rounds
    "text_bpe_apply",       # derive merges + map-only encode
    "text_weighted_sample", # map-only priorities + per-stratum top-k
    "q70_equi_depth_histogram",  # distinct-value prefix + rank arithmetic
    "sim_binary_hamming_topk",   # fold-pack + xor/popcount scan
    "text_collocations_pmi",     # pair counts + broadcast marginals
    "q72_asof_join",        # union + single key-window merge-asof
    "q73_exact_percentiles",  # exact per-group quantile aggregate
    "text_pii_scrub",       # map-only regex count/replace
    "graph_link_prediction",  # wedge join + anti-join + degree joins
    "pipeline_row_level_delete",  # zone-map prune + partial rewrite
    "pipeline_wap",         # stage + audit scans + atomic publish
    "mm_content_fingerprint",  # map-only sha2/md5
    "dedup_index_add",      # build + append + compact + probe
    "cdc_pgoutput_decode",  # record + executor-parallel wire decode
    "sim_mips_topk",        # un-normalized block matmul + local top-k
    "q74_key_skew_report",  # map-combining key counts + tiny top-k
    "q75_salted_join",      # salted shuffle-hash join + re-combine agg
    "mm_scene_segments",    # payload-local numpy frame-energy pass
    "cdc_mongo_changestream",  # record + executor-parallel event decode
    "pipeline_stateful_totals",  # applyInPandasWithState cross-batch drain
    "q76_time_weighted_average",  # shared key window + aggregate
    "q77_sliding_distinct_exact",  # interval merge + day-spine sweep
    "q78_retention_cohorts",  # co-keyed distinct + min + join + count
    "q79_rfm_segmentation",   # one aggregate + customer-level NTILEs
    "q80_market_basket",      # basket wedge join + min-support prune
    "pipeline_bloom_index",   # distributed bloom build + file-skip probe
    "q86_fk_integrity",       # per-edge full-outer key join + 1-row reduce
    "q87_roc_auc",            # distinct-score agg + two-level prefix sum
    "q88_benford",            # map-combining digit agg + 9-row tail
    "q89_weighted_median",    # per-group RANGE-frame cumulative weights
    "q90_cohort_ltv",         # customer window + cohort-age agg
    "graph_label_propagation",  # rounds x (edge-label join + mode window)
    "graph_kcore",            # double-peel rounds w/ early exit
    "text_readability",       # map-only regexp_count trio
    "mm_silence_segments",    # payload-local reduceat + vectorized runs
    "pipeline_late_data_metrics",  # 4-batch watermark drain + reconcile
    "sim_mmr_diversify",      # shortlist matmul + bounded greedy rerank
    "q91_share_of_total",     # facts-first reduce + tiny ratio windows
    "q92_mix_entropy",        # two map-combining aggs + log reduce
    "q93_abc_classification",  # facts-first reduce + per-region cum window
    "q94_time_to_convert",    # two keyed aggs + converter-only join
    "q95_new_vs_returning",   # distinct (user, day) + first-seen window
    "dedup_semantic_clusters",  # broadcast assign + per-cell pair matmul
    "q83_sequence_gaps",      # per-block LEAD + range-partitioned stitch
    "text_byte_entropy",      # map-only bincount + p*ln p per doc
    "q102_log_quantile_sketch",  # map-combining log-bucket sketch + 3-row agg
    "q103_json_schema_infer",  # map-only key explode + (key,type) agg
    "pipeline_orc_snapshot",  # ORC scan -> batched parquet commit
    "pipeline_stream_outer_join",  # 3-batch symmetric hash join drain
    "q104_hopping_window",    # x4 window fan-out absorbed map-side
    "sim_filtered_topk",      # masked block matmul + local top-k
    "text_prep_pipeline",     # 4-stage gate+dedup+decon+pack composition
]

if os.environ.get("SMOKE_QUERIES"):
    _want = set(os.environ["SMOKE_QUERIES"].split(","))
    _unknown = _want - set(QUERIES)
    if _unknown:
        # a typo'd name must fail loudly, not run zero queries and exit green
        raise SystemExit(f"SMOKE_QUERIES not in the smoke list: {sorted(_unknown)}")
    QUERIES = [q for q in QUERIES if q in _want]


def build_scaled(spark, out_dir: str, mutate=None) -> None:
    """Write a REPL× key-shifted replica union of every SHIFT table.

    ``mutate(df, replica, table) -> df`` optionally transforms each replica
    beyond the key shift (e.g. scale_cliff's organic mode rewrites document
    text per replica) — the ONE replication implementation both scripts use,
    so the shift/span/union logic can never diverge between them."""
    for t, keys in SHIFT.items():
        src = load_table(spark, BASE_SF, t)
        if not keys:
            src.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
            continue
        parts = []
        # shift well past the table's own id range so replicas never collide
        span = 10 ** 12
        for r in range(REPL):
            d = src
            for k in keys:
                d = d.withColumn(k, F.col(k) + F.lit(r * span))
            if mutate is not None:
                d = mutate(d, r, t)
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def time_query(spark, spec, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        spec.spark_fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark("scale-smoke")
    scaled = f"/tmp/librarian_scale_x{REPL}"
    if not os.path.exists(f"{scaled}/region.parquet/_SUCCESS"):
        print(f"building {scaled} ...", file=sys.stderr)
        build_scaled(spark, scaled)
    specs = load_all()
    spark.read.parquet(f"{BASE_SF}/region.parquet").count()  # warm JVM
    out = {}
    for name in QUERIES:
        b = time_query(spark, specs[name], BASE_SF)
        s = time_query(spark, specs[name], scaled)
        out[name] = {
            "base_s": round(b, 3),
            "scaled_s": round(s, 3),
            "factor": round(s / b, 2),
        }
        print(f"{name}: {b:.2f}s -> {s:.2f}s ({s / b:.2f}x)", file=sys.stderr)
    line = {"replication": REPL, "queries": out}
    print(json.dumps(line, separators=(",", ":")))


if __name__ == "__main__":
    main()
