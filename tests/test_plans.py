"""Physical-plan assertions — the 100 TB contract, checked by CI.

Correctness tests prove each operator's VALUES; these prove its PLAN stays
the one that survives a 1000-executor / 100 TB scale-up: filters reach the
parquet scan, projections prune the read schema, dimension joins broadcast,
aggregates combine map-side before shuffling, top-k never global-sorts, and
map-only operators genuinely never shuffle. A regression here is a scale
regression even when every value still matches.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from librarian_spark.operators.registry import load_all
from librarian_spark.plans.introspect import (
    formatted_plan,
    has_broadcast_join,
    has_partial_aggregate,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
    wholestage_codegen_spans,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def specs():
    return load_all()


def _df(specs, spark, name):
    return specs[name].spark_fn(spark, SF)


def test_filter_pushed_to_scan(spark, specs):
    """q03's WHERE must reach the parquet reader, not run post-scan."""
    df = _df(specs, spark, "q03_filter")
    pf = pushed_filters(df)
    assert any("l_discount" in f or "l_shipdate" in f for f in pf), pf


def test_projection_prunes_read_schema(spark, specs):
    """A 3-column projection must scan 3 columns, not all 11."""
    df = _df(specs, spark, "q01_projection")
    cols = read_schema_columns(df)
    assert set(cols) == {"l_orderkey", "l_linenumber", "l_extendedprice"}, cols


def test_small_dim_join_broadcasts(spark, specs):
    df = _df(specs, spark, "q10_join_broadcast")
    assert has_broadcast_join(df), formatted_plan(df)


def test_star_join_broadcasts_dims(spark, specs):
    """TPC-H Q5 shape: nation/region/customer sides must broadcast — a
    shuffle join against a 5-row dim table is the classic scale bug."""
    df = _df(specs, spark, "q14_star_join")
    assert has_broadcast_join(df), formatted_plan(df)


def test_group_agg_combines_map_side(spark, specs):
    """TPC-H Q1: partial HashAggregate below the exchange, so the shuffle
    carries one row per (group × partition), not per input row."""
    df = _df(specs, spark, "q06_tpch_q1")
    assert has_partial_aggregate(df), formatted_plan(df)
    assert shuffle_count(df) <= 1, formatted_plan(df)


def test_topk_never_global_sorts(spark, specs):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    heap + single reduce), not a full range-partitioned sort."""
    plan = formatted_plan(_df(specs, spark, "q05_topk"))
    assert "TakeOrderedAndProject" in plan, plan


@pytest.mark.parametrize(
    "name",
    [
        "q01_projection",
        "q02_arithmetic",
        "q03_filter",
        "q20_strings",
        "q22_math",
        "q24_nulls",
        "q35_hash_sample",
        "text_token_count",
        "text_quality_score",
        "text_lang_id",
        "text_chunk",
        "text_pii_redact",
    ],
)
def test_map_only_operators_never_shuffle(spark, specs, name):
    df = _df(specs, spark, name)
    assert shuffle_count(df) == 0, f"{name}: " + formatted_plan(df)


@pytest.mark.parametrize(
    "name", ["q01_projection", "q03_filter", "q06_tpch_q1", "q19_case"]
)
def test_relational_hot_path_stays_in_codegen(spark, specs, name):
    """The scan→filter→project→agg pipeline must run inside WholeStageCodegen
    (no interpreted expression boundaries in the hot path). AQE hides codegen
    regions while the adaptive plan is non-final, so plan with it off."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # raw_fn: the registered fn re-applies the engine conf profile
        # (including AQE) to its session, which would re-hide the spans
        df = specs[name].raw_fn(spark, SF)
        assert wholestage_codegen_spans(df) >= 1, f"{name}: " + formatted_plan(df)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_semi_anti_plan_as_joins_not_subquery_loops(spark, specs):
    """EXISTS/NOT IN shapes must decorrelate to semi/anti hash joins."""
    for name in ["q12_join_semi", "q12_join_anti"]:
        plan = formatted_plan(_df(specs, spark, name))
        assert "SemiJoin" in plan.replace("LeftSemi", "SemiJoin") or "LeftSemi" in plan or "LeftAnti" in plan, plan


def test_range_join_binned_not_nested_loop(spark, specs):
    """q39: the pure range join must compile to an equi join on the bin key —
    BroadcastNestedLoopJoin is the O(N·M) plan that dies at scale."""
    plan = formatted_plan(_df(specs, spark, "q39_range_bin_join"))
    assert "BroadcastNestedLoop" not in plan, plan
    assert any(
        j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    ), plan


def test_ordered_listagg_single_shuffle(spark, specs):
    """q36: broadcast dim join + one hash-aggregate exchange — the collect_list
    shuffle is the only one."""
    df = _df(specs, spark, "q36_string_agg")
    assert has_broadcast_join(df), formatted_plan(df)
    assert shuffle_count(df) <= 1, formatted_plan(df)


def test_bucketed_join_has_no_shuffle(spark, specs, tmp_path_factory):
    """Pre-bucketing both sides of a pk equi-join on the join key removes the
    exchange entirely — the co-located-join design the CDC snapshot-diff and
    dedup docstrings promise for 100 TB (SURVEY.md §2A #11 scale note). Pins
    that a bucketed `spark.table` join plans with ZERO shuffles."""
    sf = SF
    import uuid

    from librarian_spark.sources.batch import load_table

    suffix = uuid.uuid4().hex[:8]
    t_old, t_new = f"orders_bkt_old_{suffix}", f"orders_bkt_new_{suffix}"
    orders = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    try:
        for name, pred in ((t_old, 7), (t_new, 5)):
            (
                orders.filter(orders.o_orderkey % pred != 0)
                .write.bucketBy(8, "o_orderkey")
                .sortBy("o_orderkey")
                .mode("overwrite")
                .saveAsTable(name)
            )
        j = spark.table(t_old).join(spark.table(t_new), "o_orderkey")
        assert shuffle_count(j) == 0, formatted_plan(j)
        assert j.count() > 0
    finally:
        for name in (t_old, t_new):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_dynamic_partition_pruning_on_partitioned_fact(spark, specs, tmp_path_factory):
    """On a date/key-partitioned 100 TB fact table, a filtered dim join must
    prune fact partitions at RUNTIME (dynamic partition pruning) — scanning
    all partitions to then hash-filter is the classic star-schema scale bug.
    Pins that the fact scan carries a dynamicpruning subquery expression."""
    import uuid

    from librarian_spark.sources.batch import load_table

    base = str(tmp_path_factory.mktemp(f"dpp_{uuid.uuid4().hex[:6]}"))
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    orders.write.partitionBy("o_orderpriority").mode("overwrite").parquet(base)
    fact = spark.read.parquet(base)
    # DPP preconditions (all verified empirically): the dim comes from a
    # relation with size stats (a file scan); its filter sits on a NON-join
    # column (a literal equality on the join key itself constant-propagates
    # into a STATIC partition filter — a different mechanism); and the filter
    # is a comparison predicate (a bare boolean attribute fails Catalyst's
    # isLikelySelective test and DPP declines to insert the subquery).
    dim_path = base + "_dim"
    (
        orders.select("o_orderpriority")
        .distinct()
        .withColumn(
            "tier",
            F.when(F.col("o_orderpriority") == "1-URGENT", "hot").otherwise("cold"),
        )
        .write.mode("overwrite")
        .parquet(dim_path)
    )
    dim = spark.read.parquet(dim_path).filter(F.col("tier") == "hot")
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try:
        j = fact.join(dim, "o_orderpriority")
        plan = formatted_plan(j)
        assert "dynamicpruning" in plan.lower(), plan
        assert j.count() > 0
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", prev
        )


def test_no_registry_query_plans_a_nested_loop(spark, specs):
    """Global scale gate: NO registry query may plan BroadcastNestedLoopJoin or
    CartesianProduct — the two O(N·M) shapes that die at 100 TB — and any
    SinglePartition exchange must be on the reviewed-and-bounded allowlist
    (final reduce of aggregate partials, or a documented tiny-domain window).
    An unlisted SinglePartition exchange is the accidental global-window-over-
    the-fact-table bug. Any future operator that slips into either fails
    here, not in production."""
    from librarian_spark.plans.introspect import TINY_DOMAIN_SINGLE_PARTITION

    offenders = {}
    for name, spec in specs.items():
        plan = formatted_plan(spec.spark_fn(spark, SF))
        if "BroadcastNestedLoop" in plan or "CartesianProduct" in plan:
            offenders[name] = [
                ln.strip()
                for ln in plan.splitlines()
                if "NestedLoop" in ln or "Cartesian" in ln
            ]
        if (
            "Arguments: SinglePartition" in plan
            or "Exchange SinglePartition" in plan
        ) and name not in TINY_DOMAIN_SINGLE_PARTITION:
            offenders[name] = ["unlisted SinglePartition exchange"]
    assert not offenders, offenders


def test_decontaminate_broadcasts_eval_grams(spark, specs):
    """text_decontaminate: the eval-gram side must broadcast — shuffling the
    corpus gram stream against it is the plan that dies at 100 TB."""
    df = _df(specs, spark, "text_decontaminate")
    assert has_broadcast_join(df), formatted_plan(df)


@pytest.mark.parametrize(
    "name,max_shuffles",
    [
        ("cdc_apply", 1),          # one key-partitioned max_by aggregate
        ("dedup_keep_best", 1),    # winners agg; verdict join broadcasts
        ("q45_funnel", 1),         # conditional-MIN aggregate
        ("text_pack_sequences", 1),  # one per-domain window
    ],
)
def test_single_shuffle_aggregation_operators(spark, specs, name, max_shuffles):
    df = _df(specs, spark, name)
    assert shuffle_count(df) <= max_shuffles, f"{name}: " + formatted_plan(df)
    assert has_partial_aggregate(df) or name == "text_pack_sequences", (
        f"{name}: " + formatted_plan(df)
    )


@pytest.mark.parametrize(
    "name", ["text_stratified_sample", "sim_quantize_int8", "q44_unpivot"]
)
def test_new_map_only_operators_never_shuffle(spark, specs, name):
    df = _df(specs, spark, name)
    assert shuffle_count(df) == 0, f"{name}: " + formatted_plan(df)


def test_runtime_bloom_filter_prunes_shuffle_join(spark, specs):
    """Runtime row-level bloom filters (the shuffle-join twin of DPP): a
    selectively-filtered build side must inject a bloom filter into the big
    side's scan so non-matching rows drop BEFORE the shuffle. Fires by
    default only when the probe side scans > 10GB
    (applicationSideScanSizeThreshold) — exactly the 100 TB regime this
    repo targets — so the test lowers it to demonstrate on test-scale data."""
    from librarian_spark.sources.batch import load_table

    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, SF, "lineitem")
        o = load_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), plan
        assert j.count() > 0
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_scd2_single_window_shuffle(spark, specs):
    """row_number + lead share one (user_id) window: exactly one exchange."""
    df = _df(specs, spark, "cdc_scd2")
    assert shuffle_count(df) <= 1, formatted_plan(df)


def test_bm25_topk_take_ordered_map_only_scoring(spark, specs):
    """BM25 ranking must cut top-N with TakeOrderedAndProject (per-partition
    heap), never a single-partition global window/sort; with the corpus-stats
    row inlined as literals the scoring pass is map-only — zero exchanges."""
    df = _df(specs, spark, "text_bm25_topk")
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan
    assert shuffle_count(df) == 0, plan


def test_minhash_index_probe_prunes_partitions(spark, specs):
    """The persisted-LSH probe must reach the band table through a partition
    filter on the signature bucket (file skipping at rest), never a full
    index scan."""
    df = _df(specs, spark, "dedup_minhash_index")
    plan = formatted_plan(df)
    import re as _re

    pf = _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("bucket" in f for f in pf), plan


def test_pipeline_bucketed_join_only_shuffles_for_agg(spark, specs):
    """pipeline_bucketed_join's plan: the orders⋈lineitem join itself is
    exchange-free (both sides bucketed on the key, merge-hinted), so the ONLY
    shuffle in the whole query is the final small groupBy aggregation — and
    nothing broadcasts (it's the big-big join shape bucketing exists for)."""
    df = specs["pipeline_bucketed_join"].raw_fn(spark, SF)
    plan = formatted_plan(df)
    assert "SortMergeJoin" in plan, plan
    assert not has_broadcast_join(df), plan
    assert shuffle_count(df) == 1, plan


def test_bitmap_distinct_partial_aggregates_without_expand(spark, specs):
    """q65's whole point: the bitmap words combine map-side (partial
    aggregate) and the plan has NO Expand node — COUNT(DISTINCT) would
    introduce one and shuffle every (key, id) pair."""
    df = _df(specs, spark, "q65_bitmap_distinct")
    plan = formatted_plan(df)
    assert has_partial_aggregate(df), plan
    assert "Expand" not in plan, plan


def test_shard_manifest_has_no_single_partition_window(spark, specs):
    """mm_shard_manifest's per-row running sum must be PARTITIONED by the
    range-partition id (the q79 offset construction) — a global row-ordered
    window (single partition over all rows) is the scale bug, and unlike
    the old block-keyed two-level scheme there is no corpus-scaling block
    list left: the plan may not contain ANY single-partition exchange."""
    import re

    from librarian_spark.plans.introspect import plan_fingerprint

    df = _df(specs, spark, "mm_shard_manifest")
    plan = formatted_plan(df)
    # Window nodes print "Arguments: [exprs], [partitionSpec], [orderSpec]";
    # any window ORDERING by doc_id is the row-level running sum and must
    # be PARTITIONED by the pinned range-partition id.
    win_args = re.findall(
        r"\(\d+\) Window[^\n]*\n(?:Input[^\n]*\n)?Arguments: ([^\n]*)", plan
    )
    assert win_args, plan
    row_windows = [a for a in win_args if "doc_id" in a]
    assert row_windows, win_args
    for a in row_windows:
        assert "_pid" in a, a
    assert "single-partition" not in plan_fingerprint(df)["hazards"], plan


def test_merge_upsert_single_full_outer_join(spark, specs):
    """cdc_merge_upsert is ONE key join: exactly one join node, FullOuter."""
    df = _df(specs, spark, "cdc_merge_upsert")
    plan = formatted_plan(df)
    import re

    assert "FullOuter" in plan, plan
    # count numbered plan NODES, not raw substring hits (each node appears in
    # both the tree and its detail block)
    nodes = re.findall(
        r"\(\d+\) (SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", plan
    )
    assert len(nodes) == 1, (nodes, plan[:400])


def test_manifest_prune_scans_fewer_files(spark, specs):
    """pipeline_manifest_prune's scan must plan over the PRUNED file list:
    the scan's 'number of files read' stays below the 16-file layout."""
    df = _df(specs, spark, "pipeline_manifest_prune")
    # the op itself raises if pruning kept everything; here assert the plan's
    # actual input-file list stays at most half the 16-file layout
    assert 0 < len(df.inputFiles()) <= 8, df.inputFiles()


def test_event_pattern_single_shuffle(spark, specs):
    """q66: one grouped collect per user — a single exchange, regex map-only."""
    df = _df(specs, spark, "q66_event_pattern")
    assert shuffle_count(df) == 1, formatted_plan(df)


def test_tfidf_df_join_broadcasts(spark, specs):
    """text_keyword_tfidf: the term-df frame is broadcast back onto the
    doc-term table — no shuffle join on the term."""
    df = _df(specs, spark, "text_keyword_tfidf")
    assert has_broadcast_join(df), formatted_plan(df)


def test_pagerank_iteration_never_broadcasts_ranks(spark, specs):
    """The per-iteration rank+degree table is O(|nodes|) — at a billion-node
    graph it is tens of GB, so the edge fan-out join must survive with NO
    broadcast anywhere: shuffle hash join, no nested loop. Pinned with
    auto-broadcast disabled, which is exactly the at-scale situation."""
    from librarian_spark.operators.relational import _PR_SCALE, _pr_step, _t

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = _t(spark, SF, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
        a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
        b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
        edges = (
            a.join(b, "l_orderkey")
            .filter(F.col("u") != F.col("v"))
            .select("u", "v")
            .distinct()
            .localCheckpoint()
        )
        deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        ranks = deg.select(
            F.col("u").alias("x"), F.lit(_PR_SCALE).cast("long").alias("r")
        )
        plan = formatted_plan(_pr_step(edges, ranks, deg))
        assert "ShuffledHashJoin" in plan, plan
        assert "BroadcastExchange" not in plan, plan
        assert "NestedLoop" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_asof_join_is_union_window_not_range_join(spark, specs):
    """q72: the merge-asof must plan as (right pre-agg + one key window) —
    two exchanges, NO join operator at all: the naive range join explodes
    O(|l|·|r|) per key and the global gate would flag its nested loop."""
    df = _df(specs, spark, "q72_asof_join")
    plan = formatted_plan(df)
    assert shuffle_count(df) <= 2, plan
    assert "Join" not in plan, plan


def test_salted_join_shuffle_hash_no_broadcast(spark, specs):
    """q75: the drill is the big-dim case, so the plan must carry a
    ShuffledHashJoin and no broadcast — a broadcast would make the salt
    dead machinery."""
    plan = formatted_plan(_df(specs, spark, "q75_salted_join"))
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_twap_single_shuffle(spark, specs):
    """q76: the LEAD window and the per-user aggregate must share ONE
    user_id exchange — the shared-shuffle claim in the docstring."""
    df = _df(specs, spark, "q76_time_weighted_average")
    assert shuffle_count(df) == 1, formatted_plan(df)


def test_mips_same_shape_as_cosine(spark, specs):
    """sim_mips_topk inherits the block-matmul shape: fan-out repartition +
    one final ranking exchange, nothing else."""
    df = _df(specs, spark, "sim_mips_topk")
    assert shuffle_count(df) <= 2, formatted_plan(df)


def test_gaps_islands_windows_partitioned_by_user(spark, specs):
    """q81: the anchor window must be PARTITIONED by user_id — no exchange to
    a single partition anywhere (the naive islands query over a global
    row_number is the scale bug), and distinct + window + final group-by
    share the user_id hash exchange where possible."""
    df = _df(specs, spark, "q81_gaps_islands")
    plan = formatted_plan(df)
    assert "SinglePartition" not in plan, plan
    assert shuffle_count(df) <= 2, plan


def test_rolling_median_stays_in_partitioned_window(spark, specs):
    """q82: the exact rolling median is ONE per-user window (collect_list
    over a constant frame) + map-side order statistics — one exchange, no
    single-partition window, no UDF (the array math is all codegen)."""
    df = _df(specs, spark, "q82_rolling_median")
    plan = formatted_plan(df)
    assert "SinglePartition" not in plan, plan
    assert shuffle_count(df) == 1, plan
    assert "pythonUDF" not in plan.lower(), plan


def test_sequence_gaps_row_windows_are_block_partitioned(spark, specs):
    """q83: the row-level LEAD must run inside block partitions; the only
    unpartitioned window may carry the 1024x-smaller block summary (the
    mm_shard_manifest two-level contract)."""
    import re

    df = _df(specs, spark, "q83_sequence_gaps")
    plan = formatted_plan(df)
    win_args = re.findall(
        r"\(\d+\) Window[^\n]*\n(?:Input[^\n]*\n)?Arguments: ([^\n]*)", plan
    )
    assert win_args, plan
    # windows carrying the per-row LEAD must be partitioned by blk; the
    # summary window (lead over block mins) orders by blk alone
    for a in win_args:
        if "mn#" in a:  # summary window (lead over block mins)
            continue
        assert "blk" in a, a


def test_audience_overlap_joins_words_not_users(spark, specs):
    """q84: the pair intersection must be an equi hash join on the bitmap
    WORD index — never a nested loop over user rows — and the bitmap
    construction partial-aggregates map-side before its exchange."""
    df = _df(specs, spark, "q84_audience_overlap")
    plan = formatted_plan(df)
    assert "BroadcastNestedLoop" not in plan, plan
    assert any(
        j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    ), plan
    assert has_partial_aggregate(df), plan


def test_lag_features_single_window_shuffle(spark, specs):
    """q85: all five features must share ONE per-user window spec — a single
    user_id exchange, no single-partition window, pure codegen."""
    df = _df(specs, spark, "q85_lag_features")
    plan = formatted_plan(df)
    assert "SinglePartition" not in plan, plan
    assert shuffle_count(df) == 1, plan
    assert "pythonUDF" not in plan.lower(), plan
