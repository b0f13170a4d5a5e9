"""Every registered query must hash-match its DuckDB oracle (the t2 gate, locally).

Runs at sf0.001 by default (fast); set SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.01
to replicate the driver's exact comparison scale.
"""

from __future__ import annotations

import pytest

from librarian_spark.operators.registry import load_all
from tests.oracle import assert_query_matches

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, oracle_sf_dir, name):
    spec = SPECS[name]
    if spec.oracle is None:
        df = spec.spark_fn(spark, oracle_sf_dir)
        assert df.count() >= 0  # rows-only check, mirroring the driver
        return
    assert_query_matches(spark, spec.spark_fn, spec.oracle, oracle_sf_dir, name)


def test_degenerate_groups_match_oracle(spark, tmp_path):
    """Adversarial regression data for NULL/degenerate-group semantics: a
    singleton event_type (n=1 ⇒ unguarded ANSI divide raises DIVE_BY_ZERO in
    q47) and a view-only user (projected TRUE AND NULL is NULL, not false —
    q45's oracle diverged). Both queries must still hash-match their oracles."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from librarian_spark.sources.batch import load_table

    tmp = str(tmp_path / "degenerate")
    import os

    os.makedirs(tmp)
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    extra = spark.createDataFrame(
        [
            (999901, "2024-02-01 00:00:00", 7777, "solo_type", 5.0, "{}"),
            (999902, "2024-02-02 00:00:00", 8888, "view", 1.0, "{}"),
            # NULL event_type: q64_forward_fill's mask must KEEP this value
            # (NULL != 'error' is NULL — a when(!=)-keeps form masks it)
            (999903, "2024-02-03 00:00:00", 8888, None, 3.0, "{}"),
            # NULL value: q70's prior join must be null-safe (an inner
            # equi-join silently drops the row) and its window order must
            # pin NULLS LAST to match DuckDB's NTILE placement
            (999904, "2024-02-04 00:00:00", 8888, "view", None, "{}"),
            # a click AFTER the NULL-value view: q72's as-of match is that
            # view, and its (event, value) must come from the SAME row —
            # independent per-field windows would skip the NULL value and
            # stitch in an older view's value (the confirmed stitch bug)
            (999905, "2024-02-05 00:00:00", 8888, "click", 2.0, "{}"),
            # NULL ts: Spark windows order NULLS FIRST, DuckDB NULLS LAST —
            # every ts-ordered window op must exclude (or pin) these rows
            # identically on both sides (q81/q82/q85's ts IS NOT NULL guard)
            (999906, None, 6666, "view", 4.0, "{}"),
            # NULL user_id: q84's activity filter must drop it on both
            # sides (the oracle's join drops NULL keys implicitly; the
            # Spark bitmap would otherwise encode a NULL word)
            (999907, "2024-02-06 00:00:00", None, "view", 2.5, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    staging = f"{tmp}/_staging"
    ev.unionByName(extra).coalesce(1).write.mode("overwrite").parquet(staging)
    shutil.move(glob.glob(f"{staging}/part-*.parquet")[0], f"{tmp}/events.parquet")
    shutil.rmtree(staging)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{tmp}/{t}.parquet")
    for name in ["q47_zscore_anomaly", "q45_funnel", "cdc_apply", "q30_sessionization",
                 "q64_forward_fill", "q70_equi_depth_histogram",
                 # NULL-semantics coverage for the round-5 ops: q72's matched
                 # right row must stay WHOLE when its value is NULL (the
                 # two-window stitch bug class), the others must agree with
                 # the oracle's NULL-skipping aggregates
                 "q72_asof_join", "q73_exact_percentiles",
                 "q76_time_weighted_average", "q77_sliding_distinct_exact",
                 # round-5 part 2: q82's trailing frame must skip the NULL
                 # value like MEDIAN does; q84 must drop the NULL event_type
                 # on both sides; q81's islands ignore both NULL columns
                 "q81_gaps_islands", "q82_rolling_median",
                 "q84_audience_overlap",
                 # q85: the NULL value must flow through the lags untouched
                 # while the trailing mean/count skip it on both engines
                 "q85_lag_features",
                 # q87/q92 must drop NULL user_id (and q92 NULL event_type)
                 # rows identically on both sides before bucketing
                 "q87_roc_auc", "q92_mix_entropy",
                 # q94/q95 must drop NULL user_id/ts identically before the
                 # first-seen aggregation on both sides
                 "q94_time_to_convert", "q95_new_vs_returning",
                 # a NULL event_type is a malformed change (no op code):
                 # excluded on both sides, else both envelope images render
                 # null and a spurious all-NULL state row materializes
                 "pipeline_stream_cdc_apply",
                 # q107 must drop NULL user_id before hashing: a NULL hv
                 # ranks FIRST in Spark's row_number and LAST in DuckDB's,
                 # silently corrupting the sketch (ck/hk) and the estimate
                 "q107_kmv_distinct"]:
        spec = SPECS[name]
        assert_query_matches(spark, spec.spark_fn, spec.oracle, tmp, name)


def test_degenerate_documents_match_oracle(spark, tmp_path):
    """Adversarial docs for the span/token operators: shorter than the 8-token
    span width (the sequence() guard would otherwise emit phantom descending
    spans), exactly at the width, a single token, and empty text. The corpus
    docs are all ≥10 tokens, so without this the guards are never executed."""
    import glob
    import os
    import shutil

    from librarian_spark.sources.batch import load_table

    tmp = str(tmp_path / "degenerate_docs")
    os.makedirs(tmp)
    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    extra = spark.createDataFrame(
        [
            (999901, "three token doc", "en", "srcx", 15),
            (999902, "seven tokens just below the span width", "en", "srcx", 38),
            (999903, "eight tokens exactly at the span width here", "en", "srcx", 43),
            (999904, "solo", "en", "srcx", 4),
            (999905, "", "en", "srcx", 0),
            # an exact 8-token twin of 999903 so the dup path fires too
            (999906, "eight tokens exactly at the span width here", "en", "srcx", 43),
            # non-ASCII near-twins: multi-byte UTF-8 makes byte length !=
            # char length, so any oracle hashing CHARACTERS instead of the
            # encoded payload BYTES diverges here (the mm_phash_dedup bug
            # class); near-identical so the candidate+verify path fires
            (999907, "héllo wörld — ünïcode byte sémantics test çorpus", "de", "srcx", 48),
            (999908, "héllo wörld — ünïcode byte sémantics test çorpu5", "de", "srcx", 48),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    staging = f"{tmp}/_staging"
    d.unionByName(extra).coalesce(1).write.mode("overwrite").parquet(staging)
    shutil.move(glob.glob(f"{staging}/part-*.parquet")[0], f"{tmp}/documents.parquet")
    shutil.rmtree(staging)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{tmp}/{t}.parquet")
    for name in ["dedup_substring", "text_feature_hash_embed",
                 "text_token_count", "dedup_ngram_jaccard",
                 "mm_phash_dedup", "mm_shard_manifest",
                 "mm_scene_segments", "mm_content_fingerprint",
                 "mm_audio_rms", "mm_feature_extract",
                 "mm_silence_segments", "text_readability",
                 "text_byte_entropy",
                 # dedup_simhash's md5 token hash must agree on UTF-8 byte
                 # semantics (hashlib md5 of token.encode vs DuckDB MD5) and
                 # on empty/short docs (STR_SPLIT('') == [''] parity)
                 "dedup_simhash",
                 # the LM scorer's <2-token guard (sequence() flips
                 # descending below the start) and the 1-token/empty-text
                 # exclusion must agree on both engines
                 "text_ngram_lm_score"]:
        spec = SPECS[name]
        assert_query_matches(spark, spec.spark_fn, spec.oracle, tmp, name)


def test_simhash_cap_null_text_parity(spark, tmp_path):
    """The simhash hot-bucket cap must derive N from HASHED docs on both
    engines. Committed testdata has zero NULL texts, so this builds the one
    corpus shape that exposes a cap divergence: >512 hashed docs (the
    scale-relative N//32 term beats the floor of 16), 64 NULL-text docs
    (dropped by the fingerprint map but counted by a naive
    COUNT(*) FROM documents), and a 21-doc identical-text bucket whose size
    falls BETWEEN the two caps — 621 hashed ⇒ cap 19 (bucket excluded, no
    pairs) vs 685 total ⇒ cap 21 (bucket included, C(21,2)=210 pairs). An
    oracle capping on the raw doc count hash-mismatches here."""
    import glob
    import os
    import shutil

    tmp = str(tmp_path / "simhash_cap")
    os.makedirs(tmp)
    rows = [
        (100_000 + i, "twenty one identical documents sharing every bucket",
         "en", "dup", 50)
        for i in range(21)
    ]
    rows += [
        (200_000 + i,
         f"unique filler document {i} with tokens alpha{i % 97} "
         f"beta{(i * 7) % 89} gamma{(i * 13) % 83} delta{(i * 31) % 79}",
         "en", "fill", 90)
        for i in range(600)
    ]
    rows += [(300_000 + i, None, "en", "nulls", 0) for i in range(64)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    staging = f"{tmp}/_staging"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    shutil.move(glob.glob(f"{staging}/part-*.parquet")[0], f"{tmp}/documents.parquet")
    shutil.rmtree(staging)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{tmp}/{t}.parquet")
    spec = SPECS["dedup_simhash"]
    # the engineered bucket must actually sit between the caps, and the
    # excluded-by-cap outcome must be observable: zero pairs among the dups
    df_out = spec.spark_fn(spark, tmp)
    dup_pairs = df_out.filter("doc_id_1 >= 100000 AND doc_id_2 < 200000").count()
    assert dup_pairs == 0, "size-21 bucket must be cap-excluded at N=621"
    assert_query_matches(spark, spec.spark_fn, spec.oracle, tmp, spec.name)


def test_heterogeneous_json_schema_infer_matches_oracle(spark, tmp_path):
    """Adversarial props payloads for q103: the engines do NOT extract
    identical text for JSON numbers (DuckDB json_extract_string normalizes
    1e3 -> '1000.0' and >53-bit integers to lossy double text; Spark's
    get_json_object preserves Jackson's rendering), so the classification
    and ndv must be VALUE-based to hash-match. The corpus props is
    homogeneous small integers — without this, the divergent classes
    (exponent form, >2^53 ints, floats, booleans, nulls, containers,
    numeric-looking strings, -0.0) never execute."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from librarian_spark.sources.batch import load_table

    tmp = str(tmp_path / "hetjson")
    os.makedirs(tmp)
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    props = [
        '{"k": 1e3}',                                # exponent-form integer
        '{"k": 1000}',                               # same VALUE, plain form
        '{"k": 123456789012345678901234567}',        # >2^53 -> lossy double
        '{"k": 1e30}',                               # huge exponent form
        '{"k": 2.5, "f": -0.0}',                     # float + negative zero
        '{"f": 0.0, "b": true}',                     # -0.0 ndv fold target
        '{"b": false, "s": "42"}',                   # numeric-LOOKING string
        '{"s": "x", "n": null}',                     # plain string + null
        '{"a": [1, 2], "o": {"b": 1}}',              # containers
    ]
    extra = spark.createDataFrame(
        [
            (999950 + i, "2024-02-01 00:00:00", 1234, "view", 1.0, p)
            for i, p in enumerate(props)
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    staging = f"{tmp}/_staging"
    ev.unionByName(extra).coalesce(1).write.mode("overwrite").parquet(staging)
    shutil.move(glob.glob(f"{staging}/part-*.parquet")[0], f"{tmp}/events.parquet")
    shutil.rmtree(staging)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{tmp}/{t}.parquet")
    spec = SPECS["q103_json_schema_infer"]
    assert_query_matches(spark, spec.spark_fn, spec.oracle, tmp, spec.name)
