"""Unit tests for the round-11 operators beyond the oracle harness: the
streaming near-dup gate's cross-batch state, the per-domain cap's
bottom-N-by-hash mechanism, and the mergeable sample-quantile rollup's
error envelope."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from librarian_spark.operators.pipeline import neardup_gate_stream
from librarian_spark.operators.registry import load_all
from librarian_spark.operators.text import _CAP_N
from librarian_spark.sources.batch import load_table


def _md5_32(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)


def _stamp_new_files(in_dir: str, seen: set, stamp: float) -> None:
    """Pin mtimes per WRITE: FileStreamSource orders batches by mtime, and
    two fast back-to-back writes can tie at ms granularity — making any
    intermediate-version assertion order-flaky. Call after each write with
    an increasing stamp; ``seen`` accumulates already-stamped files."""
    import os

    for f in os.listdir(in_dir):
        if f.endswith(".parquet") and f not in seen:
            os.utime(os.path.join(in_dir, f), (stamp, stamp))
            seen.add(f)


def test_neardup_gate_drops_cross_batch_near_duplicate(spark, tmp_path):
    """A near-identical copy arriving in a LATER micro-batch must be dropped
    by band-bucket state carried across batches — the property that
    distinguishes the stateful gate from per-batch dedup."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from a warm windowsill and the rain taps softly on the glass"
    )
    rows = [
        (1, base, "en", "s0"),
        (2, "completely unrelated text about distributed query planning "
            "and shuffle partitioning strategies at petabyte scale", "en", "s0"),
        # batch 2: doc 900 = near-dup of doc 1 (one word changed), 901 unique,
        # 902 shingle-less (under 3 tokens -> sentinel bucket, vacuously kept)
        (900, base.replace("rain", "wind"), "en", "s1"),
        (901, "a third document entirely about sourdough starters and "
              "long slow fermentation schedules for the weekend baker", "en", "s1"),
        (902, "too short", "en", "s1"),
    ]
    in_dir = str(tmp_path / "in")
    for lo, hi in ((0, 2), (2, 5)):
        spark.createDataFrame(
            rows[lo:hi], "doc_id long, text string, lang string, source string"
        ).coalesce(1).write.mode("append").parquet(in_dir)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    neardup_gate_stream(spark, in_dir, out, ckpt)
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == {1, 2, 901, 902}, kept


def test_neardup_gate_registry_run_drops_planted_dups(spark, sf_dir):
    """On the organic corpus the gate must keep strictly fewer docs than the
    corpus (the planted near-dup pairs collide) and never keep both members
    of an exact-duplicate text pair."""
    specs = load_all()
    kept_df = specs["pipeline_stream_neardup_gate"].spark_fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    kept = kept_df.count()
    assert 0 < kept < n_docs, (kept, n_docs)
    # no two kept docs share identical text (exact dup = jaccard 1.0, every
    # band collides, the larger id must have been gated)
    dup_texts = (
        docs.join(kept_df.select("doc_id"), "doc_id")
        .groupBy("text")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup_texts == 0


def test_domain_cap_keeps_bottom_n_by_hash(spark, sf_dir):
    """Independent-mechanism check: per source the kept set must be exactly
    the _CAP_N smallest (md5_32(doc_id), doc_id) keys, with ranks 1..n."""
    specs = load_all()
    out = specs["text_domain_cap"].spark_fn(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    by_src: dict[str, list] = {}
    for r in docs:
        by_src.setdefault(r.source, []).append(r.doc_id)
    expect = {}
    for src, ids in by_src.items():
        ranked = sorted(ids, key=lambda d: (_md5_32(d), d))[:_CAP_N]
        expect[src] = {d: i + 1 for i, d in enumerate(ranked)}
    got: dict[str, dict] = {}
    for r in out:
        got.setdefault(r.source, {})[r.doc_id] = r.rank
    assert got == expect


def test_sample_quantile_rollup_envelope(spark, sf_dir):
    """The sketch stays within a sane error envelope for a 64-point sample and
    the ALL row's sample is exactly the merged bottom-k."""
    specs = load_all()
    rows = {r.o_orderpriority: r for r in
            specs["q113_sample_quantile_rollup"].spark_fn(spark, sf_dir).collect()}
    assert "ALL" in rows
    n_groups = len(rows) - 1
    assert n_groups >= 2
    for g, r in rows.items():
        assert r.n_sample <= 64
        assert r.p50_exact_cents > 0 and r.p75_exact_cents >= r.p50_exact_cents
        # 64-point sample: p50 standard error ~6% of rank; 40% value error is
        # the generous deterministic ceiling for this corpus + fixed hash
        assert r.err50_milli <= 400, (g, r)
        assert r.err75_milli <= 400, (g, r)
    # the merged estimate must come from sketch contents: recompute bottom-k
    # of the union of per-group bottom-k in python and compare p50 pick
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).collect()
    per_group: dict[str, list] = {}
    for r in orders:
        vc = int(round(r.o_totalprice * 100))
        per_group.setdefault(r.o_orderpriority, []).append(
            (_md5_32(r.o_orderkey), r.o_orderkey, vc)
        )
    union = []
    for vals in per_group.values():
        union.extend(sorted(vals)[:64])
    merged = sorted(union)[:64]
    sample = sorted((vc, k) for _h, k, vc in merged)
    n = len(sample)
    import math

    p50 = sample[math.ceil(0.5 * n) - 1][0]
    p75 = sample[math.ceil(0.75 * n) - 1][0]
    assert rows["ALL"].p50_est_cents == p50
    assert rows["ALL"].p75_est_cents == p75


def test_stream_quantile_sketch_order_independent(spark, tmp_path):
    """The bottom-k sample state must be identical for ANY arrival order —
    the mergeability property that makes the oracle a pure batch replay.
    Drive the same rows in forward and reverse file order and require
    identical final emissions."""
    from librarian_spark.operators.pipeline import stream_quantile_sketch

    rows = [(i, "a" if i % 2 else "b", float(i % 37)) for i in range(1, 201)]

    def run(order, tag):
        in_dir = str(tmp_path / f"in_{tag}")
        for lo, hi in order:
            spark.createDataFrame(
                rows[lo:hi], "event_id long, event_type string, value double"
            ).coalesce(1).write.mode("append").parquet(in_dir)
        out, ckpt = str(tmp_path / f"out_{tag}"), str(tmp_path / f"ckpt_{tag}")
        stream_quantile_sketch(spark, in_dir, out, ckpt)
        from pyspark.sql import functions as F

        final = (
            spark.read.parquet(out)
            .groupBy("event_type")
            .agg(
                F.max_by(
                    F.struct(
                        "n_seen", "n_sample", "p50_est_cents", "p75_est_cents"
                    ),
                    F.col("n_seen"),
                ).alias("s"),
            )
            .select("event_type", "s.*")
        )
        return {tuple(r) for r in final.collect()}

    fwd = run([(0, 100), (100, 200)], "fwd")
    rev = run([(100, 200), (0, 100)], "rev")
    assert fwd == rev and len(fwd) == 2


def test_stream_domain_cap_evicts_on_late_smaller_hash(spark, tmp_path):
    """A later-arriving doc with a smaller hash must EVICT an earlier
    admission — the cap's contract is the current bottom-N registry, not
    first-come-first-kept."""
    from librarian_spark.operators.pipeline import stream_domain_cap

    ids = list(range(1, 21))
    by_hash = sorted(ids, key=lambda d: (_md5_32(d), d))
    n = 2
    winners = set(by_hash[:n])
    # batch 1 = the docs that should ultimately LOSE, batch 2 = the winners:
    # forces admissions in batch 1 that batch 2 must evict
    losers = [d for d in ids if d not in winners]
    rows1 = [(d, f"text {d}", "en", "s0") for d in losers]
    rows2 = [(d, f"text {d}", "en", "s0") for d in sorted(winners)]
    in_dir = str(tmp_path / "in")
    import time

    seen: set = set()
    for i, rows in enumerate((rows1, rows2)):
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        ).coalesce(1).write.mode("append").parquet(in_dir)
        _stamp_new_files(in_dir, seen, time.time() + i)
    reg, ckpt = str(tmp_path / "reg"), str(tmp_path / "ckpt")
    stream_domain_cap(spark, in_dir, reg, ckpt, n, 4)
    import os

    vs = sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(reg) if d.startswith("v=")
    )
    final = {r.doc_id for r in spark.read.parquet(f"{reg}/v={vs[-1]}").collect()}
    assert final == winners, (final, winners)
    # and the intermediate version shows the batch-1 admissions that lost
    mid = {r.doc_id for r in spark.read.parquet(f"{reg}/v={vs[0]}").collect()}
    assert mid == set(sorted(losers, key=lambda d: (_md5_32(d), d))[:n])


def test_neardup_gate_resumes_from_checkpoint_mid_drain(spark, tmp_path):
    """Kill the gate after the first micro-batch, restart against the same
    checkpoint + registry, and require the final kept set to equal an
    uninterrupted run's — the registry read must resume from the durable
    version, not recompute or double-apply batch 0."""
    from librarian_spark.operators.pipeline import neardup_gate_stream

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from a warm windowsill and the rain taps softly on the glass"
    )
    rows = [
        (1, base, "en", "s0"),
        (2, "completely unrelated text about distributed query planning "
            "and shuffle partitioning strategies at petabyte scale", "en", "s0"),
        (900, base.replace("rain", "wind"), "en", "s1"),
        (901, "a third document entirely about sourdough starters and "
              "long slow fermentation schedules for the weekend baker", "en", "s1"),
    ]
    import time

    def stage(tag):
        in_dir = str(tmp_path / f"in_{tag}")
        seen: set = set()
        for i, (lo, hi) in enumerate(((0, 2), (2, 4))):
            spark.createDataFrame(
                rows[lo:hi],
                "doc_id long, text string, lang string, source string",
            ).coalesce(1).write.mode("append").parquet(in_dir)
            _stamp_new_files(in_dir, seen, time.time() + i)
        return in_dir

    # uninterrupted reference run
    in_ref = stage("ref")
    out_ref, ck_ref = str(tmp_path / "out_ref"), str(tmp_path / "ck_ref")
    neardup_gate_stream(spark, in_ref, out_ref, ck_ref)
    ref = {r.doc_id for r in spark.read.parquet(out_ref).collect()}

    # interrupted run: first invocation sees ONLY file 1 (stage the second
    # file after), so the stream drains batch 0 and stops at a durable
    # checkpoint; the second invocation must resume, not reprocess
    in_dir = str(tmp_path / "in_cut")
    seen: set = set()
    spark.createDataFrame(
        rows[0:2], "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("append").parquet(in_dir)
    _stamp_new_files(in_dir, seen, time.time())
    out, ck = str(tmp_path / "out_cut"), str(tmp_path / "ck_cut")
    neardup_gate_stream(spark, in_dir, out, ck)
    mid_batches = set(spark.read.parquet(out).select("batch_id").distinct().toPandas()["batch_id"])
    spark.createDataFrame(
        rows[2:4], "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("append").parquet(in_dir)
    _stamp_new_files(in_dir, seen, time.time() + 5)
    neardup_gate_stream(spark, in_dir, out, ck)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == ref, (got, ref)
    # batch 0's partition was written once and not overwritten on resume
    all_batches = set(spark.read.parquet(out).select("batch_id").distinct().toPandas()["batch_id"])
    assert mid_batches < all_batches
