"""Unit tests for the LLM-pipeline operators beyond the oracle harness:
recall/precision of the approximate methods vs the exact ones, and the
multimodal stub's byte-stat correctness."""

from __future__ import annotations

from librarian_spark.operators.dedup import (
    dedup_simhash,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)
from librarian_spark.operators.multimodal import (
    decode_stub,
    extract_features,
    ingest_binary,
)
from librarian_spark.operators.similarity import sim_ann_lsh, sim_cosine_topk


def test_minhash_lsh_recall(spark, sf_dir):
    """LSH candidates must cover every exact near-dup pair (j >= 0.5) — at these
    similarities the banded miss probability is negligible, so full recall is a
    deterministic property of the fixed hash family on this corpus."""
    exact = {
        (r.doc_id_1, r.doc_id_2)
        for r in ngram_jaccard_pairs(spark, sf_dir, 0.5).collect()
    }
    cands = {
        (r.doc_id_1, r.doc_id_2)
        for r in minhash_lsh_candidates(spark, sf_dir).collect()
    }
    assert exact, "corpus should contain planted near-dup pairs"
    missed = exact - cands
    assert not missed, f"LSH missed near-dup pairs: {sorted(missed)[:5]}"


def test_simhash_finds_near_dups(spark, sf_dir):
    """Hamming-close simhash pairs should overlap heavily with exact near-dups."""
    exact = {
        (r.doc_id_1, r.doc_id_2)
        for r in ngram_jaccard_pairs(spark, sf_dir, 0.8).collect()
    }
    sh = {
        (r.doc_id_1, r.doc_id_2) for r in dedup_simhash(spark, sf_dir).collect()
    }
    assert exact
    recall = len(exact & sh) / len(exact)
    assert recall >= 0.8, f"simhash recall too low: {recall:.2f}"


def test_ann_lsh_structural_contract(spark, sf_dir):
    """ANN results must be a subset of brute-force scores (the re-rank is exact
    cosine, so every (query, neighbor, score) it emits must appear in the full
    scored set), and it must actually prune. Recall on this corpus is expectedly
    modest — the embeddings are uniform random, below the LSH noise floor."""
    from pyspark.sql import functions as F

    from librarian_spark.functions.vector import as_double, cosine

    ann = sim_ann_lsh(spark, sf_dir).collect()
    assert ann, "ANN returned nothing"
    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", as_double("embedding").alias("v"))
    )
    qs = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    full = {
        (r.query_id, r.neighbor_id): r.score
        for r in e.join(qs, e.vec_id != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("score"),
        )
        .collect()
    }
    for r in ann:
        assert full[(r.query_id, r.neighbor_id)] == r.score
    # pruning: per query, ANN considered far fewer than all candidates — so some
    # true top-5 neighbors are missed on uniform data; the operator still returns
    # exactly TOPK rows per query it scored.
    per_query = {}
    for r in ann:
        per_query.setdefault(r.query_id, []).append(r.rn)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_query.values())


def test_ann_lsh_buckets_collide_for_near_duplicates(spark):
    """Property test of the bucketing itself: near-identical vectors must land in
    probe-adjacent buckets almost always. Uses planted vectors (the corpus has no
    high-cosine pairs, so this is the only way to exercise the near-dup regime)."""
    import random

    from pyspark.sql import functions as F

    from librarian_spark.operators.similarity import _N_PLANES, lsh_bucket

    rng = random.Random(7)
    rows = []
    for i in range(100):
        base = [rng.gauss(0, 1) for _ in range(64)]
        jitter = [x + rng.gauss(0, 0.02) for x in base]  # cosine ≈ 0.9998
        rows.append((2 * i, base))
        rows.append((2 * i + 1, jitter))
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    b = df.withColumn("bucket", lsh_bucket(F.col("v"))).collect()
    buckets = {r.vec_id: r.bucket for r in b}
    hits = 0
    for i in range(100):
        h = bin(buckets[2 * i] ^ buckets[2 * i + 1]).count("1")
        hits += h <= 1  # same bucket or reachable via one probe flip
    assert hits >= 95, f"near-identical vectors separated by LSH: {hits}/100"


def test_multimodal_feature_extract_matches_python(spark, sf_dir):
    """The mapInPandas pipeline must produce exactly what the stub computes
    driver-side — validates Arrow batch flow, schema, and null handling."""
    feats = {r.doc_id: r for r in extract_features(ingest_binary(spark, sf_dir)).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    for row in docs.limit(20).collect():
        expected = decode_stub(row.text.encode("utf-8"))
        got = feats[row.doc_id]
        assert got.n_bytes == expected["n_bytes"]
        assert abs(got.byte_mean - expected["byte_mean"]) < 1e-12
        assert list(got.byte_hist) == expected["byte_hist"]
        assert got.decoder == "stub-v1"


def test_ivf_structural_contract(spark, sf_dir):
    """IVF results: exact-cosine scores (within the 6-digit rounding grain of
    the numpy-vs-JVM summation difference), ≤ top-k rows per query, every query
    covered, and neighbors drawn only from probed inverted lists (a strict
    subset of the full candidate set — the pruning contract)."""
    from pyspark.sql import functions as F

    from librarian_spark.functions.vector import as_double, cosine
    from librarian_spark.operators.similarity import sim_ivf_topk

    ivf = sim_ivf_topk(spark, sf_dir).collect()
    assert ivf, "IVF returned nothing"
    per_query = {}
    for r in ivf:
        per_query.setdefault(r.query_id, []).append(r)
    assert len(per_query) == 20
    assert all(len(v) <= 5 for v in per_query.values())
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", as_double("embedding").alias("v")
    )
    qs = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    full = {
        (r.query_id, r.neighbor_id): r.score
        for r in e.join(qs, e.vec_id != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("score"),
        )
        .collect()
    }
    for r in ivf:
        assert abs(full[(r.query_id, r.neighbor_id)] - r.score) <= 1e-6


def test_hll_sketch_estimates_close_to_exact(spark, sf_dir):
    """q42: each per-group HLL estimate must sit within the Datasketches error
    envelope of the exact distinct count, and the union-merged estimate within
    the same envelope of the global exact count."""
    from librarian_spark.operators.registry import load_all

    rows = load_all()["q42_hll_sketch"].spark_fn(spark, sf_dir).collect()
    per_group = [r for r in rows if r.o_orderpriority != "ALL"]
    assert per_group
    for r in per_group:
        assert abs(r.estimate - r.exact_distinct) <= max(
            3, 0.05 * r.exact_distinct
        ), r
    merged = [r for r in rows if r.o_orderpriority == "ALL"]
    assert len(merged) == 1
    exact_all = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert abs(merged[0].estimate - exact_all) <= max(3, 0.05 * exact_all)


def test_ivf_persisted_index_matches_inflight_and_prunes(spark, sf_dir, tmp_path):
    """sim_ivf_index_topk: same results as the in-flight IVF operator (same
    centroid rule, same probing), and the probe scan must actually prune
    unprobed list partitions from the file listing."""
    from librarian_spark.operators.similarity import (
        _IVF_NLISTS,
        build_ivf_index,
        ivf_index_topk,
        sim_ivf_topk,
    )
    from pyspark.sql import functions as F

    idx = str(tmp_path / "ivf_idx")
    build_ivf_index(spark, sf_dir, idx)
    got = {
        (r.query_id, r.neighbor_id, r.score, r.rn)
        for r in ivf_index_topk(spark, idx).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.score, r.rn)
        for r in sim_ivf_topk(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0

    # partition pruning at rest: the list filter must plan as a PARTITION
    # filter on the layout (pruned before file listing), not a data filter
    from librarian_spark.plans.introspect import formatted_plan

    lists = spark.read.parquet(idx + "/lists")
    plan = formatted_plan(lists.filter(F.col("list_id") == 0))
    assert "PartitionFilters" in plan and "list_id" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    # and the layout really is multi-partition (so the filter prunes)
    dirs = {
        f.split("list_id=")[1].split("/")[0] for f in lists.inputFiles()
    }
    assert len(dirs) == _IVF_NLISTS


def test_kmeans_clusters_deterministic_and_complete(spark, sf_dir):
    """sim_kmeans_clusters: deterministic fixed-point Lloyd's ⇒ identical
    assignment across runs; every vector assigned; k clusters used;
    distances non-negative."""
    from librarian_spark.operators.registry import load_all

    spec = load_all()["sim_kmeans_clusters"]
    a = {(r.vec_id, r.cluster, r.dist_micro)
         for r in spec.spark_fn(spark, sf_dir).collect()}
    b = {(r.vec_id, r.cluster, r.dist_micro)
         for r in spec.spark_fn(spark, sf_dir).collect()}
    assert a == b
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len({v for v, _, _ in a}) == n
    assert len({c for _, c, _ in a}) == 8
    assert all(d >= 0 for _, _, d in a)


def test_cosine_pairs_chunked_broadcast_exact(spark, sf_dir):
    """The chunked-broadcast path (bounded driver memory for corpora beyond
    chunk_rows) must emit exactly the same pair set as the single-broadcast
    path — each pair once, same rounded scores."""
    from librarian_spark.operators.similarity import _PAIR_THRESHOLD, cosine_pairs
    from librarian_spark.sources.batch import load_table

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    whole = {
        (r.vec_id_1, r.vec_id_2, r.score)
        for r in cosine_pairs(e, _PAIR_THRESHOLD).collect()
    }
    chunked = [
        (r.vec_id_1, r.vec_id_2, r.score)
        for r in cosine_pairs(e, _PAIR_THRESHOLD, chunk_rows=150).collect()
    ]
    assert len(chunked) == len(set(chunked)), "chunking duplicated pairs"
    assert set(chunked) == whole


def test_scd2_intervals_partition_the_timeline(spark, sf_dir):
    """Formulation-independent SCD2 contract: per key, versions are dense
    (1..n), intervals chain exactly (valid_to == next valid_from), and there
    is exactly one open (is_current) version — the last one."""
    from librarian_spark.operators.registry import load_all

    df = load_all()["cdc_scd2"].spark_fn(spark, sf_dir)
    rows = df.collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.user_id, []).append(r)
    assert by_key
    for _uid, vs in by_key.items():
        vs.sort(key=lambda r: r.version)
        assert [v.version for v in vs] == list(range(1, len(vs) + 1))
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from
            assert not a.is_current
        assert vs[-1].is_current and vs[-1].valid_to is None


def test_cms_heavy_hitters_never_undercount_and_cover_truth(spark, sf_dir):
    """Count-min property: every estimate >= its true count (the sketch only
    over-counts), so the shortlist must CONTAIN every true heavy hitter —
    the guarantee that makes a sketch-only deployment safe."""
    from librarian_spark.operators.registry import REGISTRY
    from librarian_spark.operators.text import _CMS_T  # noqa: PLC2701

    rows = REGISTRY["text_heavy_hitters"].spark_fn(spark, sf_dir).collect()
    assert rows, "no heavy hitters found at all"
    assert all(r.est_count >= r.true_count for r in rows)
    assert all(r.overestimate == r.est_count - r.true_count for r in rows)
    # every true-heavy gram must be in the shortlist: its estimate >= its
    # true count >= T, so the filter cannot have dropped it
    assert all(r.est_count >= _CMS_T for r in rows)
    assert any(r.is_true_heavy for r in rows)


def test_bloom_candidates_superset_of_truth(spark, sf_dir):
    """Bloom filters have no false negatives: every doc with a TRUE eval-gram
    overlap must appear in the candidate output, and candidate counts bound
    true counts from above. False positives must exist at this m (that is
    what makes the exact-verify stage observably load-bearing)."""
    from librarian_spark.operators.registry import REGISTRY

    rows = REGISTRY["dedup_bloom"].spark_fn(spark, sf_dir).collect()
    assert rows
    assert all(r.n_candidate_grams >= r.n_true_grams for r in rows)
    assert any(r.n_candidate_grams > r.n_true_grams for r in rows), (
        "no bloom false positives — m is too large for the verify stage to matter"
    )
    assert any(r.is_contaminated for r in rows)


def test_pagerank_conserves_mass_and_is_deterministic(spark, sf_dir):
    """Fixed-point PageRank: total rank stays within the damping envelope of
    N·scale (teleport + damped redistribution; floor-division loss only
    shrinks it), every rank >= the teleport floor, and a re-run is
    bit-identical (the determinism the fixed-point design buys)."""
    from librarian_spark.operators.registry import REGISTRY
    from librarian_spark.operators.relational import (  # noqa: PLC2701
        _PR_BASE,
        _PR_SCALE,
    )

    spec = REGISTRY["graph_pagerank"]
    rows = {r.part: r.rank_scaled for r in spec.spark_fn(spark, sf_dir).collect()}
    assert rows
    n = len(rows)
    total = sum(rows.values())
    assert all(v >= _PR_BASE for v in rows.values())
    # mass: at stationarity total ≈ n·scale; with integer floors it can only
    # fall below, never exceed
    assert total <= n * _PR_SCALE
    assert total >= int(n * _PR_SCALE * 0.9)
    rows2 = {r.part: r.rank_scaled for r in spec.spark_fn(spark, sf_dir).collect()}
    assert rows == rows2


def test_ivfpq_residual_codebook_is_live(sf_dir):
    """Regression for the degenerate-codebook class: if the PQ sample ids
    overlap the IVF centroid ids, every sampled residual is exactly zero
    and the ADC stage silently no-ops (the oracle mirrors the same
    degenerate math, so parity alone cannot catch it). Derive the codebook
    exactly as the operator does and assert it carries real signal."""
    import numpy as np
    import pyarrow.parquet as pq

    from librarian_spark.operators.similarity import (  # noqa: PLC2701
        _IVF_NLISTS,
        _PQ_K,
    )

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    t = t.sort_values("vec_id")
    ids = t["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    mat /= np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    cmat = mat[ids < _IVF_NLISTS]
    sample = mat[(ids >= _IVF_NLISTS) & (ids < _IVF_NLISTS + _PQ_K)]
    assert len(sample) == _PQ_K
    rcbm = sample - cmat[np.argmax(sample @ cmat.T, axis=1)]
    norms = np.sqrt((rcbm * rcbm).sum(axis=1))
    # every codebook entry must be a genuinely nonzero residual
    assert (norms > 1e-6).all(), norms


def test_connected_components_labels_are_valid(spark, sf_dir):
    """CC invariants: every label ≤ its node id (min-propagation only lowers),
    every label IS a node in the same component, and a re-run is identical."""
    from librarian_spark.operators.registry import load_all

    spec = load_all()["graph_connected_components"]
    rows = {r.part: r.component for r in spec.spark_fn(spark, sf_dir).collect()}
    assert rows
    assert all(lbl <= node for node, lbl in rows.items())
    # every label is a real node of the graph (min over reachable ids) —
    # NOT root self-labeling, which only holds after convergence and the
    # operator deliberately runs a FIXED round count
    assert set(rows.values()) <= set(rows.keys())
    rows2 = {r.part: r.component for r in spec.spark_fn(spark, sf_dir).collect()}
    assert rows == rows2


def test_bfs_levels_respect_edge_relaxation(spark, sf_dir):
    """BFS invariants: seeds are at 0, every other reached node's dist ≥ 1,
    and dist never exceeds the unrolled round count."""
    from librarian_spark.operators.registry import load_all
    from librarian_spark.operators.relational import _BFS_ITERS  # noqa: PLC2701

    spec = load_all()["graph_bfs_levels"]
    rows = {r.part: r.dist for r in spec.spark_fn(spark, sf_dir).collect()}
    assert rows
    assert all(0 <= d <= _BFS_ITERS for d in rows.values())
    assert all(d == 0 for node, d in rows.items() if node % 100 == 0)
    assert all(d >= 1 for node, d in rows.items() if node % 100 != 0)


def test_shard_manifest_conserves_docs_and_bytes(spark, sf_dir):
    """Shard packing conservation: every doc lands in exactly one shard, total
    bytes equal the corpus, shards are contiguous id ranges."""
    from librarian_spark.operators.registry import load_all
    from librarian_spark.sources.batch import load_table

    rows = sorted(
        load_all()["mm_shard_manifest"].spark_fn(spark, sf_dir).collect(),
        key=lambda r: r.shard_id,
    )
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert sum(r.n_docs for r in rows) == n_docs
    # contiguous, non-overlapping doc_id ranges in shard order
    for a, b in zip(rows, rows[1:]):
        assert a.last_doc < b.first_doc
    # BYTE conservation: shards partition the corpus payload exactly
    from librarian_spark.operators.multimodal import ingest_binary

    corpus_bytes = (
        ingest_binary(spark, sf_dir)
        .selectExpr("sum(meta.n_bytes) AS b")
        .collect()[0]["b"]
    )
    assert sum(r.total_bytes for r in rows) == corpus_bytes
    assert all(r.total_bytes > 0 for r in rows)


def test_equi_depth_buckets_differ_by_at_most_one(spark, sf_dir):
    """NTILE parity invariant: bucket sizes differ by ≤ 1 and partition the
    corpus."""
    from librarian_spark.operators.registry import load_all
    from librarian_spark.sources.batch import load_table

    rows = load_all()["q70_equi_depth_histogram"].spark_fn(spark, sf_dir).collect()
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert sum(sizes) == load_table(spark, sf_dir, "events").count()


def test_quarantine_partition_conserves_rows(spark, sf_dir):
    """DLQ split conservation: clean + quarantined = source, statuses and
    reasons consistent."""
    from librarian_spark.operators.registry import load_all
    from librarian_spark.sources.batch import load_table

    df = load_all()["pipeline_quarantine"].spark_fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == load_table(spark, sf_dir, "events").count()
    for r in rows:
        assert (r.status == "quarantined") == (r.reason is not None)


def test_minhash_index_add_then_compact_probe_invariant(spark, sf_dir, tmp_path):
    """Index lifecycle invariants: (1) an incremental add leaves MORE than
    one file in touched bucket dirs and compaction restores exactly one;
    (2) probe results are IDENTICAL before and after compaction (compaction
    moves bytes, never content)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from librarian_spark.operators.dedup import (
        _IDX_QUERY_MOD,
        build_minhash_index,
        minhash_index_add,
        minhash_index_compact,
        minhash_index_probe,
    )
    from librarian_spark.sources.batch import load_table

    idx = str(tmp_path / "mhidx")
    d = load_table(spark, sf_dir, "documents")
    build_minhash_index(spark, sf_dir, idx, docs=d.filter(F.col("doc_id") % 3 != 1))
    minhash_index_add(spark, sf_dir, idx, d.filter(F.col("doc_id") % 3 == 1))

    def files_per_bucket():
        out = {}
        for b in glob.glob(f"{idx}/bands/bucket=*"):
            out[os.path.basename(b)] = len(glob.glob(f"{b}/*.parquet"))
        return out

    before = files_per_bucket()
    assert max(before.values()) > 1, before  # the add actually appended

    queries = d.filter(F.col("doc_id") % _IDX_QUERY_MOD == 0)
    probe_before = sorted(
        tuple(r) for r in minhash_index_probe(spark, sf_dir, idx, queries).collect()
    )
    assert probe_before  # non-degenerate: the probe finds pairs

    minhash_index_compact(spark, idx)
    after = files_per_bucket()
    assert after and max(after.values()) == 1, after
    probe_after = sorted(
        tuple(r) for r in minhash_index_probe(spark, sf_dir, idx, queries).collect()
    )
    assert probe_before == probe_after


def _pillow_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_decode_image_gate_without_pillow():
    """The optional-dependency gate must be LOUD: no pillow → a
    NotImplementedError naming the dependency and the fallback, never a
    silent byte-level fake standing in for pixels."""
    import pytest as _pytest

    if _pillow_available():
        _pytest.skip("pillow present — the absence gate is not exercisable")
    from librarian_spark.operators.multimodal import decode_image

    with _pytest.raises(NotImplementedError, match="pillow"):
        decode_image(b"\x89PNG\r\n\x1a\n")


def test_resize_images_real_path(spark):
    """Pillow-present twin of mm_resize: real PNGs through the same
    mapInPandas plumbing — schema, batch shape, and thumbnail bound all
    hold on actual pixels. Skips where the dependency is absent."""
    import pytest as _pytest

    if not _pillow_available():
        _pytest.skip("pillow not installed in this container")
    import io

    from PIL import Image

    from librarian_spark.operators.multimodal import decode_image, resize_images

    def png(w, h, color):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), color).save(buf, "PNG")
        return buf.getvalue()

    rows = [(1, png(640, 480, (200, 10, 10))), (2, png(32, 32, (10, 200, 10)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in resize_images(df, max_px=64).collect()}
    assert out[1].width == 64 and out[1].height == 48  # aspect preserved
    assert (out[2].width, out[2].height) == (32, 32)  # never upscaled
    meta = decode_image(bytes(out[1].thumb))
    assert (meta["width"], meta["height"]) == (64, 48)


def test_wap_failed_audit_leaves_live_untouched(spark, sf_dir, tmp_path):
    """WAP negative path: a failing audit must abort the publish, remove its
    staging dir, and leave the previously-published version byte-identical."""
    import glob
    import os

    import pytest as _pytest

    from pyspark.sql import functions as F

    from librarian_spark.operators.pipeline import write_audit_publish
    from librarian_spark.sources.batch import load_table

    dest = str(tmp_path / "table")
    d = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    write_audit_publish(spark, d, dest, audits=[("ok", lambda x: x.count() > 0)])
    published = sorted(os.listdir(dest))
    n0 = spark.read.parquet(dest).count()

    with _pytest.raises(RuntimeError, match="always_fails"):
        write_audit_publish(
            spark,
            d.filter(F.col("o_orderkey") % 2 == 0),  # a would-be v2
            dest,
            audits=[("always_fails", lambda x: False)],
        )
    assert sorted(os.listdir(dest)) == published  # live version untouched
    assert spark.read.parquet(dest).count() == n0
    # the only version dir left is the live symlink's target — the failed
    # publish's staging was cleaned up, and the publish itself is an atomic
    # link flip (dest is a current-pointer symlink)
    assert os.path.islink(dest)
    live_target = os.readlink(dest)
    others = [p for p in glob.glob(f"{dest}.v-*")
              if os.path.basename(p) != live_target]
    assert not others, others

    # an audit that RAISES (not just returns False) must also clean up
    with _pytest.raises(ValueError, match="boom"):
        write_audit_publish(
            spark, d, dest,
            audits=[("raiser", lambda x: (_ for _ in ()).throw(ValueError("boom")))],
        )
    others = [p for p in glob.glob(f"{dest}.v-*")
              if os.path.basename(p) != live_target]
    assert not others, others
    assert spark.read.parquet(dest).count() == n0


def test_row_level_delete_rewrites_only_touched_files(spark, sf_dir):
    """Copy-on-write delete invariant: files outside the deleted key band
    keep their original names (never rewritten); only intersecting files
    are replaced, and the deleted band is gone from the read-back."""
    from librarian_spark.operators.registry import load_all
    from librarian_spark.sources.batch import load_table

    df = load_all()["pipeline_row_level_delete"].spark_fn(spark, sf_dir)
    files = df.inputFiles()
    originals = [f for f in files if "/rewrite-" not in f]
    rewrites = [f for f in files if "/rewrite-" in f]
    assert originals, files  # pruning spared most files
    assert rewrites, files  # and the touched band was actually rewritten
    assert len(rewrites) < len(originals)
    n_after = df.count()
    n_src = load_table(spark, sf_dir, "orders").count()
    assert 0 < n_after < n_src  # something deleted, table not emptied


def test_mips_norm_augmentation_reduction():
    """The docstring-level MIPS→cosine reduction sim_mips_topk relies on for
    indexing at scale, pinned numerically: augmenting corpus vectors with
    sqrt(M²−‖x‖²) (queries with 0) makes nearest-by-L2 in the augmented
    space identical to maximum-inner-product in the original space."""
    import numpy as np

    rng = np.random.default_rng(7)
    corpus = rng.normal(size=(200, 16)) * rng.uniform(0.2, 3.0, size=(200, 1))
    queries = rng.normal(size=(10, 16))
    norms = np.linalg.norm(corpus, axis=1)
    m = norms.max()
    aug_c = np.hstack([corpus, np.sqrt(m * m - norms**2)[:, None]])
    aug_q = np.hstack([queries, np.zeros((len(queries), 1))])
    for qi in range(len(queries)):
        by_dot = np.argsort(-(corpus @ queries[qi]), kind="stable")
        d2 = ((aug_c - aug_q[qi]) ** 2).sum(axis=1)
        by_l2 = np.argsort(d2, kind="stable")
        assert (by_dot[:10] == by_l2[:10]).all()


def test_bloom_index_scans_fewer_files(spark, sf_dir):
    """Bloom sidecar invariant: the probe's scan plans over a strict subset
    of the 16-file layout (the op itself raises if pruning never bites),
    and every probed key is found exactly once."""
    from librarian_spark.operators.registry import load_all

    df = load_all()["pipeline_bloom_index"].spark_fn(spark, sf_dir)
    assert 0 < len(df.inputFiles()) < 16, df.inputFiles()
    rows = df.collect()
    keys = [r.o_orderkey for r in rows]
    assert len(keys) == len(set(keys))  # no duplicates through the probe
    assert 0 < len(keys) <= 8


def test_semantic_clusters_empty_centroids_returns_empty(spark, tmp_path):
    """Degenerate-embeddings guard: with no vec_id below the centroid cut
    the operator must return an empty frame (matching the oracle's zero
    rows), not crash on np.stack of an empty centroid table."""
    import shutil

    from pyspark.sql import functions as F

    from librarian_spark.operators.dedup import _SEM_CLUSTERS
    from librarian_spark.operators.registry import load_all
    from librarian_spark.sources.batch import load_table

    tmp = str(tmp_path / "no_centroids")
    import glob
    import os

    os.makedirs(tmp)
    e = load_table(spark, "/root/testdata/sf0.001", "embeddings").withColumn(
        "vec_id", F.col("vec_id") + _SEM_CLUSTERS  # shift past the cut
    )
    staging = f"{tmp}/_staging"
    e.coalesce(1).write.mode("overwrite").parquet(staging)
    shutil.move(
        glob.glob(f"{staging}/part-*.parquet")[0], f"{tmp}/embeddings.parquet"
    )
    shutil.rmtree(staging)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{tmp}/{t}.parquet")
    df = load_all()["dedup_semantic_clusters"].spark_fn(spark, tmp)
    assert df.count() == 0
    assert df.columns == ["vec_id", "cluster_id", "keep"]


def test_tar_shard_builder_readback_and_ustar_arithmetic():
    """The tar writer must produce a REAL archive: read it back with tarfile
    and check member names/order/payloads round-trip, and that the byte size
    equals what the ustar format requires (512 header + 512-padded payload
    per member + 1024 end marker, padded to the 10240 record size) — the
    same arithmetic the registry oracle recomputes in SQL."""
    import hashlib
    import io
    import tarfile

    import pandas as pd

    from librarian_spark.operators.multimodal import tar_shard_builder

    payloads = [b"x" * 48, b"y" * 511, b"z" * 513, b""]
    pdf = pd.DataFrame(
        {
            "shard_id": [7] * 4,
            "doc_id": [30, 10, 20, 40],  # unsorted on purpose
            "payload": payloads,
            "nb": [len(p) for p in payloads],
        }
    )
    out = tar_shard_builder(emit_bytes=True)(pdf)
    assert out["n_members"].iloc[0] == 4
    assert out["payload_bytes"].iloc[0] == sum(len(p) for p in payloads)

    expected = sum(512 + ((len(p) + 511) // 512) * 512 for p in payloads)
    expected = ((expected + 1024 + 10239) // 10240) * 10240
    assert out["tar_bytes"].iloc[0] == expected

    raw = out["tar"].iloc[0]
    assert len(raw) == expected
    with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
        members = tf.getmembers()
        names = [m.name for m in members]
        # doc_id-sorted member order, zero-padded sortable names
        assert names == sorted(names)
        assert [int(n.split(".")[0]) for n in names] == [10, 20, 30, 40]
        by_doc = dict(zip(pdf["doc_id"], pdf["payload"]))
        for m in members:
            body = tf.extractfile(m).read()
            assert body == by_doc[int(m.name.split(".")[0])]
        assert all(m.mtime == 0 and m.uid == 0 for m in members)
    assert (
        out["members_md5"].iloc[0]
        == hashlib.md5("\n".join(names).encode()).hexdigest()
    )


def test_tar_shards_agree_with_shard_manifest(spark, sf_dir):
    """mm_tar_shards and mm_shard_manifest must describe the SAME packing:
    per shard, member count == doc count and payload bytes == total bytes."""
    from librarian_spark.operators.registry import load_all

    specs = load_all()
    tar = {
        r.shard_id: (r.n_members, r.payload_bytes)
        for r in specs["mm_tar_shards"].spark_fn(spark, sf_dir).collect()
    }
    man = {
        r.shard_id: (r.n_docs, r.total_bytes)
        for r in specs["mm_shard_manifest"].spark_fn(spark, sf_dir).collect()
    }
    assert tar == man


def test_webdataset_index_offsets_slice_the_real_tar(spark, sf_dir):
    """The OPERATOR's offsets must land exactly on each member's payload in
    the REAL archive: run mm_webdataset_index over the corpus, rebuild one
    shard's tar with the production writer from the operator's own shard
    assignment, then recover every payload by slicing
    raw[data_offset : data_offset + n_bytes] at the offsets THE OPERATOR
    emitted (not a local re-derivation of the arithmetic — a wrong window
    frame or shard drift in the Spark expressions must fail here)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from librarian_spark.operators.multimodal import (
        ingest_binary,
        tar_shard_builder,
    )
    from librarian_spark.operators.registry import load_all

    idx = load_all()["mm_webdataset_index"].spark_fn(spark, sf_dir)
    # the busiest shard exercises the longest offset chain
    shard = (
        idx.groupBy("shard_id").count().orderBy(F.desc("count"), "shard_id")
        .first()["shard_id"]
    )
    rows = {r.doc_id: r for r in idx.filter(F.col("shard_id") == shard).collect()}
    payloads = {
        r.doc_id: bytes(r.payload)
        for r in ingest_binary(spark, sf_dir)
        .filter(F.col("doc_id").isin(*rows))
        .collect()
    }
    assert set(payloads) == set(rows)
    pdf = pd.DataFrame(
        {
            "shard_id": [shard] * len(rows),
            "doc_id": list(payloads),
            "payload": list(payloads.values()),
            "nb": [len(p) for p in payloads.values()],
        }
    )
    raw = tar_shard_builder(emit_bytes=True)(pdf)["tar"].iloc[0]
    for doc_id, r in rows.items():
        assert r.n_bytes == len(payloads[doc_id])
        assert (
            raw[r.data_offset : r.data_offset + r.n_bytes] == payloads[doc_id]
        ), f"operator offset wrong for doc {doc_id}"
        assert r.data_offset == r.header_offset + 512


def test_modularity_invariants(spark, sf_dir):
    """Newman's Q recovered from the exact-integer scaled contributions must
    be a valid modularity (in [-0.5, 1]) and the community node/degree/edge
    totals must conserve the whole graph."""
    from librarian_spark.operators.registry import load_all
    from librarian_spark.operators.relational import _lpa_labels

    rows = load_all()["graph_modularity"].spark_fn(spark, sf_dir).collect()
    ed, labels = _lpa_labels(spark, sf_dir)
    e2 = ed.count()
    assert sum(r.degree_sum for r in rows) == e2  # every edge end counted
    assert sum(r.n_nodes for r in rows) == labels.count()
    assert sum(r.internal_edges for r in rows) <= e2
    q = sum(r.contribution_scaled for r in rows) / (e2 * e2)
    assert -0.5 <= q <= 1.0


def test_rank_tau_bounds_and_exact_control(spark, sf_dir):
    """tau_milli must lie in [-1000, 1000]; concordant+discordant must equal
    n_pairs = n_common*(n_common-1)/2; and every query's common set is at
    most k."""
    from librarian_spark.operators.registry import load_all

    rows = load_all()["sim_rank_tau"].spark_fn(spark, sf_dir).collect()
    assert rows, "at least one query must share candidates with exact"
    for r in rows:
        assert 1 <= r.n_common <= 5
        assert r.n_pairs == r.n_common * (r.n_common - 1) // 2
        assert r.concordant + r.discordant == r.n_pairs
        assert -1000 <= r.tau_milli <= 1000


def test_tokenizer_fertility_counts_multi_piece_words(spark):
    """The synthetic corpus is single-piece-per-word (fertility exactly
    1000), so oracle parity never exercises segmentation — pin the real
    behavior on punctuation/mixed-class text: 'well-known' is 3 pieces,
    'a1b2' is 4, trailing '!!' is 1 extra."""
    from librarian_spark.operators.text import fertility_report

    d = spark.createDataFrame(
        [
            # 3 words -> pieces: [well][-][known] [a][1][b][2] [ok][!!] = 9
            ("en", "well-known a1b2 ok!!"),
            # 2 words, no punctuation -> 2 pieces (the degenerate case)
            ("de", "zwei worte"),
        ],
        "lang string, text string",
    )
    rows = {r.lang: r for r in fertility_report(d).collect()}
    assert rows["en"].total_words == 3
    assert rows["en"].total_pieces == 9
    assert rows["en"].fertility_milli == 3000
    assert rows["de"].fertility_milli == 1000


def test_phash_guaranteed_band_and_recall(spark):
    """Radius-1 probes over 16-bit slices catch EVERY pair with hamming <= 7
    by pigeonhole (12 errors over 4 disjoint slices leave some slice with
    <= 1 — at <= 7 it's guaranteed; the second rotated table only adds).
    Assert that deterministic guarantee plus a recall floor at the <= 12
    verify threshold vs brute force, at sf0.01 where all pairs fit."""
    import numpy as np

    from librarian_spark.operators.multimodal import (
        _PHASH_MAX_HAMMING,
        ingest_binary,
        phash_candidates,
        phash_codes,
    )

    sf = "/root/testdata/sf0.01"
    hashed = phash_codes(
        ingest_binary(spark, sf).select("doc_id", "payload")
    ).cache()
    pdf = hashed.select("doc_id", "h_lo", "h_hi").toPandas()
    ids = pdf["doc_id"].to_numpy()
    codes = (
        pdf["h_lo"].to_numpy().astype(np.uint64)
        | (pdf["h_hi"].to_numpy().astype(np.uint64) << np.uint64(32))
    )
    # brute-force hamming over all pairs (500 docs -> 125k pairs)
    x = codes[:, None] ^ codes[None, :]
    ham = np.zeros_like(x, dtype=np.int64)
    for _ in range(64):
        ham += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    ii, jj = np.nonzero(ham <= _PHASH_MAX_HAMMING)
    truth = {
        (int(min(ids[a], ids[b])), int(max(ids[a], ids[b])), int(ham[a, b]))
        for a, b in zip(ii, jj)
        if ids[a] < ids[b]
    }
    cands = {
        (r.doc_id_1, r.doc_id_2)
        for r in phash_candidates(hashed).collect()
    }
    guaranteed = {(a, b) for a, b, h in truth if h <= 7}
    missed_guaranteed = guaranteed - cands
    assert not missed_guaranteed, f"pigeonhole band missed: {missed_guaranteed}"
    all_true = {(a, b) for a, b, _ in truth}
    assert all_true, "corpus should contain hamming<=12 pairs"
    recall = len(all_true & cands) / len(all_true)
    assert recall >= 0.6, f"phash recall too low at <=12: {recall:.2f}"


def test_phash_candidate_growth_subquadratic(spark, tmp_path):
    """The r7 design keyed candidates on a fixed 2048-bucket domain ->
    O(N^2/2048) join rows on ANY data (measured 10.66x wall at 10x organic).
    Pin the redesign's scaling: candidate JOIN ROWS (the work metric,
    pre-distinct) must grow subquadratically between sf0.1 and 10x organic
    replicas (non-near-duplicate text). Quadratic growth would be ~100x;
    the permuted-table + cap construction measured 52x."""
    from pyspark.sql import functions as F

    from librarian_spark.operators.multimodal import (
        ingest_binary,
        phash_candidates,
        phash_codes,
    )

    sf = "/root/testdata/sf0.1"
    base = ingest_binary(spark, sf).select("doc_id", "payload")
    n1 = phash_candidates(phash_codes(base), distinct=False).count()

    # organic 10x: scale_cliff's consonant rotation — replicas are NOT
    # near-duplicates, so growth measures collision structure, not dups
    alphabet = "etaonisrhl"
    docs = _t_docs(spark, sf)
    reps = [docs]
    for r in range(1, 10):
        rot = alphabet[r:] + alphabet[:r]
        reps.append(
            docs.withColumn("text", F.translate("text", alphabet, rot))
            .withColumn("doc_id", F.col("doc_id") + F.lit(r * 10_000_000))
        )
    big = reps[0]
    for rep in reps[1:]:
        big = big.unionByName(rep)
    payloads = big.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    n10 = phash_candidates(phash_codes(payloads), distinct=False).count()
    growth = n10 / max(n1, 1)
    assert growth < 80, (
        f"candidate rows grew {growth:.0f}x at 10x organic data "
        f"({n1} -> {n10}) — quadratic regime"
    )


def test_simhash_guaranteed_band_and_recall(spark):
    """Radius-2 probes over 4x16-bit slices catch EVERY pair with
    hamming <= 11 by pigeonhole (>= 3 errors in all 4 disjoint slices means
    hamming >= 12), so the declared radius 8 is fully covered — modulo the
    hot-bucket cap. A pair survives the cap at position p iff its slice-ham
    there is <= 2 AND at least one side's (p, slice) bucket is <= the cap
    (the probe from the other side reaches it). Assert vs brute force at
    sf0.01: every non-cap-excused pair is found (the deterministic
    guarantee), the misses are EXACTLY the cap-excused set (which the
    oracle replays bit-for-bit), and that set is a tiny fraction."""
    import collections

    import numpy as np

    from librarian_spark.operators.dedup import (
        _SIMHASH_CAP_DIV,
        _SIMHASH_CAP_MIN,
        _SIMHASH_MAX_HAMMING,
        simhash_candidates,
        simhash_codes,
    )

    sf = "/root/testdata/sf0.01"
    hashed = simhash_codes(spark, sf).cache()
    pdf = hashed.toPandas()
    ids = pdf["doc_id"].to_numpy()
    codes = (
        pdf["fp_lo"].to_numpy().astype(np.uint64)
        | (pdf["fp_hi"].to_numpy().astype(np.uint64) << np.uint64(32))
    )
    slices = {int(d): s for d, s in zip(pdf["doc_id"], pdf["slices"])}
    bucket = collections.Counter(
        (p, s) for sl in pdf["slices"] for p, s in enumerate(sl)
    )
    x = codes[:, None] ^ codes[None, :]
    ham = np.zeros_like(x, dtype=np.int64)
    for _ in range(64):
        ham += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    ii, jj = np.nonzero(ham <= _SIMHASH_MAX_HAMMING)
    truth = {
        (int(min(ids[a], ids[b])), int(max(ids[a], ids[b])))
        for a, b in zip(ii, jj)
        if ids[a] < ids[b]
    }
    assert truth, "corpus should contain hamming<=8 pairs"

    cap = max(_SIMHASH_CAP_MIN, len(ids) // _SIMHASH_CAP_DIV)

    def reachable(d1, d2):
        for p in range(len(slices[d1])):
            s1, s2 = slices[d1][p], slices[d2][p]
            if bin(s1 ^ s2).count("1") <= 2 and (
                bucket[(p, s1)] <= cap or bucket[(p, s2)] <= cap
            ):
                return True
        return False

    excused = {pr for pr in truth if not reachable(*pr)}
    got = {
        (r.doc_id_1, r.doc_id_2)
        for r in simhash_candidates(hashed).collect()
    }
    missed = truth - got
    assert missed == excused, (
        f"non-cap-excused pairs missed: {sorted(missed - excused)[:5]}"
    )
    # precision is 1.0 by construction (exact popcount verify in the join)
    assert got <= truth
    assert len(excused) <= 0.02 * len(truth), (
        f"cap excuses too much: {len(excused)}/{len(truth)}"
    )


def test_simhash_candidate_growth_subquadratic(spark):
    """The r8 design keyed candidates on a fixed 2048-bucket domain ->
    O(N^2/2048) join rows on ANY data, and 8 radius-0 blocks only guaranteed
    hamming <= 7 against a declared radius of 8. Pin the redesign's scaling:
    candidate JOIN ROWS (the work metric, pre-distinct) must grow
    subquadratically between sf0.1 and 10x organic replicas
    (non-near-duplicate text). Quadratic growth would be ~100x."""
    from pyspark.sql import functions as F

    from librarian_spark.operators.dedup import (
        simhash_candidates,
        simhash_codes,
    )
    from librarian_spark.sources.batch import fan_out

    sf = "/root/testdata/sf0.1"
    n1 = simhash_candidates(simhash_codes(spark, sf), distinct=False).count()

    alphabet = "etaonisrhl"
    docs = _t_docs(spark, sf)
    reps = [docs]
    for r in range(1, 10):
        rot = alphabet[r:] + alphabet[:r]
        reps.append(
            docs.withColumn("text", F.translate("text", alphabet, rot))
            .withColumn("doc_id", F.col("doc_id") + F.lit(r * 10_000_000))
        )
    big = reps[0]
    for rep in reps[1:]:
        big = big.unionByName(rep)
    from librarian_spark.operators.dedup import _simhash_map

    n10 = simhash_candidates(_simhash_map(fan_out(big)), distinct=False).count()
    growth = n10 / max(n1, 1)
    assert growth < 80, (
        f"candidate rows grew {growth:.0f}x at 10x organic data "
        f"({n1} -> {n10}) — quadratic regime"
    )


def _t_docs(spark, sf):
    from librarian_spark.sources.batch import load_table

    return load_table(spark, sf, "documents").select("doc_id", "text")


def test_dedup_embedding_candidate_recall(spark):
    """dedup_embedding's sqrt(N)-list candidates vs the exact cosine>=0.35
    edge set: precision must be EXACTLY 1.0 (every emitted pair is
    exact-verified inside its list), and recall must clear the floor the
    default nprobe was chosen for (measured 271/271 = 100% at sf0.01 with
    nprobe=8 even on this worst-case corpus — uniform-random embeddings put
    every edge at the noise floor; the full curve lives at _EMB_NPROBE)."""
    from librarian_spark.operators.dedup import (
        _EMB_THRESHOLD,
        _emb_candidate_pairs,
    )
    from librarian_spark.operators.similarity import cosine_pairs
    from librarian_spark.sources.batch import load_table

    sf = "/root/testdata/sf0.01"
    e = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    exact = {
        (r.vec_id_1, r.vec_id_2)
        for r in cosine_pairs(e, _EMB_THRESHOLD).collect()
    }
    got = {
        (r.vec_id_1, r.vec_id_2)
        for r in _emb_candidate_pairs(spark, e).collect()
    }
    assert exact, "corpus should contain pairs at the threshold"
    assert got <= exact, f"false positives: {sorted(got - exact)[:5]}"
    recall = len(exact & got) / len(exact)
    assert recall >= 0.95, f"candidate recall too low: {recall:.2f}"
    # the nprobe knob is the documented recall/cost lever — pin that the
    # curve actually bends (fewer probed lists => strictly less recall on
    # this noise-floor corpus), so the override path can't silently rot
    low = {
        (r.vec_id_1, r.vec_id_2)
        for r in _emb_candidate_pairs(spark, e, nprobe=2).collect()
    }
    assert low <= exact
    assert len(low) < len(got), (
        f"nprobe=2 should recall strictly less: {len(low)} vs {len(got)}"
    )


# --------------------------------------------------------------------------
# round-8 operators: property pins beyond the oracle harness
# --------------------------------------------------------------------------


def test_dedup_paragraph_nonvacuous_and_bounded(spark, sf_dir):
    """The chunk-level dedup must actually FIND duplicated chunks on this
    corpus (small-vocab word soup guarantees 4-token collisions) and its
    fractions must be consistent: dup chunks <= chunks, milli in [0, 1000],
    keep == (dup_milli < 500)."""
    from librarian_spark.operators.dedup import dedup_paragraph

    rows = dedup_paragraph(spark, sf_dir).collect()
    assert rows
    assert any(r.n_dup_chunks > 0 for r in rows), "no duplicated chunks found"
    assert any(not r.keep for r in rows), "gate never fired"
    for r in rows:
        assert 0 <= r.n_dup_chunks <= r.n_chunks
        assert 0 <= r.dup_milli <= 1000
        assert r.keep == (r.dup_milli < 500)


def test_winnowing_guarantee_and_density(spark, tmp_path):
    """The winnowing contract (SIGMOD 2003): two documents sharing a
    substring of length >= K+W-1 = 8 chars MUST share at least one selected
    fingerprint, and selection density sits near the expected 2/(W+1)."""
    from librarian_spark.operators.text import text_winnow_fingerprint

    shared = "identical shared passage of text"
    docs = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"wholly different prefix {shared} and suffix words"),
        (3, "no overlap with anything else at all here"),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    out = {r.doc_id: r for r in text_winnow_fingerprint(spark, sf).collect()}
    # digest certifies the selection SET, but the guarantee needs the sets
    # themselves — recompute selections locally with the same formula
    def winnow(text: str, k: int = 5, w: int = 4) -> set[tuple[int, int]]:
        t = text.strip().lower()
        hs = []
        for i in range(len(t) - k + 1):
            h = 0
            for c in t[i : i + k]:
                h = (h * 31 + ord(c)) % 1_000_000_007
            hs.append(h)
        m = len(hs)
        if m == 0:
            return set()
        nw = 1 if m < w else m - w + 1
        span = min(w, m)
        sel = set()
        for j in range(1, nw + 1):
            code = min(hs[j - 1 + i - 1] * 8 + 7 - i for i in range(1, span + 1))
            p = j + 6 - (code % 8)
            sel.add((p, hs[p - 1]))
        return sel

    s1, s2, s3 = (winnow(d[1]) for d in docs)
    shared_fps = {h for _, h in s1} & {h for _, h in s2}
    assert shared_fps, "winnowing guarantee violated: shared >=8-char run"
    # spark output agrees with the local replay (count + digest)
    for doc_id, sel in ((1, s1), (2, s2), (3, s3)):
        assert out[doc_id].n_selected == len(sel)
        assert out[doc_id].winnow_digest == sum(h for _, h in sel)
        # density near 2/(w+1) = 0.4 — generous envelope for short docs
        assert 200 <= out[doc_id].density_milli <= 700


def test_kmv_estimate_quality(spark, sf_dir):
    """KMV with k=64 has RSE ~ 1/sqrt(k-2) ~ 12.7%; on the testdata groups
    (hundreds-to-thousands of distinct users each) every estimate should
    land well inside 4 sigma, and groups with < k distinct hashes must be
    EXACT (the sketch saw everything)."""
    from librarian_spark.operators.relational import q107_kmv_distinct

    rows = q107_kmv_distinct(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.n_exact < 64:
            assert r.kmv_est == r.n_exact, r
        else:
            assert abs(r.kmv_est - r.n_exact) <= 0.51 * r.n_exact, r


def test_hubness_slots_conserved(spark, sf_dir):
    """Every (query, rank) slot lands on exactly one neighbor: the histogram
    must account for all |Q|*k slots."""
    from librarian_spark.operators.similarity import (
        _HUB_K,
        _HUB_QUERIES,
        sim_hubness,
    )

    rows = sim_hubness(spark, sf_dir).collect()
    assert sum(r.k_occ * r.n_neighbors for r in rows) == _HUB_QUERIES * _HUB_K


def test_mm_validate_triage_categories(spark, sf_dir):
    """Fault injection must produce every non-ok category it claims, statuses
    must partition the corpus, and ok rows must really be intact."""
    from librarian_spark.operators.multimodal import (
        _VAL_MAGIC_MOD,
        _VAL_TRUNC_MOD,
        mm_validate,
    )

    rows = mm_validate(spark, sf_dir).collect()
    by = {}
    for r in rows:
        by.setdefault(r.status, []).append(r)
    assert set(by) >= {"ok", "size_mismatch", "bad_magic"}, sorted(by)
    for r in by["size_mismatch"]:
        assert r.doc_id % _VAL_TRUNC_MOD == 0
        assert r.n_bytes_actual != r.n_bytes_declared
    for r in by["bad_magic"]:
        assert r.doc_id % _VAL_MAGIC_MOD == 0
        assert r.first_byte == 0
    for r in by["ok"]:
        assert r.n_bytes_actual == r.n_bytes_declared
        assert 32 <= r.first_byte <= 126


def test_stream_cdc_apply_deletes_keys(spark, sf_dir):
    """The drained state must EXCLUDE every key whose latest change is a
    delete, and include every key whose latest change is not — the delete
    path the r/c-only snapshot-stream pipeline never exercised."""
    from pyspark.sql import functions as F

    from librarian_spark.operators.pipeline import pipeline_stream_cdc_apply
    from librarian_spark.sources.batch import load_table

    state = {r.user_id for r in pipeline_stream_cdc_apply(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    last = (
        ev.groupBy("user_id")
        .agg(
            F.max_by(
                F.col("event_type"), F.struct(F.unix_millis("ts"), F.col("event_id"))
            ).alias("last_op")
        )
        .collect()
    )
    live = {r.user_id for r in last if r.last_op != "error"}
    dead = {r.user_id for r in last if r.last_op == "error"}
    assert dead, "corpus must exercise the delete path"
    assert state == live
    assert not (state & dead)


def test_attribution_credit_conservation(spark, sf_dir):
    """Each conversion distributes exactly 1,000,000 ppm minus bounded
    truncation loss (the middle split floors); channels can only be touch
    types — a purchase is always its group's last row, never a touch."""
    from pyspark.sql import functions as F

    from librarian_spark.operators.relational import q108_attribution
    from librarian_spark.sources.batch import load_table

    rows = q108_attribution(spark, sf_dir).collect()
    assert {r.channel for r in rows} <= {"view", "click", "signup"}
    total = sum(r.credit_ppm for r in rows)
    # conversions with >= 1 touch: recompute the denominator independently
    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & (F.col("event_type") != "error")
    )
    from pyspark.sql.window import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    g = e.select(
        "user_id",
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).over(w).alias("grp"),
    ).filter(F.col("grp") >= 1)
    sizes = g.groupBy("user_id", "grp").count().filter(F.col("count") >= 2)
    n_conv = sizes.count()
    assert n_conv > 0
    # full credit per conversion, minus < 1000 ppm truncation loss each
    assert total <= 1_000_000 * n_conv
    assert total >= 1_000_000 * n_conv - 1_000 * n_conv


def test_conductance_bounds(spark, sf_dir):
    """phi in [0, 1000] by definition; the LPA partition on this graph must
    have both separated communities (phi=0 components) and leaky ones."""
    from librarian_spark.operators.relational import graph_conductance

    rows = graph_conductance(spark, sf_dir).collect()
    assert rows
    assert all(0 <= r.conductance_milli <= 1000 for r in rows)
    assert all(r.cut_edges >= 0 and r.volume >= r.n_nodes for r in rows)


def test_bitemporal_flags_late_arrivals(spark, sf_dir):
    """revised_later must fire for some keys (batch 4 exists by construction)
    and every reported row must come from an ingested batch (id % 5 <= 3)."""
    from librarian_spark.operators.relational import (
        _BT_ASOF_BATCH,
        _BT_BATCHES,
        q109_bitemporal_asof,
    )

    rows = q109_bitemporal_asof(spark, sf_dir).collect()
    assert rows
    assert any(r.revised_later for r in rows)
    assert any(not r.revised_later for r in rows)
    assert all(r.last_event_id % _BT_BATCHES <= _BT_ASOF_BATCH for r in rows)


# --------------------------------------------------------------------------
# round-9 operators: property pins beyond the oracle harness
# --------------------------------------------------------------------------


def test_assortativity_reference_graphs(spark):
    """Formula pin independent of the oracle (both engines could be wrong
    identically): a star is perfectly disassortative (r = −1 → −1000
    milli), a clique is degree-regular (zero variance → NULL), and a
    two-triangle barbell is negative but > −1."""
    from librarian_spark.operators.relational import assortativity_of

    star = spark.createDataFrame([(0, i) for i in range(1, 6)], "u long, v long")
    r = assortativity_of(star).collect()[0]
    assert (r.n_nodes, r.n_edges, r.r_milli) == (6, 5, -1000)

    clique = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)], "u long, v long"
    )
    r = assortativity_of(clique).collect()[0]
    assert r.r_milli is None

    barbell = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)],
        "u long, v long",
    )
    r = assortativity_of(barbell).collect()[0]
    assert r.r_milli is not None and -1000 < r.r_milli < 0


def test_cdc_chunking_insertion_locality(spark):
    """THE content-defined-chunking property (why it beats fixed-size
    blocks): prepending bytes to a payload re-chunks only the prefix
    neighborhood — the majority of chunk hashes survive, where fixed
    blocks would shift every boundary and lose them all."""
    import hashlib

    from librarian_spark.operators.multimodal import cdc_chunk_hashes

    # NON-periodic deterministic payload (a repeated sentence makes every
    # chunk identical — correct CDC behavior, but vacuous for this test)
    text = b"".join(
        hashlib.md5(f"cdc-{i}".encode()).digest() for i in range(200)
    )
    base = spark.createDataFrame([(1, bytearray(text))], "doc_id long, payload binary")
    shifted = spark.createDataFrame(
        [(2, bytearray(b"INSERTED-PREFIX-BYTES " + text))],
        "doc_id long, payload binary",
    )
    h1 = {r.chash for r in cdc_chunk_hashes(base).collect()}
    h2 = {r.chash for r in cdc_chunk_hashes(shifted).collect()}
    assert len(h1) >= 5, "payload should produce several distinct chunks"
    survived = len(h1 & h2)
    assert survived >= len(h1) - 2, (
        f"only {survived}/{len(h1)} distinct chunks survived a prefix insertion"
    )


def test_kmv_set_ops_estimates_track_exact(spark, sf_dir):
    """Sketch-derived union/intersection estimates must stay inside the
    KMV error envelope of the exact counts they estimate (k=64 → ~1/8
    relative error; assert a generous 3-sigma-ish band), and be EXACT when
    the union fits under k hashes."""
    from librarian_spark.operators.registry import load_all

    rows = load_all()["q111_kmv_set_ops"].spark_fn(spark, sf_dir).collect()
    assert rows, "events should have at least two event types"
    for r in rows:
        if r.n_exact_union <= 64:
            assert r.union_est == r.n_exact_union
            assert r.inter_est == r.n_exact_inter
        else:
            assert abs(r.union_est - r.n_exact_union) <= max(
                8, r.n_exact_union * 0.45
            )
            assert abs(r.inter_est - r.n_exact_inter) <= max(
                8, r.n_exact_union * 0.45
            )
