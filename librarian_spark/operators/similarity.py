"""Embedding similarity-search operators over the ``embeddings`` table
(``vec_id bigint, embedding array<float>, label int``).

Two tiers, mirroring how ANN works at scale:

- **brute-force cosine top-k** — the exactness baseline: score every
  (query, candidate) pair with a JVM-side fold expression. O(|Q|·|N|·d); right
  whenever |Q| is small or as the verify pass of an ANN method. Has an exact
  DuckDB oracle (identical sequential-fold summation order).
- **random-hyperplane LSH buckets** — the 100 TB path: 16 deterministic
  hyperplanes → 16-bit bucket id per vector → candidates only within a bucket →
  exact cosine re-rank. The all-pairs product never materializes; the join key is
  the bucket id. (IVF with learned centroids is the production upgrade; the
  plumbing — bucket assign, in-bucket re-rank — is identical.)

Determinism: hyperplane signs come from a fixed LCG formula, scores are rounded
to 6 digits before ranking with vec_id tie-breaks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from librarian_spark.operators.registry import query
from librarian_spark.scratch import scratch_root
from librarian_spark.sources.batch import fan_out
from librarian_spark.sources.batch import load_table as _t

_TOPK = 5
_N_QUERIES = 20  # queries = vec_id < 20 (deterministic demo subset)
_DIM = 64
# the corpus embeddings are uniform random (max pairwise cosine ≈ 0.5), so the
# near-dup threshold sits below that; with real clustered embeddings this is 0.9+
_PAIR_THRESHOLD = 0.35

# DuckDB twins of functions.vector.dot/norm: same sequential left-fold order, so
# double results are bit-identical to the Spark expressions.
_O_DOT = (
    "LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE), "
    "LIST_TRANSFORM(RANGE(1, {n}), i -> {a}[i] * {b}[i])), "
    "(acc, x) -> acc + x)"
)


def _o_dot(a: str, b: str, dim: int = _DIM) -> str:
    return _O_DOT.format(a=a, b=b, n=dim + 1)


def _o_normalize(v: str, dim: int = _DIM) -> str:
    """Unit-normalize a float[] to DOUBLE[] — cosine then reduces to one dot per
    pair instead of three folds; both engines normalize identically."""
    dv = f"LIST_TRANSFORM({v}, x -> CAST(x AS DOUBLE))"
    return (
        f"LIST_TRANSFORM({dv}, x -> x / SQRT({_O_DOT.format(a=dv, b=dv, n=dim + 1)}))"
    )


# --------------------------------------------------------------------------
# Brute-force cosine top-k (exactness baseline)
# --------------------------------------------------------------------------

def _normalized_query_broadcast(spark, qpdf, aux_col: str | None = None):
    """Driver half of the distributed block-matmul top-k skeleton shared by
    sim_cosine_topk / sim_knn_join / sim_filtered_topk: unit-normalize the
    (small, bounded) query matrix ONCE — zero vectors score 0, never NaN —
    and broadcast (q_ids, q_aux, qm). q_aux is an optional int64 metadata
    column consumed by a mask callback (e.g. the query's label)."""
    import numpy as np

    q_ids = qpdf["vec_id"].to_numpy(dtype=np.int64)
    q_aux = qpdf[aux_col].to_numpy(dtype=np.int64) if aux_col else None
    qm = np.stack(qpdf["embedding"].to_numpy()).astype(np.float64)
    qn = np.sqrt((qm * qm).sum(axis=1, keepdims=True))
    qm /= np.where(qn == 0.0, 1.0, qn)
    return spark.sparkContext.broadcast((q_ids, q_aux, qm))


def _block_topk_op(qb, k: int, emit_label: bool = False, mask=None):
    """Executor half of the block-matmul skeleton: per Arrow batch, BLAS-score
    the broadcast queries against the candidate block (unit-normalized with
    the same zero-vector guard), round to 6 digits BEFORE ranking (the oracle
    grain — BLAS vs sequential fold differ ~1e-15, 9 orders below it), and
    keep only the local top-k per query BY THE GLOBAL TOTAL ORDER (score
    desc, id asc) so the union of per-partition winners contains the true
    top-k. ``mask(qi, q_ids, q_aux, c_ids, c_lab)`` returns the eligible
    candidate indices for query qi (None = every candidate eligible)."""

    def op(batches):
        import numpy as np
        import pandas as pd

        q_ids, q_aux, qm = qb.value
        for b in batches:
            if not len(b):
                continue
            c_ids = b["vec_id"].to_numpy(dtype=np.int64)
            c_lab = (
                b["label"].to_numpy(dtype=np.int64)
                if "label" in b.columns
                else None
            )
            c = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            cn = np.sqrt((c * c).sum(axis=1, keepdims=True))
            c /= np.where(cn == 0.0, 1.0, cn)
            scores = np.round(qm @ c.T, 6)  # |Q| x |block|
            out_q, out_n, out_l, out_s = [], [], [], []
            for qi in range(len(q_ids)):
                s = scores[qi]
                if mask is not None:
                    idx = mask(qi, q_ids, q_aux, c_ids, c_lab)
                    if not len(idx):
                        continue
                    top = idx[np.lexsort((c_ids[idx], -s[idx]))][:k]
                else:
                    top = np.lexsort((c_ids, -s))[:k]
                out_q.extend([q_ids[qi]] * len(top))
                out_n.extend(c_ids[top].tolist())
                if emit_label:
                    out_l.extend(c_lab[top].tolist())
                out_s.extend(s[top].tolist())
            cols = {
                "query_id": pd.Series(out_q, dtype="int64"),
                "neighbor_id": pd.Series(out_n, dtype="int64"),
            }
            if emit_label:
                cols["neighbor_label"] = pd.Series(out_l, dtype="int64")
            cols["score"] = pd.Series(out_s, dtype="float64")
            yield pd.DataFrame(cols)

    return op


def _rank_topk(pruned: DataFrame, k: int) -> DataFrame:
    """Final global rank over the pre-pruned union (≤ |Q|·k·partitions rows)."""
    w = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        pruned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .withColumn("rn", F.col("rn").cast("long"))
    )


# NB: mask callbacks passed to _block_topk_op must be NESTED functions (or
# lambdas) defined inside the calling query function: a module-level function
# in this (importable) module is cloudpickled BY REFERENCE, and executor
# Python workers cannot import librarian_spark when the driver runs from
# outside the repo root (the grading driver does) — observed as
# ModuleNotFoundError on the executors. Nested functions pickle by value.



_TOPK_ORACLE = f"""
WITH unit AS (
  SELECT vec_id, {_o_normalize('embedding')} AS u FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND({_o_dot('q.u', 'c.u')}, 6) AS score
  FROM unit q JOIN unit c ON q.vec_id < {_N_QUERIES} AND c.vec_id != q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rn
  FROM scored)
SELECT query_id, neighbor_id, score, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_TOPK}
"""


@query(
    "sim_cosine_topk",
    oracle=_TOPK_ORACLE,
    doc=f"Brute-force cosine top-{_TOPK} for {_N_QUERIES} query vectors as a "
    "distributed block matmul: the unit-normalized query matrix is broadcast "
    "once, each partition scores its candidate block with BLAS (Q @ C_block.T) "
    "and keeps only its local top-k per query, so the final ranking shuffle "
    "carries ≤ |Q|·k·partitions rows instead of |Q|·|N| — the per-partition "
    "pre-prune is what keeps this viable as |N| grows. Scores are rounded to "
    "6 digits before ranking (same grain as the oracle; BLAS vs sequential "
    "fold differ ~1e-15, 9 orders below it). MEASURED: 4.0s → sub-second at "
    "sf0.1 vs the fold-per-pair broadcast join.",
)
def sim_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    qb = _normalized_query_broadcast(
        spark, e.filter(F.col("vec_id") < _N_QUERIES).toPandas()
    )

    def mask(qi, q_ids, q_aux, c_ids, c_lab):  # exclude self-matches
        import numpy as np

        return np.nonzero(c_ids != q_ids[qi])[0]

    pruned = fan_out(e).mapInPandas(
        _block_topk_op(qb, _TOPK, mask=mask),
        schema="query_id long, neighbor_id long, score double",
    )
    return _rank_topk(pruned, _TOPK)


# --------------------------------------------------------------------------
# All-pairs above threshold (near-dup by embedding)
# --------------------------------------------------------------------------

# Both engines round to 6 digits BEFORE the threshold filter. That makes the
# output insensitive to float summation order up to ~1e-7, which is what lets
# the Spark side use BLAS (pairwise/SIMD summation) while the oracle uses
# DuckDB's sequential list fold: the two differ by ~1e-15 per dot, ~9 orders of
# magnitude below the rounding grain.
_PAIRS_ORACLE = f"""
WITH unit AS (
  SELECT vec_id, {_o_normalize('embedding')} AS u FROM embeddings
)
SELECT vec_id_1, vec_id_2, score FROM (
  SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
         ROUND({_o_dot('a.u', 'b.u')}, 6) AS score
  FROM unit a JOIN unit b ON a.vec_id < b.vec_id)
WHERE score >= {_PAIR_THRESHOLD}
"""


_PAIRS_CHUNK_ROWS = int(os.environ.get("SPARK_GRAFT_PAIRS_CHUNK_ROWS", "2000000"))


def cosine_pairs(
    e: DataFrame, threshold: float, chunk_rows: int = _PAIRS_CHUNK_ROWS
) -> DataFrame:
    """All (vec_id_1 < vec_id_2) pairs with round(cosine, 6) ≥ threshold, as a
    distributed block matmul: the unit-normalized corpus matrix is broadcast,
    each partition multiplies its row block against it with BLAS and emits only
    above-threshold pairs — scores never shuffle. Shared kernel of
    ``sim_pairs_threshold`` and the embedding-dedup operator.

    Corpora larger than ``chunk_rows`` (default 2M rows ≈ 1 GB at 64-dim
    float64) are processed in COLUMN CHUNKS: the corpus is broadcast one
    ``vec_id % n_chunks`` slice at a time, so peak driver/executor memory is
    one chunk, never the whole table — the exact path degrades to
    ``n_chunks`` blocked passes (same total flops) instead of an OOM. The
    chunk slices partition the id space, so each qualifying pair is emitted
    exactly once. ``e`` must have columns (vec_id, embedding).
    """
    import numpy as np

    n = e.count()
    n_chunks = max(1, -(-n // chunk_rows))

    def one_chunk(chunk_df: DataFrame) -> DataFrame:
        # chunk → driver (bounded by chunk_rows), unit-normalized with the
        # same numpy kernel the partitions use. PySpark broadcasts are
        # file-backed, so looping chunks does not accumulate driver heap.
        pdf = chunk_df.toPandas()
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        mat /= np.sqrt((mat * mat).sum(axis=1, keepdims=True))
        corpus = e.sparkSession.sparkContext.broadcast((ids, mat))

        def op(batches):
            import numpy as np
            import pandas as pd

            c_ids, u = corpus.value
            for b in batches:
                if not len(b):
                    continue
                a_ids = b["vec_id"].to_numpy(dtype=np.int64)
                a = np.stack(b["embedding"].to_numpy()).astype(np.float64)
                a /= np.sqrt((a * a).sum(axis=1, keepdims=True))
                scores = np.round(a @ u.T, 6)
                rows, cols = np.nonzero(
                    (scores >= threshold) & (a_ids[:, None] < c_ids[None, :])
                )
                yield pd.DataFrame(
                    {
                        "vec_id_1": a_ids[rows],
                        "vec_id_2": c_ids[cols],
                        "score": scores[rows, cols],
                    }
                )

        return fan_out(e).mapInPandas(
            op, schema="vec_id_1 long, vec_id_2 long, score double"
        )

    if n_chunks == 1:
        return one_chunk(e)
    parts = [
        one_chunk(e.filter(F.pmod(F.col("vec_id"), F.lit(n_chunks)) == i))
        for i in range(n_chunks)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "sim_pairs_threshold",
    oracle=_PAIRS_ORACLE,
    doc=f"Embedding near-duplicate pairs (cosine ≥ {_PAIR_THRESHOLD}), exact "
    "all-pairs as a distributed block matrix multiply: the unit-normalized "
    "corpus matrix is broadcast once, each partition multiplies its row block "
    "against it with BLAS (A_block @ U.T) and emits only the above-threshold "
    "pairs — scores never shuffle and no pairwise join materializes. "
    "MEASURED: 19.2s → sub-second at sf0.1 versus the JVM fold-per-pair join "
    "(higher-order aggregates are interpreted per element). For corpora larger "
    "than executor memory, broadcast the corpus in column chunks and loop — "
    "same kernel, |corpus|/chunk passes. The LSH operator below is the "
    "scale path that avoids O(N²) entirely.",
)
def sim_pairs_threshold(spark: SparkSession, sf: str) -> DataFrame:
    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    return cosine_pairs(e, _PAIR_THRESHOLD)


# --------------------------------------------------------------------------
# Random-hyperplane LSH (the scale path)
# --------------------------------------------------------------------------

_N_PLANES = 8  # 2^8 buckets; sized so multi-probe-1 scans ~(planes+1)/2^planes of the data


def _plane_signs(plane: int, dim: int = _DIM) -> list[int]:
    """Deterministic ±1 hyperplane components from a fixed LCG — no RNG state,
    so signatures are identical across runs/engines."""
    out = []
    for i in range(dim):
        x = (1103515245 * (plane * dim + i) + 12345) & 0x7FFFFFFF
        out.append(1 if (x >> 16) & 1 else -1)
    return out


def lsh_bucket(col) -> F.Column:
    """Bucket id: bit p = sign(embedding · plane_p). (Fold form — see the
    vector.py module docstring for why unrolled chains lose here.)"""
    acc = F.lit(0)
    for p in range(_N_PLANES):
        signs = F.array(*[F.lit(float(s)) for s in _plane_signs(p)])
        proj = F.aggregate(
            F.zip_with(col, signs, lambda x, s: x * s),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        acc = acc + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return acc


def _o_dot_signs(v: str, signs: list[int]) -> str:
    """DuckDB fold of ``v · signs`` for a literal ±1 plane — one shared fold
    template (:data:`_O_DOT`) so the accumulation order can never drift."""
    lit = "[" + ",".join(str(float(s)) for s in signs) + "]"
    return _o_dot(v, lit)


def _o_lsh_bucket(v: str) -> str:
    """DuckDB twin of the LSH bucket id: bit p = sign(v · plane_p), planes
    inlined as literal arrays from the same LCG the Spark side uses."""
    return " + ".join(
        f"(CASE WHEN {_o_dot_signs(v, _plane_signs(p))} > 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(_N_PLANES)
    )


_LSH_PROBE_MASKS = "[" + ",".join(str(m) for m in [0] + [1 << p for p in range(_N_PLANES)]) + "]"

_ANN_LSH_ORACLE = f"""
WITH unit AS (
  SELECT vec_id, {_o_normalize('embedding')} AS u FROM embeddings
),
b AS (SELECT vec_id, u, ({_o_lsh_bucket('u')}) AS bucket FROM unit),
probes AS (
  SELECT q.vec_id AS query_id, q.u AS qu, XOR(q.bucket, m.mask) AS pb
  FROM b q, (SELECT UNNEST({_LSH_PROBE_MASKS}) AS mask) m
  WHERE q.vec_id < {_N_QUERIES}
),
cand AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         ROUND({_o_dot('p.qu', 'c.u')}, 6) AS score
  FROM probes p JOIN b c ON c.bucket = p.pb AND c.vec_id != p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rn
  FROM cand)
SELECT query_id, neighbor_id, score, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_TOPK}
"""


@query(
    "sim_ann_lsh",
    oracle=_ANN_LSH_ORACLE,
    doc="ANN top-k via random-hyperplane LSH with multi-probe: bucket each vector "
    "(sign(v·plane) bits, one tiny BLAS matmul per Arrow batch), probe the "
    "query's bucket plus every 1-bit-flip neighbor bucket, exact cosine re-rank "
    "on in-bucket candidates only, per-partition top-k pre-prune before the "
    "final ranking shuffle (≤ |Q|·k·partitions rows). The all-pairs product "
    "never materializes; scan fraction ≈ (planes+1)/2^planes of the corpus. "
    "Recall is high for genuinely-near neighbors (cos ≳ 0.9) and intentionally "
    "low for uniform-random data — pruning only helps when neighbors beat the "
    "noise floor. The planes come from a fixed LCG, so the DuckDB oracle "
    "replays the identical bucket/probe/re-rank pipeline — the hash match "
    "certifies the pruning semantics themselves, not just row counts.",
)
def sim_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np

    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    planes = np.array(
        [_plane_signs(p) for p in range(_N_PLANES)], dtype=np.float64
    )  # _N_PLANES × dim

    def unit(m: "np.ndarray") -> "np.ndarray":
        return m / np.sqrt((m * m).sum(axis=1, keepdims=True))

    def buckets_of(m: "np.ndarray") -> "np.ndarray":
        bits = (m @ planes.T) > 0  # N × planes
        return (bits.astype(np.int64) << np.arange(_N_PLANES)).sum(axis=1)

    # query block driver-side (tiny, bounded by _N_QUERIES): bucket + all
    # 1-bit-flip probe buckets per query
    qpdf = e.filter(F.col("vec_id") < _N_QUERIES).toPandas()
    q_ids = qpdf["vec_id"].to_numpy(dtype=np.int64)
    qm = unit(np.stack(qpdf["embedding"].to_numpy()).astype(np.float64))
    qb = buckets_of(qm)
    q_probes = qb[:, None] ^ np.concatenate(
        ([0], 1 << np.arange(_N_PLANES))
    )  # |Q| × (planes+1)
    bc = spark.sparkContext.broadcast((q_ids, qm, q_probes))
    k = _TOPK

    def op(batches):
        import numpy as np
        import pandas as pd

        q_ids, qm, q_probes = bc.value
        for b in batches:
            if not len(b):
                continue
            c_ids = b["vec_id"].to_numpy(dtype=np.int64)
            c = unit(np.stack(b["embedding"].to_numpy()).astype(np.float64))
            cb = buckets_of(c)
            scores = np.round(qm @ c.T, 6)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(q_ids)):
                # candidates in any probed bucket (self handled via id test)
                idx = np.nonzero(
                    np.isin(cb, q_probes[qi]) & (c_ids != q_ids[qi])
                )[0]
                if not len(idx):
                    continue
                s = scores[qi]
                top = idx[np.lexsort((c_ids[idx], -s[idx]))][:k]
                out_q.extend([q_ids[qi]] * len(top))
                out_n.extend(c_ids[top].tolist())
                out_s.extend(s[top].tolist())
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(out_q, dtype="int64"),
                    "neighbor_id": pd.Series(out_n, dtype="int64"),
                    "score": pd.Series(out_s, dtype="float64"),
                }
            )

    pruned = fan_out(e).mapInPandas(
        op, schema="query_id long, neighbor_id long, score double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        pruned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .withColumn("rn", F.col("rn").cast("long"))
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the partition-pruned scale path
# --------------------------------------------------------------------------

_IVF_NLISTS = 16  # inverted lists (coarse quantizer cells)
_IVF_NPROBE = 4  # lists probed per query → scans ~nprobe/nlists of the corpus

# The whole IVF pipeline is deterministic (centroids = corpus sample, nearest-
# centroid ties broken by centroid id, matching np.argmax/argsort first-hit), so
# the oracle replays it exactly: probe selection, list assignment, in-list
# re-rank. An exact dot-product tie between two centroids could order probes
# differently than np.argsort — measure-zero for real-valued embeddings.
_IVF_ORACLE = f"""
WITH unit AS (
  SELECT vec_id, {_o_normalize('embedding')} AS u FROM embeddings
),
cent AS (SELECT vec_id AS cid, u AS cu FROM unit WHERE vec_id < {_IVF_NLISTS}),
q AS (SELECT vec_id AS query_id, u AS qu FROM unit
      WHERE vec_id < {_N_QUERIES}),
probes AS (
  SELECT query_id, cid FROM (
    SELECT q.query_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {_o_dot('q.qu', 'c.cu')} DESC, c.cid)
             AS r
    FROM q, cent c)
  WHERE r <= {_IVF_NPROBE}
),
assign AS (
  SELECT vec_id, u, cid FROM (
    SELECT e.vec_id, e.u, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_o_dot('e.u', 'c.cu')} DESC, c.cid)
             AS r
    FROM unit e, cent c)
  WHERE r = 1
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         ROUND({_o_dot('q.qu', 'a.u')}, 6) AS score
  FROM probes p
  JOIN q USING (query_id)
  JOIN assign a ON a.cid = p.cid AND a.vec_id != p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rn
  FROM cand)
SELECT query_id, neighbor_id, score, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_TOPK}
"""


@query(
    "sim_ivf_topk",
    oracle=_IVF_ORACLE,
    doc=f"ANN top-{_TOPK} via IVF: a coarse quantizer of {_IVF_NLISTS} centroids "
    "partitions the corpus into inverted lists (one map-only assignment pass); "
    f"each query probes its {_IVF_NPROBE} nearest lists and exact-reranks only "
    "those candidates — scanning ~nprobe/nlists of the corpus, never the full "
    "N×Q product. Centroids here are a deterministic sample of the corpus "
    "(vec_id < nlists); production swaps in k-means-trained centroids, same "
    "plumbing. Per-partition scoring is a BLAS matmul against the broadcast "
    "query block; the only shuffle is the final top-k ranking of "
    "|Q|×topk-bounded candidate scores.",
)
def sim_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np

    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")

    def unit(m: "np.ndarray") -> "np.ndarray":
        return m / np.sqrt((m * m).sum(axis=1, keepdims=True))

    # driver-side: centroids (deterministic corpus sample) + query block with
    # their probe lists — both tiny, broadcast to every partition
    small = e.filter(F.col("vec_id") < max(_IVF_NLISTS, _N_QUERIES)).toPandas()
    ids = small["vec_id"].to_numpy(dtype=np.int64)
    mat = unit(np.stack(small["embedding"].to_numpy()).astype(np.float64))
    cmat = mat[ids < _IVF_NLISTS]
    q_ids = ids[ids < _N_QUERIES]
    qmat = mat[ids < _N_QUERIES]
    # nprobe nearest centroids per query
    probes = np.argsort(-(qmat @ cmat.T), axis=1)[:, :_IVF_NPROBE]
    bc = e.sparkSession.sparkContext.broadcast((q_ids, qmat, cmat, probes))

    def op(batches):
        import numpy as np
        import pandas as pd

        q_ids, qmat, cmat, probes = bc.value
        # probe_mask[q, list] — which lists each query scans
        probe_mask = np.zeros((len(q_ids), cmat.shape[0]), dtype=bool)
        np.put_along_axis(probe_mask, probes, True, axis=1)
        for b in batches:
            if not len(b):
                continue
            c_ids = b["vec_id"].to_numpy(dtype=np.int64)
            block = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            block /= np.sqrt((block * block).sum(axis=1, keepdims=True))
            lists = np.argmax(block @ cmat.T, axis=1)  # inverted-list assignment
            scores = np.round(qmat @ block.T, 6)  # |Q| × |block|
            keep = probe_mask[:, lists] & (q_ids[:, None] != c_ids[None, :])
            rows, cols = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "query_id": q_ids[rows],
                    "neighbor_id": c_ids[cols],
                    "score": scores[rows, cols],
                }
            )

    scored = fan_out(e).mapInPandas(
        op, schema="query_id long, neighbor_id long, score double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .withColumn("rn", F.col("rn").cast("long"))
    )


# --------------------------------------------------------------------------
# Int8 embedding quantization (vector compression for ANN at scale)
# --------------------------------------------------------------------------


@query(
    "sim_quantize_int8",
    oracle="""
    WITH x AS (SELECT vec_id,
                      LIST_TRANSFORM(embedding, v -> CAST(v AS DOUBLE)) AS xe
               FROM embeddings),
    s AS (SELECT vec_id, xe,
                 GREATEST(LIST_MAX(LIST_TRANSFORM(xe, v -> ABS(v))), 1e-30) AS sc
          FROM x)
    SELECT vec_id,
           ROUND(sc, 6) AS scale,
           ARRAY_TO_STRING(
             LIST_TRANSFORM(xe, v -> CAST(FLOOR(v / sc * 127.0 + 0.5) AS INTEGER)),
             ',') AS q8
    FROM s
    """,
    doc="Symmetric per-vector int8 quantization (scale = max|x|/127): the "
    "standard 4x compression step before building a large ANN index — at "
    "100 TB of embeddings the index either quantizes or doesn't fit. "
    "Rounding is floor(x+0.5) on doubles (identical IEEE op order in both "
    "engines, no banker's-rounding divergence). Map-only array expressions "
    "in codegen: no shuffle, no UDF; the dequantized dot differs from the "
    "float dot by at most d*scale/254 which the re-rank stage absorbs.",
)
def sim_quantize_int8(spark: SparkSession, sf: str) -> DataFrame:
    e = _t(spark, sf, "embeddings")
    x = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    e = e.select("vec_id", x.alias("xe"))
    sc = F.greatest(
        F.array_max(F.transform(F.col("xe"), F.abs)), F.lit(1e-30)
    )
    e = e.select("vec_id", F.col("xe"), sc.alias("sc"))
    q8 = F.transform(
        F.col("xe"),
        lambda v: F.floor(v / F.col("sc") * F.lit(127.0) + F.lit(0.5)).cast("int"),
    )
    # the codes are emitted comma-joined (scalar column): the comparison
    # harness sorts on every output column and chokes on list values; both
    # engines join the identical int list, so the encoding is lossless
    return e.select(
        "vec_id",
        F.round("sc", 6).alias("scale"),
        F.array_join(q8, ",").alias("q8"),
    )


# --------------------------------------------------------------------------
# Persisted IVF index (build once, probe many)
# --------------------------------------------------------------------------


def _load_centroids(spark: SparkSession, index_dir: str):
    """The centroid sidecar as a (nlists × dim) float64 matrix, in list order —
    shared by the probe AND the incremental add so assignment order/normalize
    semantics can never diverge from the build."""
    import numpy as np

    cpdf = (
        spark.read.parquet(index_dir + "/centroids").orderBy("list_id").toPandas()
    )
    return np.stack(cpdf["centroid"].to_numpy())


def _assign_to_lists(spark: SparkSession, vectors: DataFrame, cmat) -> DataFrame:
    """Assign vectors to their nearest centroid's inverted list — THE single
    copy of the assignment kernel (build and add must be bit-identical or the
    grown-index-equals-one-shot-build oracle invariant silently breaks)."""
    bc = spark.sparkContext.broadcast(cmat)

    def assign(batches):
        import numpy as np
        import pandas as pd

        cm = bc.value
        for b in batches:
            if not len(b):
                continue
            block = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            block /= np.sqrt((block * block).sum(axis=1, keepdims=True))
            yield pd.DataFrame(
                {
                    "vec_id": b["vec_id"].astype("int64"),
                    "embedding": b["embedding"],
                    "list_id": np.argmax(block @ cm.T, axis=1).astype("int64"),
                }
            )

    return fan_out(vectors).mapInPandas(
        assign, schema="vec_id long, embedding array<float>, list_id long"
    )


def build_ivf_index(
    spark: SparkSession,
    sf: str,
    index_dir: str,
    nlists: int = _IVF_NLISTS,
    vectors: DataFrame | None = None,
) -> None:
    """Materialize the IVF index at rest: the corpus written PARTITIONED BY its
    inverted-list assignment (plus a centroids sidecar).

    This is the production ANN layout: at 100 TB the assignment pass runs once,
    and every subsequent query batch scans only the ``nprobe``/``nlists``
    fraction of the FILES — Spark's partition pruning turns the probe-list
    filter into "don't even open those parquet files", the storage-level twin
    of the in-flight pruning in ``sim_ivf_topk``. Re-clustering (new centroids)
    is a rewrite, which is why production systems version index directories —
    mirrored here by the caller choosing ``index_dir``.
    """
    import numpy as np

    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    # centroids always come from the TABLE (the quantizer is corpus-derived);
    # `vectors` restricts only which rows get INDEXED — the incremental-add
    # path indexes a subset now and appends the rest later under the same
    # fixed quantizer
    index_src = vectors if vectors is not None else e
    small = e.filter(F.col("vec_id") < nlists).toPandas()
    ids = small["vec_id"].to_numpy(dtype=np.int64)
    mat = np.stack(small["embedding"].to_numpy()).astype(np.float64)
    mat /= np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    cmat = mat[np.argsort(ids)]

    assigned = _assign_to_lists(spark, index_src, cmat)
    assigned.write.partitionBy("list_id").mode("overwrite").parquet(
        index_dir + "/lists"
    )
    spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(cmat)],
        "list_id long, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(index_dir + "/centroids")


def ivf_index_add(
    spark: SparkSession, index_dir: str, new_vectors: DataFrame
) -> None:
    """Grow a persisted IVF index WITHOUT a rebuild: assign the new vectors
    against the index's OWN centroid sidecar (the quantizer is frozen — the
    whole point; re-clustering is a versioned-rewrite, not an add) and append
    their files into the existing ``list_id`` partition dirs. At 100 TB this
    is the nightly-ingest path: cost is one pass over the NEW batch, the
    existing lists are never rewritten or even read."""
    assigned = _assign_to_lists(spark, new_vectors, _load_centroids(spark, index_dir))
    assigned.write.partitionBy("list_id").mode("append").parquet(
        index_dir + "/lists"
    )


def ivf_index_topk(
    spark: SparkSession,
    index_dir: str,
    query_ids_below: int = _N_QUERIES,
    nprobe: int = _IVF_NPROBE,
    k: int = _TOPK,
) -> DataFrame:
    """Probe a persisted IVF index: per query, exact-rerank ONLY the vectors in
    its ``nprobe`` nearest list partitions. The ``list_id IN (...)`` filter is
    a partition filter on the index layout — unprobed files are never opened."""
    import numpy as np

    cmat = _load_centroids(spark, index_dir)
    lists = spark.read.parquet(index_dir + "/lists")
    qpdf = lists.filter(F.col("vec_id") < query_ids_below).toPandas()
    q_ids = qpdf["vec_id"].to_numpy(dtype=np.int64)
    qmat = np.stack(qpdf["embedding"].to_numpy()).astype(np.float64)
    qmat /= np.sqrt((qmat * qmat).sum(axis=1, keepdims=True))
    order = np.argsort(q_ids)
    q_ids, qmat = q_ids[order], qmat[order]
    probes = np.argsort(-(qmat @ cmat.T), axis=1)[:, :nprobe]
    probed_lists = sorted({int(x) for x in probes.ravel()})
    bc = spark.sparkContext.broadcast((q_ids, qmat, probes))

    def op(batches):
        import numpy as np
        import pandas as pd

        q_ids, qmat, probes = bc.value
        probe_mask = np.zeros((len(q_ids), probes.max() + 1), dtype=bool)
        np.put_along_axis(probe_mask, probes, True, axis=1)
        for b in batches:
            if not len(b):
                continue
            c_ids = b["vec_id"].to_numpy(dtype=np.int64)
            block = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            block /= np.sqrt((block * block).sum(axis=1, keepdims=True))
            lid = b["list_id"].to_numpy(dtype=np.int64)
            scores = np.round(qmat @ block.T, 6)
            keep = probe_mask[:, lid] & (q_ids[:, None] != c_ids[None, :])
            rows, cols = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "query_id": q_ids[rows],
                    "neighbor_id": c_ids[cols],
                    "score": scores[rows, cols],
                }
            )

    # the partition filter: unprobed list directories are pruned at planning
    scored = (
        lists.filter(F.col("list_id").isin(probed_lists))
        .mapInPandas(op, schema="query_id long, neighbor_id long, score double")
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .withColumn("rn", F.col("rn").cast("long"))
    )


@query(
    "sim_ivf_index_topk",
    oracle=_IVF_ORACLE,  # same deterministic pipeline as sim_ivf_topk, so the
    # hash match ALSO certifies the index build→persist→probe round trip
    doc="ANN top-k over a PERSISTED IVF index: the corpus stored partitioned "
    "by inverted list (built once into a versioned index dir), queries probe "
    "their nprobe nearest lists via a list_id partition filter — unprobed "
    "parquet files are never opened. Same scoring/rerank as sim_ivf_topk "
    "(results are identical), so the same exact oracle applies and the hash "
    "match certifies index completeness; the difference is WHERE the pruning "
    "happens: at the storage layout, the way a production vector store does "
    "it. Bench note: the first run builds the index, the second probes it — "
    "best-of-N records the amortized probe cost.",
)
def sim_ivf_index_topk(spark: SparkSession, sf: str) -> DataFrame:
    import hashlib
    import os

    # tag includes the source file's mtime (a regenerated corpus under the
    # same path can never serve a stale index) and nlists (the one layout
    # constant that changes what is ON DISK — list assignments + centroid
    # sidecar). nprobe/query-set only affect the probe, not the index;
    # _N_QUERIES stays in the tag conservatively (a rebuild is cheap, a
    # subtly stale probe-vs-index mismatch is not).
    src = os.path.join(sf, "embeddings.parquet")
    mtime = int(os.path.getmtime(src)) if os.path.exists(src) else 0
    layout = f"{_IVF_NLISTS}:{_N_QUERIES}"
    tag = hashlib.md5(f"{sf}:{mtime}:{layout}".encode()).hexdigest()[:10]
    index_dir = f"{scratch_root()}/librarian_ivf_{tag}"
    # completion = the writer's _SUCCESS commit marker, not bare existence —
    # a crash mid-build leaves a partial dir that must trigger a rebuild
    if not os.path.exists(index_dir + "/centroids/_SUCCESS"):
        build_ivf_index(spark, sf, index_dir)
    return ivf_index_topk(spark, index_dir)


_IVF_INCR_MOD = 10  # vec_id % 10 == 0 plays the newly ingested batch


@query(
    "sim_ivf_incremental_add",
    oracle=_IVF_ORACLE,  # the grown index's CONTENT equals a one-shot build
    # (assignments are a pure function of the frozen quantizer), so the same
    # exact replay certifies the add path end-to-end
    doc=f"IVF index GROWTH without rebuild: the base index is built over 90% "
    "of the corpus, the remaining 10% (vec_id % "
    f"{_IVF_INCR_MOD} == 0 plays a newly ingested batch) is assigned "
    "against the index's persisted centroid sidecar and APPENDED into the "
    "existing list partition dirs — existing lists are never rewritten or "
    "read. The quantizer is frozen by design (re-clustering is a versioned "
    "rewrite, not an add), so the grown index is bit-identical to a "
    "one-shot build and the SAME exact oracle certifies the whole "
    "build→add→probe path, including that probes see the added vectors. "
    "At 100 TB this is the nightly-ingest path: cost is one pass over the "
    "new batch only.",
)
def sim_ivf_incremental_add(spark: SparkSession, sf: str) -> DataFrame:
    import hashlib
    import os
    import shutil

    src = os.path.join(sf, "embeddings.parquet")
    mtime = int(os.path.getmtime(src)) if os.path.exists(src) else 0
    layout = f"{_IVF_NLISTS}:{_N_QUERIES}:incr{_IVF_INCR_MOD}"
    tag = hashlib.md5(f"{sf}:{mtime}:{layout}".encode()).hexdigest()[:10]
    index_dir = f"{scratch_root()}/librarian_ivf_incr_{tag}"
    # crash- AND race-safety: append is not idempotent, so the whole
    # build+add happens in a private staging dir, published by ONE atomic
    # rename — a concurrent first-run builds its own staging copy, loses the
    # rename, and discards it. The published dir is complete by construction
    # (no marker needed) and can never hold a double-appended batch.
    if not os.path.isdir(index_dir):
        import uuid

        staging = f"{index_dir}.staging-{uuid.uuid4().hex[:8]}"
        e = _t(spark, sf, "embeddings").select("vec_id", "embedding")
        base = e.filter(F.col("vec_id") % _IVF_INCR_MOD != 0)
        build_ivf_index(spark, sf, staging, vectors=base)
        ivf_index_add(
            spark, staging, e.filter(F.col("vec_id") % _IVF_INCR_MOD == 0)
        )
        try:
            os.rename(staging, index_dir)
        except OSError:  # lost the publish race — use the winner's index
            shutil.rmtree(staging, ignore_errors=True)
    return ivf_index_topk(spark, index_dir)


# --------------------------------------------------------------------------
# Semantic clustering (deterministic fixed-point Lloyd's for domain discovery)
# --------------------------------------------------------------------------

_KM_K = 8
_KM_ITERS = 4
_KM_SCALE = 1_000_000  # micro-units (the q56/sim_embedding_drift discipline)
# Round-12 lazy-vs-eager adjudication switch for the kmeans scaled-frame
# checkpoint (flipped per arm by scripts/opt_ab.py via OPT_PY_B)
_KM_EAGER_CKPT = False
_KM_DIM = 64


def _km_oracle() -> str:
    """Unrolled-CTE replay of the fixed-point Lloyd's loop (the pagerank
    iteration-unrolling pattern): init = the _KM_K smallest vec_ids,
    _KM_ITERS centroid updates in exact integer micro-units, then a final
    assignment. `//` (DuckDB) and `div` (Spark) both truncate toward zero,
    TRUNC-scaling matches Spark's long cast, and FLOOR(SQRT(x)) of the
    same integer-valued double is engine-identical (IEEE sqrt is correctly
    rounded), so every centroid coordinate and distance matches
    bit-for-bit."""
    dims = f"RANGE(1, {_KM_DIM + 1})"
    blocks = [
        f"""v AS (
  SELECT vec_id,
         LIST_TRANSFORM(embedding,
           x -> CAST(TRUNC(CAST(x AS DOUBLE) * {_KM_SCALE}) AS BIGINT)) AS vi
  FROM embeddings),
c0 AS (SELECT vec_id AS cid, vi AS c FROM v WHERE vec_id < {_KM_K})"""
    ]
    for t in range(1, _KM_ITERS + 1):
        blocks.append(
            f"""a{t} AS (
  SELECT vec_id, vi, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sq, cid) AS rn
  FROM (SELECT v.vec_id, v.vi, c.cid,
               LIST_SUM(LIST_TRANSFORM({dims},
                 i -> (v.vi[i] - c.c[i]) * (v.vi[i] - c.c[i]))) AS sq
        FROM v, c{t - 1} c)),
s{t} AS (SELECT cid, COUNT(*) AS n, LIST(vi) AS vis
         FROM a{t} WHERE rn = 1 GROUP BY cid),
c{t} AS (
  SELECT p.cid,
         CASE WHEN s.cid IS NULL THEN p.c
              ELSE LIST_TRANSFORM({dims},
                i -> LIST_SUM(LIST_TRANSFORM(s.vis, w -> w[i])) // s.n)
         END AS c
  FROM c{t - 1} p LEFT JOIN s{t} s ON p.cid = s.cid)"""
        )
    blocks.append(
        f"""af AS (
  SELECT vec_id, cid, sq,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sq, cid) AS rn
  FROM (SELECT v.vec_id, c.cid,
               LIST_SUM(LIST_TRANSFORM({dims},
                 i -> (v.vi[i] - c.c[i]) * (v.vi[i] - c.c[i]))) AS sq
        FROM v, c{_KM_ITERS} c))"""
    )
    return (
        "WITH "
        + ",\n".join(blocks)
        + """
SELECT vec_id, CAST(cid AS BIGINT) AS cluster,
       CAST(FLOOR(SQRT(CAST(sq AS DOUBLE))) AS BIGINT) AS dist_micro
FROM af WHERE rn = 1
"""
    )


def _km_trunc_div(a: int, n: int) -> int:
    """Integer division truncating toward zero (Python ``//`` floors;
    DuckDB ``//`` and Spark ``div`` truncate)."""
    q = abs(a) // n
    return q if a >= 0 else -q


def _km_assign(cents_bc, final: bool):
    """Arrow-batched Lloyd's step against broadcast (cid labels, k x d int64
    centroids).
    ``final=False``: emit per-batch PARTIALS — (cluster, n, component-sum
    array) per non-empty cluster, i.e. manual map-side combine; the driver
    merges k x partitions tiny rows. ``final=True``: emit the assignment
    (vec_id, cluster, dist_micro). numpy int64 arithmetic is exact at these
    magnitudes and np.argmin ties to the first (smallest) centroid id,
    matching the oracle's ROW_NUMBER ORDER BY sq, cid. A broadcast +
    vectorized batch op instead of k x d literal HOF expressions: centroid
    literals change every iteration, so codegen recompiled ~0.5 s per pass
    (measured 4.5 s -> 1.6 s at sf0.1)."""

    def op(batches):
        import numpy as np
        import pandas as pd

        cids, cents = cents_bc.value
        C = np.asarray(cents, dtype=np.int64)  # k x d
        labels = np.asarray(cids, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["vi"].to_numpy()).astype(np.int64)  # n x d
            d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            cl = d2.argmin(axis=1)
            if final:
                dist = np.floor(np.sqrt(d2.min(axis=1).astype(np.float64)))
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].astype("int64"),
                        # emitted label = the init vector's vec_id (oracle
                        # cid); positional index only matches when vec_ids
                        # 0..k-1 are dense
                        "cluster": labels[cl],
                        "dist_micro": dist.astype("int64"),
                    }
                )
            else:
                cs, ns, ss = [], [], []
                for c in range(C.shape[0]):
                    m = cl == c
                    if m.any():
                        cs.append(c)
                        ns.append(int(m.sum()))
                        ss.append(V[m].sum(axis=0).tolist())
                yield pd.DataFrame(
                    {
                        "cluster": pd.Series(cs, dtype="int64"),
                        "n": pd.Series(ns, dtype="int64"),
                        "s": ss,
                    }
                )

    return op


@query(
    "sim_kmeans_clusters",
    oracle=_km_oracle(),
    doc=f"Semantic clustering of the embedding corpus with DETERMINISTIC "
    f"fixed-point Lloyd's (k={_KM_K}, {_KM_ITERS} iterations, init = the "
    f"{_KM_K} smallest vec_ids) — the domain-discovery / data-mixing step "
    "of corpus curation (cluster -> inspect -> reweight, SemDeDup-style "
    "pruning starts here too). Every coordinate is TRUNCATED to integer "
    "micro-units before any arithmetic (the q56/sim_embedding_drift "
    "discipline), centroid updates are exact integer sums + "
    "truncate-toward-zero division, ties go to the smaller centroid id, "
    "and the emitted distance is FLOOR(SQRT(sq)) of an exactly-represented "
    "integer — so the ORACLE REPLAYS THE WHOLE MECHANISM as unrolled CTEs "
    "(the graph_pagerank pattern) and parity is bit-exact, closing "
    "round-8's rows-only gap (MLlib's k-means|| init is RNG-order-"
    "dependent and cannot be replayed; Lloyd's itself is the same "
    "algorithm MLlib iterates). Scale shape: the corpus stays distributed "
    "— per iteration one Arrow-batched assignment against the broadcast "
    "k x d centroid matrix with manual map-side combine (each batch emits "
    "at most k partial rows; only k x partitions tiny rows plus the k x d "
    "centroid matrix ever visit the driver, exactly MLlib's treeAggregate "
    "shape). int64 per-cluster component sums hold to ~1.8e13 rows per "
    "cluster at these magnitudes.",
)
def sim_kmeans_clusters(spark: SparkSession, sf: str) -> DataFrame:
    e = _t(spark, sf, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: (x.cast("double") * _KM_SCALE).cast("long"),
        ).alias("vi"),
    )
    schema = "vec_id long, cluster long, dist_micro long"
    init = (
        e.filter(F.col("vec_id") < _KM_K)
        .orderBy("vec_id")
        .collect()
    )
    if not init:
        return spark.createDataFrame([], schema)
    cents = [list(r.vi) for r in init]
    # cluster LABELS are the init vectors' vec_ids (the oracle's cid), not
    # positional indices — identical only when vec_ids 0..k-1 are dense;
    # k_eff = len(init) guards corpora with fewer than _KM_K vectors
    cids = [int(r.vec_id) for r in init]
    k_eff = len(cents)
    # fan_out: single-row-group testdata parquet can't split; localCheckpoint:
    # ITERS+1 passes reuse the scaled frame without re-planning.
    # _KM_EAGER_CKPT is the round-12 lazy-vs-eager adjudication switch
    # (the driver measured 0.869x after the round-11 lazy conversion).
    e = fan_out(e).localCheckpoint(eager=_KM_EAGER_CKPT)
    sc = spark.sparkContext
    for _ in range(_KM_ITERS):
        bc = sc.broadcast((cids, cents))
        partials = e.mapInPandas(
            _km_assign(bc, final=False),
            schema="cluster long, n long, s array<long>",
        ).collect()
        sums = {c: [0] * _KM_DIM for c in range(k_eff)}
        counts = {c: 0 for c in range(k_eff)}
        for r in partials:
            counts[r.cluster] += r.n
            row = sums[r.cluster]
            for i, v in enumerate(r.s):
                row[i] += v
        cents = [
            [_km_trunc_div(sums[c][i], counts[c]) for i in range(_KM_DIM)]
            if counts[c]
            else cents[c]
            for c in range(k_eff)
        ]
    return e.mapInPandas(
        _km_assign(sc.broadcast((cids, cents)), final=True), schema
    )


# --------------------------------------------------------------------------
# k-NN join across dataset splits (retrieval / cross-split contamination)
# --------------------------------------------------------------------------

_KNN_K = 5
_KNN_QUERY_LABEL = 0  # the "query split": one held-out label bucket

_KNN_JOIN_ORACLE = f"""
WITH unit AS (
  SELECT vec_id, label, {_o_normalize('embedding')} AS u FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         c.label AS neighbor_label,
         ROUND({_o_dot('q.u', 'c.u')}, 6) AS score
  FROM unit q JOIN unit c
    ON q.label = {_KNN_QUERY_LABEL} AND c.label != {_KNN_QUERY_LABEL}
),
ranked AS (
  SELECT query_id, neighbor_id, neighbor_label, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rn
  FROM scored)
SELECT query_id, neighbor_id, CAST(neighbor_label AS BIGINT) AS neighbor_label,
       score, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_KNN_K}
"""


@query(
    "sim_knn_join",
    oracle=_KNN_JOIN_ORACLE,
    doc=f"k-NN JOIN between two dataset splits: every vector in the query "
    f"split (label={_KNN_QUERY_LABEL}) gets its top-{_KNN_K} cosine "
    "neighbors from the rest of the corpus — the retrieval primitive behind "
    "cross-split contamination checks (eval↔train leakage by embedding) and "
    "RAG candidate generation. Same distributed-block-matmul shape as "
    "sim_cosine_topk but with set membership defined by a COLUMN, not an id "
    "range: the query split (small by construction — one label bucket) is "
    "broadcast as a unit-normalized matrix, each candidate partition scores "
    "its block with BLAS and pre-prunes to its local top-k per query, so the "
    "ranking shuffle carries ≤ |Q|·k·partitions rows. The corpus side never "
    "self-joins and never leaves its partitions.",
)
def sim_knn_join(spark: SparkSession, sf: str) -> DataFrame:
    e = _t(spark, sf, "embeddings").select("vec_id", "label", "embedding")
    qpdf = e.filter(F.col("label") == _KNN_QUERY_LABEL).toPandas()
    schema = "query_id long, neighbor_id long, neighbor_label long, score double, rn long"
    if not len(qpdf):  # no query split in this corpus → no rows, not a crash
        return spark.createDataFrame([], schema)
    qb = _normalized_query_broadcast(spark, qpdf)
    cand = fan_out(e.filter(F.col("label") != _KNN_QUERY_LABEL))
    pruned = cand.mapInPandas(
        _block_topk_op(qb, _KNN_K, emit_label=True),
        schema="query_id long, neighbor_id long, neighbor_label long, score double",
    )
    return _rank_topk(pruned, _KNN_K)


# --------------------------------------------------------------------------
# Product quantization (PQ) — ADC search over compressed codes
# --------------------------------------------------------------------------

_PQ_M = 8  # subspaces
_PQ_SUBDIM = _DIM // _PQ_M
_PQ_K = 16  # codes per subspace codebook
_PQ_SHORTLIST = 50  # ADC candidates kept per query before exact re-rank


def _o_dot_sub(a: str, b: str) -> str:
    """DuckDB fold dot over two SUBDIM-length double lists (shared template)."""
    return _o_dot(a, b, dim=_PQ_SUBDIM)


def _o_l2_sub(a: str, b: str) -> str:
    """DuckDB fold squared-L2 over two SUBDIM-length double lists."""
    return (
        f"LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE), "
        f"LIST_TRANSFORM(RANGE(1, {_PQ_SUBDIM + 1}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), "
        f"(acc, x) -> acc + x)"
    )


# The PQ pipeline is deterministic end-to-end: codebooks are the id-ordered
# corpus sample, argmin code assignment ties break to the smallest code id
# (np.argmin first-hit ≡ ORDER BY dist, code), ADC terms accumulate in
# subspace order (LIST(... ORDER BY s) fold ≡ the Spark-side s-ascending
# accumulation), and both cuts rank on 6-digit-rounded scores with id
# tie-breaks.
_PQ_ORACLE = f"""
WITH unit AS (
  SELECT vec_id, {_o_normalize('embedding')} AS u FROM embeddings
),
sp AS (SELECT UNNEST(RANGE(0, {_PQ_M})) AS s),
sub AS (
  SELECT vec_id, s, u[s * {_PQ_SUBDIM} + 1 : s * {_PQ_SUBDIM} + {_PQ_SUBDIM}]
           AS us
  FROM unit, sp
),
cb AS (SELECT s, vec_id AS code, us AS cv FROM sub WHERE vec_id < {_PQ_K}),
assign AS (
  SELECT vec_id, s, code FROM (
    SELECT sub.vec_id, sub.s, cb.code,
           ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
                              ORDER BY {_o_l2_sub('sub.us', 'cb.cv')} ASC,
                                       cb.code) AS r
    FROM sub JOIN cb ON sub.s = cb.s)
  WHERE r = 1
),
q AS (SELECT vec_id AS query_id, u AS qu FROM unit
      WHERE vec_id < {_N_QUERIES}),
qsub AS (
  SELECT query_id, s,
         qu[s * {_PQ_SUBDIM} + 1 : s * {_PQ_SUBDIM} + {_PQ_SUBDIM}] AS qs
  FROM q, sp
),
terms AS (
  SELECT qs.query_id, a.vec_id AS neighbor_id, qs.s,
         {_o_dot_sub('qs.qs', 'cb.cv')} AS term
  FROM qsub qs
  JOIN assign a ON a.s = qs.s AND a.vec_id != qs.query_id
  JOIN cb ON cb.s = a.s AND cb.code = a.code
),
adc AS (
  SELECT query_id, neighbor_id,
         ROUND(LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
                                        LIST(term ORDER BY s)),
                           (acc, x) -> acc + x), 6) AS approx
  FROM terms GROUP BY query_id, neighbor_id
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY approx DESC, neighbor_id) AS r1
    FROM adc)
  WHERE r1 <= {_PQ_SHORTLIST}
),
exact AS (
  SELECT s.query_id, s.neighbor_id,
         ROUND({_o_dot('q.qu', 'c.u')}, 6) AS score
  FROM short s
  JOIN q ON q.query_id = s.query_id
  JOIN unit c ON c.vec_id = s.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rn
  FROM exact)
SELECT query_id, neighbor_id, score, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_TOPK}
"""


@query(
    "sim_pq_topk",
    oracle=_PQ_ORACLE,
    doc=f"ANN top-{_TOPK} via product quantization: each vector is compressed "
    f"to {_PQ_M} one-byte codes ({_PQ_M} subspaces × {_PQ_K}-entry "
    "codebooks, 64× smaller than the float vectors), queries score the "
    "ENTIRE corpus from code lookups alone (asymmetric distance "
    f"computation: one {_PQ_M}-table add per candidate, no float vector "
    f"touched), and only the per-query top-{_PQ_SHORTLIST} shortlist gets "
    "an exact re-rank. This is the memory-bound regime's index: at 100 TB "
    "of embeddings, codes fit where vectors can't (RAM/cache), the ADC "
    "pass is a map-only scan of the code table, and the only shuffle is "
    "the shortlist ranking, ≤ |Q|·shortlist·partitions rows. Codebooks "
    "here are the deterministic id-ordered corpus sample (production "
    "swaps in per-subspace k-means, same plumbing), which is what makes "
    "the exact-replay DuckDB oracle possible — the hash match certifies "
    "compression, assignment, ADC ordering, and re-rank together.",
)
def sim_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np

    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")

    def unit(m: "np.ndarray") -> "np.ndarray":
        return m / np.sqrt((m * m).sum(axis=1, keepdims=True))

    small = e.filter(F.col("vec_id") < max(_PQ_K, _N_QUERIES)).toPandas()
    ids = small["vec_id"].to_numpy(dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = unit(np.stack(small["embedding"].to_numpy())[order].astype(np.float64))
    cbm = mat[ids < _PQ_K]  # _PQ_K × _DIM, code id = row index = vec_id
    q_ids = ids[ids < _N_QUERIES]
    qmat = mat[ids < _N_QUERIES]
    bc = e.sparkSession.sparkContext.broadcast((q_ids, qmat, cbm))
    k_short = _PQ_SHORTLIST

    def op(batches):
        import numpy as np
        import pandas as pd

        q_ids, qmat, cbm = bc.value
        nq = len(q_ids)
        for b in batches:
            if not len(b):
                continue
            c_ids = b["vec_id"].to_numpy(dtype=np.int64)
            block = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            block /= np.sqrt((block * block).sum(axis=1, keepdims=True))
            # ADC: per subspace, assign codes (argmin L2 — first-hit ties) and
            # accumulate the query→code lookup terms in s order (the oracle
            # folds LIST(term ORDER BY s) — same IEEE addition sequence)
            approx = np.zeros((nq, len(block)))
            for s in range(_PQ_M):
                lo, hi = s * _PQ_SUBDIM, (s + 1) * _PQ_SUBDIM
                bs, cbs = block[:, lo:hi], cbm[:, lo:hi]
                d2 = ((bs[:, None, :] - cbs[None, :, :]) ** 2).sum(axis=2)
                codes = np.argmin(d2, axis=1)
                adc = qmat[:, lo:hi] @ cbs.T  # nq × _PQ_K
                approx += adc[:, codes]
            approx = np.round(approx, 6)
            out_q, out_n, out_a, out_s = [], [], [], []
            for qi in range(nq):
                a = approx[qi]
                idx = np.nonzero(c_ids != q_ids[qi])[0]
                top = idx[np.lexsort((c_ids[idx], -a[idx]))][:k_short]
                if not len(top):
                    continue
                # exact scores ONLY for the shortlist (the ADC point: float
                # vectors are touched for shortlist·|Q| rows, not the corpus)
                ex = np.round(qmat[qi] @ block[top].T, 6)
                out_q.extend([q_ids[qi]] * len(top))
                out_n.extend(c_ids[top].tolist())
                out_a.extend(a[top].tolist())
                out_s.extend(ex.tolist())
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(out_q, dtype="int64"),
                    "neighbor_id": pd.Series(out_n, dtype="int64"),
                    "approx": pd.Series(out_a, dtype="float64"),
                    "score": pd.Series(out_s, dtype="float64"),
                }
            )

    pruned = fan_out(e).mapInPandas(
        op, schema="query_id long, neighbor_id long, approx double, score double"
    )
    w1 = W.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id")
    )
    w2 = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        pruned.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= _PQ_SHORTLIST)
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= _TOPK)
        .select("query_id", "neighbor_id", "score", F.col("rn").cast("long").alias("rn"))
    )


# --------------------------------------------------------------------------
# ANN quality evaluation: recall@k of every approximate method vs exact
# --------------------------------------------------------------------------


@query(
    "sim_recall_eval",
    oracle=f"""
    WITH exact AS (SELECT query_id, neighbor_id FROM ({_TOPK_ORACLE})),
    m AS (
      SELECT 'exact' AS method, query_id, neighbor_id FROM exact
      UNION ALL
      SELECT 'ann_lsh', query_id, neighbor_id FROM ({_ANN_LSH_ORACLE})
      UNION ALL
      SELECT 'ivf', query_id, neighbor_id FROM ({_IVF_ORACLE})
      UNION ALL
      SELECT 'pq', query_id, neighbor_id FROM ({_PQ_ORACLE})
    )
    SELECT m.method,
           ROUND(CAST(COUNT(e.neighbor_id) AS DOUBLE)
                 / ({_N_QUERIES} * {_TOPK}), 6) AS recall_at_k,
           CAST({_TOPK} AS BIGINT) AS k,
           CAST({_N_QUERIES} AS BIGINT) AS n_queries
    FROM m LEFT JOIN exact e
      ON m.query_id = e.query_id AND m.neighbor_id = e.neighbor_id
    GROUP BY m.method
    """,
    doc=f"Recall@{_TOPK} of every ANN method (hyperplane LSH, IVF probes, "
    "product quantization) against the exact brute-force cosine top-k, plus "
    "the exact method itself as a 1.0 control row — the evaluation harness "
    "an ANN deployment needs BEFORE trading accuracy for speed, as a "
    "first-class operator. Every underlying pipeline is deterministic, so "
    "recall itself is deterministic and the DuckDB oracle replays the "
    "whole evaluation (all four retrievals composed as CTEs) exactly. "
    "Spark side reuses the registered implementations and computes all "
    "methods in ONE plan: union with a method tag, one broadcast-size "
    "join against the exact set, one tiny aggregate.",
)
def sim_recall_eval(spark: SparkSession, sf: str) -> DataFrame:
    # materialize the exact set once: it feeds both the union branch and the
    # broadcast build side, and it is the most expensive of the retrievals
    exact = (
        sim_cosine_topk(spark, sf)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    methods = [
        ("exact", exact),
        ("ann_lsh", sim_ann_lsh(spark, sf).select("query_id", "neighbor_id")),
        ("ivf", sim_ivf_topk(spark, sf).select("query_id", "neighbor_id")),
        ("pq", sim_pq_topk(spark, sf).select("query_id", "neighbor_id")),
    ]
    tagged = None
    for m, df in methods:
        d = df.select(F.lit(m).alias("method"), "query_id", "neighbor_id")
        tagged = d if tagged is None else tagged.unionByName(d)
    hits = tagged.join(
        F.broadcast(exact.withColumn("hit", F.lit(1))),
        ["query_id", "neighbor_id"],
        "left",
    )
    denom = float(_N_QUERIES * _TOPK)
    return hits.groupBy("method").agg(
        F.round(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
            / F.lit(denom),
            6,
        ).alias("recall_at_k"),
        F.lit(_TOPK).cast("long").alias("k"),
        F.lit(_N_QUERIES).cast("long").alias("n_queries"),
    )


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and vector rankings
# --------------------------------------------------------------------------
#
# The standard RAG/retrieval-stack combiner: lexical (BM25) and semantic
# (cosine) rankings fused by RRF — score(d) = Σ_r 1/(K + rank_r(d)) — which
# needs no score calibration between the two systems. Determinism: ranks are
# computed over 6-digit-rounded scores SCALED TO INTEGERS (a float sort could
# disagree across engines on -0.0/ulp boundaries; an int64 sort cannot), and
# the RRF contributions are exact integer division — the oracle replays the
# whole fusion bit-for-bit.
#
# Rank derivation avoids both a global window (single-partition exchange) and
# a theta self-join (nested loop): each retriever's top-N arrives via
# TakeOrderedAndProject, is packed into ONE row (collect_list of ≤N structs —
# the bm25 stats-row discipline), sorted in-place, and posexploded back out
# with its position as the rank. At 100 TB the per-retriever candidate pull
# is the scale cost; the fusion itself touches ≤ 2N rows.

_RRF_K = 60  # the standard RRF damping constant
_RRF_LIST_N = 100  # candidates taken from each retriever
_RRF_OUT_N = 20  # fused results returned
_RRF_QUERY_VEC = 0  # query-by-example: vec_id 0 is the query document
_RRF_SCALE = 1_000_000_000


def _rrf_oracle() -> str:
    from librarian_spark.operators.text import bm25_score_ctes

    return f"""
WITH {bm25_score_ctes()},
bkey AS (SELECT doc_id, CAST(ROUND(score * 1000000.0) AS BIGINT) AS k
         FROM bscore),
brank AS (SELECT doc_id, r FROM (
            SELECT doc_id, ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) AS r
            FROM bkey) WHERE r <= {_RRF_LIST_N}),
unit AS (SELECT vec_id, {_o_normalize("embedding")} AS u FROM embeddings),
qv AS (SELECT u FROM unit WHERE vec_id = {_RRF_QUERY_VEC}),
ckey AS (SELECT c.vec_id AS doc_id,
                CAST(ROUND(ROUND({_o_dot("q.u", "c.u")}, 6) * 1000000.0)
                     AS BIGINT) AS k
         FROM unit c, qv q WHERE c.vec_id != {_RRF_QUERY_VEC}),
crank AS (SELECT doc_id, r FROM (
            SELECT doc_id, ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) AS r
            FROM ckey) WHERE r <= {_RRF_LIST_N}),
fused AS (
  SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
         CAST(b.r AS BIGINT) AS bm25_rank,
         CAST(c.r AS BIGINT) AS cos_rank,
         COALESCE({_RRF_SCALE} // ({_RRF_K} + b.r), 0)
         + COALESCE({_RRF_SCALE} // ({_RRF_K} + c.r), 0) AS rrf
  FROM brank b FULL OUTER JOIN crank c ON b.doc_id = c.doc_id)
SELECT doc_id, bm25_rank, cos_rank, CAST(rrf AS BIGINT) AS rrf_scaled
FROM fused ORDER BY rrf DESC, doc_id LIMIT {_RRF_OUT_N}
"""


def _rankify(df: DataFrame, key_col: str, id_col: str, n: int) -> DataFrame:
    """(id, rank 1..n) of the top-n rows by (key DESC, id ASC) — via
    TakeOrdered + one packed collect_list row + posexplode: no global window
    (single-partition exchange) and no theta join (nested loop)."""
    top = df.orderBy(F.col(key_col).desc(), id_col).limit(n)
    packed = top.select(
        F.struct((-F.col(key_col)).alias("nk"), F.col(id_col).alias("i")).alias(
            "kv"
        )
    ).agg(F.sort_array(F.collect_list("kv")).alias("a"))
    return packed.select(F.posexplode("a").alias("pos", "kv")).select(
        F.col("kv.i").alias(id_col), (F.col("pos") + 1).cast("long").alias("r")
    )


@query(
    "sim_rrf_fusion",
    oracle=_rrf_oracle(),
    doc=f"Hybrid retrieval: BM25 (lexical) and cosine-to-query-vector "
    f"(semantic) top-{_RRF_LIST_N} lists fused by reciprocal-rank fusion "
    f"(K={_RRF_K}) — the calibration-free combiner every RAG/retrieval "
    "stack ships. Ranks come from integer-scaled scores (no float-sort "
    "ambiguity) via TakeOrdered + one packed sort row (no global window, "
    "no nested loop); RRF contributions are exact integer division, so the "
    "oracle replays the fusion bit-for-bit including which documents only "
    "one retriever surfaced (NULL rank on the other). At 100 TB each "
    "retriever bounds its own candidate pull; fusion cost is fixed at "
    f"2·{_RRF_LIST_N} rows.",
)
def sim_rrf_fusion(spark: SparkSession, sf: str) -> DataFrame:
    from librarian_spark.functions.vector import dot, unit_vectors
    from librarian_spark.operators.text import bm25_scores

    key = lambda c: F.round(F.col(c) * F.lit(1_000_000.0)).cast("long")  # noqa: E731
    b = bm25_scores(spark, sf).select("doc_id", key("score").alias("k"))
    brank = _rankify(b, "k", "doc_id", _RRF_LIST_N).withColumnRenamed("r", "rb")

    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    # query vector normalized DRIVER-side with the same sequential fold the
    # oracle's LIST_REDUCE performs (identical IEEE op order), then inlined
    # as an array literal — floats round-trip exactly, and a 1-row join
    # would plan the banned BroadcastNestedLoopJoin
    qrow = e.filter(F.col("vec_id") == _RRF_QUERY_VEC).collect()[0]["embedding"]
    acc = 0.0
    for x in qrow:
        acc = acc + float(x) * float(x)
    nrm = acc**0.5
    qu = F.array(*[F.lit(float(x) / nrm) for x in qrow])
    cu = unit_vectors(e.filter(F.col("vec_id") != _RRF_QUERY_VEC))
    c = cu.select(
        F.col("vec_id").alias("doc_id"),
        F.round(F.round(dot(qu, F.col("u")), 6) * F.lit(1_000_000.0))
        .cast("long")
        .alias("k"),
    )
    crank = _rankify(c, "k", "doc_id", _RRF_LIST_N).withColumnRenamed("r", "rc")

    contrib = lambda r: F.coalesce(  # noqa: E731
        F.call_function("div", F.lit(_RRF_SCALE), F.lit(_RRF_K) + F.col(r)),
        F.lit(0),
    )
    fused = brank.join(crank, "doc_id", "full_outer").select(
        "doc_id",
        F.col("rb").alias("bm25_rank"),
        F.col("rc").alias("cos_rank"),
        (contrib("rb") + contrib("rc")).cast("long").alias("rrf_scaled"),
    )
    return fused.orderBy(F.col("rrf_scaled").desc(), "doc_id").limit(_RRF_OUT_N)


# --------------------------------------------------------------------------
# Matryoshka truncated-dim rerank (coarse prefix-dim search → exact rerank)
# --------------------------------------------------------------------------

_MRL_DIM = 16  # coarse stage scores only the first 16 of 64 dims
_MRL_COARSE_K = 30  # candidates kept per query for the exact stage

_MRL_ORACLE = f"""
WITH unit16 AS (
  SELECT vec_id, {_o_normalize('embedding[1:' + str(_MRL_DIM) + ']', _MRL_DIM)} AS u16
  FROM embeddings
),
unit AS (
  SELECT vec_id, {_o_normalize('embedding')} AS u FROM embeddings
),
coarse AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND({_o_dot('q.u16', 'c.u16', _MRL_DIM)}, 6) AS coarse_score
  FROM unit16 q JOIN unit16 c
    ON q.vec_id < {_N_QUERIES} AND c.vec_id != q.vec_id
),
cand AS (
  SELECT * FROM (
    SELECT query_id, neighbor_id, coarse_score,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY coarse_score DESC, neighbor_id) AS crn
    FROM coarse)
  WHERE crn <= {_MRL_COARSE_K}
),
rer AS (
  SELECT cand.query_id, cand.neighbor_id, cand.coarse_score,
         ROUND({_o_dot('q.u', 'c.u')}, 6) AS score
  FROM cand
  JOIN unit q ON q.vec_id = cand.query_id
  JOIN unit c ON c.vec_id = cand.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, coarse_score, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rn
  FROM rer)
SELECT query_id, neighbor_id, coarse_score, score, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_TOPK}
"""


@query(
    "sim_matryoshka_rerank",
    oracle=_MRL_ORACLE,
    doc=f"Matryoshka-style two-stage retrieval: the coarse pass scores only "
    f"the first {_MRL_DIM} of {_DIM} dims (prefix re-normalized — the MRL "
    f"truncation contract), keeps {_MRL_COARSE_K} candidates per query, and "
    f"ONLY those are re-scored full-width for the final top-{_TOPK}. The "
    f"coarse matmul moves {_MRL_DIM}/{_DIM} = 4x less data through the "
    "cache than full-width brute force and the exact stage touches "
    f"|Q|·{_MRL_COARSE_K} rows instead of |Q|·|N| — the standard "
    "cheap-filter/exact-rerank funnel of MRL embeddings (also the shape of "
    "int8→float rerank in sim_quantize_int8). Coarse stage: broadcast "
    "prefix-normalized queries, per-partition BLAS + local top-k prune "
    "(the sim_cosine_topk shuffle bound); exact stage: the candidate list "
    "is the broadcast side of both embedding joins, scored with the "
    "sequential-fold dot the oracle replays bit-for-bit.",
)
def sim_matryoshka_rerank(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np

    from librarian_spark.functions.vector import dot, unit_vectors

    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    qpdf = e.filter(F.col("vec_id") < _N_QUERIES).toPandas()
    q_ids = qpdf["vec_id"].to_numpy(dtype=np.int64)
    qm = np.stack(qpdf["embedding"].to_numpy()).astype(np.float64)[:, :_MRL_DIM]
    qn = np.sqrt((qm * qm).sum(axis=1, keepdims=True))
    qm /= np.where(qn == 0.0, 1.0, qn)  # all-zero prefix scores 0, never NaN
    qb = spark.sparkContext.broadcast((q_ids, qm))
    k, mdim = _MRL_COARSE_K, _MRL_DIM

    def op(batches):
        import numpy as np
        import pandas as pd

        q_ids, qm = qb.value
        for b in batches:
            if not len(b):
                continue
            c_ids = b["vec_id"].to_numpy(dtype=np.int64)
            c = np.stack(b["embedding"].to_numpy()).astype(np.float64)[:, :mdim]
            cn = np.sqrt((c * c).sum(axis=1, keepdims=True))
            c /= np.where(cn == 0.0, 1.0, cn)  # zero prefix → 0, never NaN
            scores = np.round(qm @ c.T, 6)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(q_ids)):
                s = scores[qi]
                idx = np.nonzero(c_ids != q_ids[qi])[0]
                if not len(idx):
                    continue
                top = idx[np.lexsort((c_ids[idx], -s[idx]))][:k]
                out_q.extend([q_ids[qi]] * len(top))
                out_n.extend(c_ids[top].tolist())
                out_s.extend(s[top].tolist())
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(out_q, dtype="int64"),
                    "neighbor_id": pd.Series(out_n, dtype="int64"),
                    "coarse_score": pd.Series(out_s, dtype="float64"),
                }
            )

    pruned = fan_out(e).mapInPandas(
        op, schema="query_id long, neighbor_id long, coarse_score double"
    )
    wc = W.partitionBy("query_id").orderBy(
        F.col("coarse_score").desc(), F.col("neighbor_id")
    )
    cand = (
        pruned.withColumn("crn", F.row_number().over(wc))
        .filter(F.col("crn") <= _MRL_COARSE_K)
        .drop("crn")
    )
    # join RAW embeddings first, normalize only the |Q|·coarse_k joined rows:
    # normalizing the whole corpus for a 600-row rerank paid |N| fold-norms
    # per side (MEASURED: 2.3s → ~1.4s at sf0.1). Candidates are the
    # broadcast side of both joins; the corpus embeddings never shuffle.
    qe = unit_vectors(
        e.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        out="qu",
    ).drop("embedding")
    ce = e.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    rer = unit_vectors(
        F.broadcast(F.broadcast(cand).join(qe, "query_id")).join(
            ce, "neighbor_id"
        ),
        out="cu",
    )
    rer = rer.withColumn("score", F.round(dot(F.col("qu"), F.col("cu")), 6))
    wr = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        rer.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= _TOPK)
        .select(
            "query_id", "neighbor_id", "coarse_score", "score",
            F.col("rn").cast("long").alias("rn"),
        )
    )


# --------------------------------------------------------------------------
# IVF+PQ composed index (the FAISS IndexIVFPQ shape, exact-replayed)
# --------------------------------------------------------------------------

# Approximate score for inner-product metric with residual codes:
#   dot(q, v) = dot(q, centroid(v)) + dot(q, resid(v))
#             ≈ dot(q, centroid(v)) + Σ_s dot(q_s, rcb[s, code_s(v)])
# Everything is deterministic (sample centroids/codebooks, first-hit argmin /
# argmax ties, s-ordered fold, one final centroid-term add) so the oracle
# replays assignment, residuals, codes, probe selection, ADC, and re-rank.

_IVFPQ_ORACLE = f"""
WITH unit AS (
  SELECT vec_id, {_o_normalize('embedding')} AS u FROM embeddings
),
cent AS (SELECT vec_id AS cid, u AS cu FROM unit WHERE vec_id < {_IVF_NLISTS}),
q AS (SELECT vec_id AS query_id, u AS qu FROM unit
      WHERE vec_id < {_N_QUERIES}),
assign AS (
  SELECT vec_id, u, cid, cu FROM (
    SELECT e.vec_id, e.u, c.cid, c.cu,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_o_dot('e.u', 'c.cu')} DESC, c.cid)
             AS r
    FROM unit e, cent c)
  WHERE r = 1
),
resid AS (
  SELECT vec_id, cid,
         LIST_TRANSFORM(RANGE(1, {_DIM + 1}), i -> u[i] - cu[i]) AS rv
  FROM assign
),
sp AS (SELECT UNNEST(RANGE(0, {_PQ_M})) AS s),
rsub AS (
  SELECT vec_id, cid, s,
         rv[s * {_PQ_SUBDIM} + 1 : s * {_PQ_SUBDIM} + {_PQ_SUBDIM}] AS rs
  FROM resid, sp
),
rcb AS (SELECT s, vec_id - {_IVF_NLISTS} AS code, rs AS cv FROM rsub
       WHERE vec_id >= {_IVF_NLISTS} AND vec_id < {_IVF_NLISTS} + {_PQ_K}),
codes AS (
  SELECT vec_id, cid, s, code FROM (
    SELECT rsub.vec_id, rsub.cid, rsub.s, rcb.code,
           ROW_NUMBER() OVER (PARTITION BY rsub.vec_id, rsub.s
                              ORDER BY {_o_l2_sub('rsub.rs', 'rcb.cv')} ASC,
                                       rcb.code) AS r
    FROM rsub JOIN rcb ON rsub.s = rcb.s)
  WHERE r = 1
),
probes AS (
  SELECT query_id, cid FROM (
    SELECT q.query_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {_o_dot('q.qu', 'c.cu')} DESC, c.cid)
             AS r
    FROM q, cent c)
  WHERE r <= {_IVF_NPROBE}
),
qsub AS (
  SELECT query_id, s,
         qu[s * {_PQ_SUBDIM} + 1 : s * {_PQ_SUBDIM} + {_PQ_SUBDIM}] AS qs
  FROM q, sp
),
terms AS (
  SELECT p.query_id, cd.vec_id AS neighbor_id, cd.cid, cd.s,
         {_o_dot_sub('qs.qs', 'rcb.cv')} AS term
  FROM probes p
  JOIN codes cd ON cd.cid = p.cid AND cd.vec_id != p.query_id
  JOIN qsub qs ON qs.query_id = p.query_id AND qs.s = cd.s
  JOIN rcb ON rcb.s = cd.s AND rcb.code = cd.code
),
adc AS (
  SELECT t.query_id, t.neighbor_id,
         ROUND({_o_dot('q.qu', 'c.cu')}
               + LIST_REDUCE(LIST_PREPEND(CAST(0.0 AS DOUBLE),
                                          LIST(t.term ORDER BY t.s)),
                             (acc, x) -> acc + x), 6) AS approx
  FROM terms t
  JOIN q ON q.query_id = t.query_id
  JOIN cent c ON c.cid = t.cid
  GROUP BY t.query_id, t.neighbor_id, q.qu, c.cu
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY approx DESC, neighbor_id) AS r1
    FROM adc)
  WHERE r1 <= {_PQ_SHORTLIST}
),
exact AS (
  SELECT s.query_id, s.neighbor_id,
         ROUND({_o_dot('q.qu', 'c.u')}, 6) AS score
  FROM short s
  JOIN q ON q.query_id = s.query_id
  JOIN unit c ON c.vec_id = s.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rn
  FROM exact)
SELECT query_id, neighbor_id, score, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_TOPK}
"""


@query(
    "sim_ivf_pq_topk",
    oracle=_IVFPQ_ORACLE,
    doc=f"The COMPOSED production vector index (FAISS IndexIVFPQ shape): IVF "
    f"coarse quantizer ({_IVF_NLISTS} lists, {_IVF_NPROBE} probed) bounds "
    f"WHICH vectors are scored, and PQ residual codes ({_PQ_M}×{_PQ_K}) "
    "bound HOW each is scored — candidates cost one table-lookup sum plus "
    "one centroid term, never a float-vector read. Residuals (vector minus "
    "its centroid) are what PQ encodes, so the codebook spans the "
    "within-cell spread rather than the whole space — the precision win "
    "that makes IVFPQ the default at billion scale. Scoring identity: "
    "dot(q,v) = dot(q,cent) + dot(q,resid), the second term approximated "
    "by s-ordered code lookups folded from zero with the centroid term "
    "added LAST (one IEEE add — replayed bit-for-bit by the oracle). At "
    "100 TB: codes+centroids fit in RAM where vectors cannot; the probe "
    "mask makes the scan ~nprobe/nlists of the corpus; the only shuffle "
    "is the shortlist ranking. Exact re-rank touches "
    f"|Q|·{_PQ_SHORTLIST} float vectors total.",
)
def sim_ivf_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np

    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")

    def unit(m: "np.ndarray") -> "np.ndarray":
        return m / np.sqrt((m * m).sum(axis=1, keepdims=True))

    n_small = max(_IVF_NLISTS + _PQ_K, _N_QUERIES)
    small = e.filter(F.col("vec_id") < n_small).toPandas()
    ids = small["vec_id"].to_numpy(dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = unit(np.stack(small["embedding"].to_numpy())[order].astype(np.float64))
    cmat = mat[ids < _IVF_NLISTS]  # cid = row index = vec_id
    q_ids = ids[ids < _N_QUERIES]
    qmat = mat[ids < _N_QUERIES]
    # residual codebooks from a sample DISJOINT from the centroid ids (a
    # centroid's own residual is exactly zero — sampling ids < _PQ_K when
    # the centroids are ids < _IVF_NLISTS yields an all-zero codebook and a
    # silently no-op PQ stage); assignments use the same first-hit tie rule
    sample = mat[(ids >= _IVF_NLISTS) & (ids < _IVF_NLISTS + _PQ_K)]
    s_cid = np.argmax(sample @ cmat.T, axis=1)
    rcbm = sample - cmat[s_cid]  # _PQ_K × _DIM, code = sample row index
    qc = qmat @ cmat.T  # nq × nlists: the dot(q, centroid) terms
    # probe cut with the SAME (score desc, cid asc) total order the oracle
    # uses — bare argsort is unstable on tied dots
    probes = np.stack(
        [
            np.lexsort((np.arange(cmat.shape[0]), -qc[i]))[:_IVF_NPROBE]
            for i in range(len(q_ids))
        ]
    )
    bc = e.sparkSession.sparkContext.broadcast(
        (q_ids, qmat, cmat, rcbm, probes, qc)
    )
    k_short = _PQ_SHORTLIST

    def op(batches):
        import numpy as np
        import pandas as pd

        q_ids, qmat, cmat, rcbm, probes, qc = bc.value
        nq = len(q_ids)
        for b in batches:
            if not len(b):
                continue
            c_ids = b["vec_id"].to_numpy(dtype=np.int64)
            block = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            block /= np.sqrt((block * block).sum(axis=1, keepdims=True))
            cid = np.argmax(block @ cmat.T, axis=1)  # first-hit tie = low cid
            resid = block - cmat[cid]
            # PQ codes of the residuals + ADC term accumulation, s-ordered
            # fold from ZERO (centroid term added last — oracle parity)
            sumterms = np.zeros((nq, len(block)))
            for s in range(_PQ_M):
                lo, hi = s * _PQ_SUBDIM, (s + 1) * _PQ_SUBDIM
                rs, cbs = resid[:, lo:hi], rcbm[:, lo:hi]
                d2 = ((rs[:, None, :] - cbs[None, :, :]) ** 2).sum(axis=2)
                codes = np.argmin(d2, axis=1)
                adc = qmat[:, lo:hi] @ cbs.T  # nq × _PQ_K
                sumterms += adc[:, codes]
            out_q, out_n, out_a, out_s = [], [], [], []
            for qi in range(nq):
                in_probed = np.isin(cid, probes[qi]) & (c_ids != q_ids[qi])
                idx = np.nonzero(in_probed)[0]
                if not len(idx):
                    continue
                a = np.round(qc[qi, cid[idx]] + sumterms[qi, idx], 6)
                top = np.lexsort((c_ids[idx], -a))[:k_short]
                sel = idx[top]
                ex = np.round(qmat[qi] @ block[sel].T, 6)
                out_q.extend([q_ids[qi]] * len(sel))
                out_n.extend(c_ids[sel].tolist())
                out_a.extend(a[top].tolist())
                out_s.extend(ex.tolist())
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(out_q, dtype="int64"),
                    "neighbor_id": pd.Series(out_n, dtype="int64"),
                    "approx": pd.Series(out_a, dtype="float64"),
                    "score": pd.Series(out_s, dtype="float64"),
                }
            )

    pruned = fan_out(e).mapInPandas(
        op, schema="query_id long, neighbor_id long, approx double, score double"
    )
    w1 = W.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id")
    )
    w2 = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        pruned.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= _PQ_SHORTLIST)
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= _TOPK)
        .select(
            "query_id", "neighbor_id", "score",
            F.col("rn").cast("long").alias("rn"),
        )
    )


# --------------------------------------------------------------------------
# Binary (sign-bit) hamming search — 1-bit quantization, 64x compression
# --------------------------------------------------------------------------

_BH_BITS = 63  # dims packed per signature; %63 keeps the sign bit out of
# shifts (engines differ on signed-overflow shifts — the q65 rule)


@query(
    "sim_binary_hamming_topk",
    oracle=f"""
    WITH packed AS (
      SELECT vec_id,
             LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT),
               LIST_TRANSFORM(RANGE(1, {_BH_BITS + 1}), i ->
                 CASE WHEN embedding[i] > 0 THEN (1::BIGINT << (i - 1))
                      ELSE 0 END)),
               (acc, x) -> acc | x) AS sig
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(BIT_COUNT(XOR(q.sig, c.sig)) AS BIGINT) AS hamming
      FROM packed q JOIN packed c
        ON q.vec_id < {_N_QUERIES} AND c.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id, hamming, CAST(rn AS BIGINT) AS rn FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY hamming, neighbor_id) AS rn
      FROM scored)
    WHERE rn <= {_TOPK}
    """,
    doc=f"1-bit (sign) quantized search: each embedding collapses to a "
    f"{_BH_BITS}-bit signature (64× smaller than the float vector — the "
    "most aggressive point on the quantization curve after int8 "
    "(sim_quantize_int8) and PQ), and ranking is hamming distance = ONE "
    "xor + popcount per pair — pure int64 ALU, exactly replayed in SQL "
    "with no float rounding anywhere. Packing is a map-only fold; the "
    "probe is signatures-only (the float corpus is never touched); the "
    f"only shuffle ranks |Q|·|N| int rows to top-{_TOPK}. At 100 TB "
    "signatures of a billion 64-dim vectors are 8 GB — RAM-resident "
    "where vectors are not; production pairs this with an exact re-rank "
    f"(the {_BH_BITS} of 64 dims packed keeps every shift off the sign "
    "bit, the q65 rule).",
)
def sim_binary_hamming_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    # packing as ONE SQL fold: the per-bit shift amount is the lambda
    # variable, which only the SQL-expression form can feed to shiftleft
    sig = F.expr(
        f"""aggregate(
              transform(sequence(1, {_BH_BITS}), i ->
                IF(element_at(embedding, i) > cast(0 as float),
                   shiftleft(1L, cast(i - 1 as int)), 0L)),
              0L, (acc, x) -> acc | x)"""
    )
    packed = e.select("vec_id", sig.alias("sig"))
    # the 20 query signatures are inlined as a LITERAL struct array and
    # exploded per corpus row — a generator, not a join: the theta-join
    # formulation plans BroadcastNestedLoopJoin (the O(N·M) node the global
    # plan gate forbids), while this is scan → generate → window
    qrows = packed.filter(F.col("vec_id") < _N_QUERIES).collect()
    qarr = F.array(
        *[
            F.struct(
                F.lit(int(r["vec_id"])).cast("long").alias("query_id"),
                F.lit(int(r["sig"])).cast("long").alias("qsig"),
            )
            for r in qrows
        ]
    )
    scored = (
        packed.select("vec_id", "sig", F.explode(qarr).alias("q"))
        .filter(F.col("vec_id") != F.col("q.query_id"))
        .select(
            F.col("q.query_id").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            F.bit_count(
                F.col("q.qsig").bitwiseXOR(F.col("sig"))
            ).cast("long").alias("hamming"),
        )
    )
    w = W.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .withColumn("rn", F.col("rn").cast("long"))
    )


# --------------------------------------------------------------------------
# Maximum inner-product search (MIPS — the recommendation/retrieval scoring)
# --------------------------------------------------------------------------

_MIPS_ORACLE = f"""
WITH dv AS (
  SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND({_o_dot('q.v', 'c.v')}, 6) AS score
  FROM dv q JOIN dv c ON q.vec_id < {_N_QUERIES} AND c.vec_id != q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rn
  FROM scored)
SELECT query_id, neighbor_id, score, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_TOPK}
"""


@query(
    "sim_mips_topk",
    oracle=_MIPS_ORACLE,
    doc=f"Maximum inner-product search (top-{_TOPK} by RAW dot product, no "
    "normalization) — the retrieval scoring recommender and two-tower "
    "models actually use, where MIPS ≠ cosine whenever norms vary (a "
    "long document embedding can out-score a closer-angle short one). "
    "Same distributed block-matmul shape as sim_cosine_topk: queries "
    "broadcast once, per-partition BLAS scoring with a local top-k "
    "pre-prune under the global (score desc, id) order, one final "
    "ranking shuffle of ≤ |Q|·k·partitions rows. To index at 100 TB, "
    "MIPS reduces to cosine ANN by norm augmentation (append "
    "sqrt(M²−‖x‖²) to each corpus vector, 0 to queries — inner-product "
    "order becomes angular order), after which the existing IVF/PQ/LSH "
    "indexes apply unchanged; the docstring-level reduction is pinned by "
    "an invariant test, the exact scores by this oracle.",
)
def sim_mips_topk(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np

    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    qpdf = e.filter(F.col("vec_id") < _N_QUERIES).toPandas()
    q_ids = qpdf["vec_id"].to_numpy(dtype=np.int64)
    qm = np.stack(qpdf["embedding"].to_numpy()).astype(np.float64)
    qb = spark.sparkContext.broadcast((q_ids, qm))
    k = _TOPK

    def op(batches):
        import numpy as np
        import pandas as pd

        q_ids, qm = qb.value
        for b in batches:
            if not len(b):
                continue
            c_ids = b["vec_id"].to_numpy(dtype=np.int64)
            c = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            scores = np.round(qm @ c.T, 6)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(q_ids)):
                s = scores[qi]
                idx = np.nonzero(c_ids != q_ids[qi])[0]
                if not len(idx):
                    continue
                top = idx[np.lexsort((c_ids[idx], -s[idx]))][:k]
                out_q.extend([q_ids[qi]] * len(top))
                out_n.extend(c_ids[top].tolist())
                out_s.extend(s[top].tolist())
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(out_q, dtype="int64"),
                    "neighbor_id": pd.Series(out_n, dtype="int64"),
                    "score": pd.Series(out_s, dtype="float64"),
                }
            )

    pruned = fan_out(e).mapInPandas(
        op, schema="query_id long, neighbor_id long, score double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        pruned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .withColumn("rn", F.col("rn").cast("long"))
    )


# --------------------------------------------------------------------------
# MMR diversified top-k (maximal marginal relevance re-ranking)
# --------------------------------------------------------------------------

_MMR_QUERIES = 4  # queries = vec_id < 4
_MMR_CANDS = 20  # relevance shortlist per query
_MMR_K = 5  # diversified picks per query
_MMR_LAMBDA = 0.7  # relevance weight
# the diversity weight is a LITERAL, never computed as 1.0-λ: the float
# 1.0-0.7 is 0.30000000000000004, one ulp off the oracle's CAST(0.3 AS
# DOUBLE) — enough to fail the hash compare on the emitted objective
_MMR_MU = 0.3


def _mmr_oracle() -> str:
    lam, mu = "CAST(0.7 AS DOUBLE)", "CAST(0.3 AS DOUBLE)"
    blocks = [
        f"""unit AS MATERIALIZED (
      SELECT vec_id, {_o_normalize('embedding')} AS u FROM embeddings)""",
        f"""cand AS MATERIALIZED (
      SELECT query_id, cand_id, rel FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               ROUND({_o_dot('q.u', 'c.u')}, 6) AS rel,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY ROUND({_o_dot('q.u', 'c.u')}, 6) DESC, c.vec_id)
                 AS rn
        FROM unit q JOIN unit c
          ON q.vec_id < {_MMR_QUERIES} AND c.vec_id != q.vec_id)
      WHERE rn <= {_MMR_CANDS})""",
        f"""psim AS MATERIALIZED (
      SELECT a.query_id, a.cand_id AS ca, b.cand_id AS cb,
             ROUND({_o_dot('ua.u', 'ub.u')}, 6) AS sim
      FROM cand a JOIN cand b ON a.query_id = b.query_id
      JOIN unit ua ON ua.vec_id = a.cand_id
      JOIN unit ub ON ub.vec_id = b.cand_id)""",
        f"""sel1 AS MATERIALIZED (
      SELECT query_id, cand_id, 1 AS pick_rank, {lam} * rel AS mmr
      FROM (SELECT query_id, cand_id, rel,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY rel DESC, cand_id) AS rn FROM cand)
      WHERE rn = 1)""",
    ]
    for r in range(2, _MMR_K + 1):
        blocks.append(f"""s{r} AS MATERIALIZED (
      SELECT query_id, cand_id, {r} AS pick_rank, mmr FROM (
        SELECT c.query_id, c.cand_id,
               {lam}*c.rel - {mu}*MAX(p.sim) AS mmr,
               ROW_NUMBER() OVER (PARTITION BY c.query_id ORDER BY
                 {lam}*c.rel - {mu}*MAX(p.sim) DESC, c.cand_id) AS rn
        FROM cand c
        JOIN sel{r - 1} s ON s.query_id = c.query_id
        JOIN psim p ON p.query_id = c.query_id AND p.ca = c.cand_id
                   AND p.cb = s.cand_id
        WHERE NOT EXISTS (SELECT 1 FROM sel{r - 1} s2
                          WHERE s2.query_id = c.query_id
                            AND s2.cand_id = c.cand_id)
        GROUP BY c.query_id, c.cand_id, c.rel)
      WHERE rn = 1)""")
        blocks.append(f"""sel{r} AS MATERIALIZED (
      SELECT * FROM sel{r - 1} UNION ALL SELECT * FROM s{r})""")
    return (
        "WITH "
        + ",\n    ".join(blocks)
        + f"""
    SELECT query_id, cand_id AS vec_id,
           CAST(pick_rank AS BIGINT) AS pick_rank, mmr
    FROM sel{_MMR_K}"""
    )


@query(
    "sim_mmr_diversify",
    oracle=_mmr_oracle(),
    doc=f"Maximal-marginal-relevance diversified top-{_MMR_K} — the "
    "re-ranking step between retrieval and a RAG/recommendation surface "
    "(plain top-k returns near-duplicates; MMR greedily picks the next "
    "result maximizing λ·relevance − (1−λ)·max-similarity-to-picks, "
    f"λ={_MMR_LAMBDA}, ties to smallest id). Stage 1 is the distributed "
    "part and the only stage that touches the corpus: the broadcast "
    "query block scores every candidate partition with BLAS and "
    f"pre-prunes to a local top-{_MMR_CANDS}, exactly the "
    "sim_cosine_topk shape — O(|corpus|) work, shuffle bounded by "
    "queries x shortlist x partitions. Stage 2 (greedy selection over "
    f"{_MMR_QUERIES} shortlists of {_MMR_CANDS}) is O(k·|C|²) on ~80 "
    "rows — the bounded iterative-driver shape (BPE-merge precedent); "
    "at any scale the shortlist, not the corpus, is what MMR iterates "
    "over. Relevance and pair similarities round to 6 digits before "
    "selection (the family's BLAS-vs-fold grain); the mmr objective "
    "itself is then deterministic IEEE arithmetic on both engines. The "
    "oracle unrolls the greedy rounds as MATERIALIZED CTEs (argmax via "
    "window over a per-round max-sim aggregate).",
)
def sim_mmr_diversify(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np

    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    qpdf = e.filter(F.col("vec_id") < _MMR_QUERIES).toPandas()
    q_ids = qpdf["vec_id"].to_numpy(dtype=np.int64)
    qm = np.stack(qpdf["embedding"].to_numpy()).astype(np.float64)
    qm /= np.sqrt((qm * qm).sum(axis=1, keepdims=True))
    qb = spark.sparkContext.broadcast((q_ids, qm))
    nc = _MMR_CANDS

    def op(batches):
        import numpy as np
        import pandas as pd

        q_ids, qm = qb.value
        for b in batches:
            if not len(b):
                continue
            c_ids = b["vec_id"].to_numpy(dtype=np.int64)
            c = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            c /= np.sqrt((c * c).sum(axis=1, keepdims=True))
            scores = np.round(qm @ c.T, 6)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(q_ids)):
                s = scores[qi]
                idx = np.nonzero(c_ids != q_ids[qi])[0]
                if not len(idx):
                    continue
                top = idx[np.lexsort((c_ids[idx], -s[idx]))][:nc]
                out_q.extend([q_ids[qi]] * len(top))
                out_n.extend(c_ids[top].tolist())
                out_s.extend(s[top].tolist())
            yield pd.DataFrame(
                {
                    "query_id": pd.Series(out_q, dtype="int64"),
                    "cand_id": pd.Series(out_n, dtype="int64"),
                    "rel": pd.Series(out_s, dtype="float64"),
                }
            )

    pruned = fan_out(e).mapInPandas(
        op, schema="query_id long, cand_id long, rel double"
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("cand_id")
    )
    shortlist = (
        pruned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nc)
        .select("query_id", "cand_id", "rel")
        .collect()  # bounded: queries x shortlist rows
    )
    cand_ids = sorted({r["cand_id"] for r in shortlist})
    cv = (
        e.filter(F.col("vec_id").isin(cand_ids))
        .toPandas()  # bounded: <= queries x shortlist distinct vectors
    )
    vid = cv["vec_id"].to_numpy(dtype=np.int64)
    vm = np.stack(cv["embedding"].to_numpy()).astype(np.float64)
    vm /= np.sqrt((vm * vm).sum(axis=1, keepdims=True))
    pos = {int(v): i for i, v in enumerate(vid)}

    lam, mu = _MMR_LAMBDA, _MMR_MU
    out = []
    for qv in sorted({r["query_id"] for r in shortlist}):
        rows = sorted(
            (r for r in shortlist if r["query_id"] == qv),
            key=lambda r: (-r["rel"], r["cand_id"]),
        )
        cids = np.array([r["cand_id"] for r in rows], dtype=np.int64)
        crel = np.array([r["rel"] for r in rows], dtype=np.float64)
        cm = vm[[pos[int(i)] for i in cids]]
        csim = np.round(cm @ cm.T, 6)
        picked: list[int] = []
        for rank in range(1, _MMR_K + 1):
            best = None
            for j in range(len(cids)):
                if j in picked:
                    continue
                mmr = (
                    lam * crel[j]
                    if not picked
                    else lam * crel[j] - mu * max(csim[j, p] for p in picked)
                )
                key = (-mmr, int(cids[j]))
                if best is None or key < best[0]:
                    best = (key, j, mmr)
            if best is None:  # shortlist exhausted (< K candidates) — the
                break  # oracle's later rounds are empty too, not an error
            picked.append(best[1])
            out.append((int(qv), int(cids[best[1]]), rank, float(best[2])))
    return spark.createDataFrame(
        out, "query_id long, vec_id long, pick_rank long, mmr double"
    )


# --------------------------------------------------------------------------
# Filtered vector search (metadata-constrained top-k)
# --------------------------------------------------------------------------

_FILTERED_ORACLE = f"""
WITH unit AS (
  SELECT vec_id, label, {_o_normalize('embedding')} AS u FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND({_o_dot('q.u', 'c.u')}, 6) AS score
  FROM unit q JOIN unit c
    ON q.vec_id < {_N_QUERIES} AND c.vec_id != q.vec_id
   AND c.label = q.label
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rn
  FROM scored)
SELECT query_id, neighbor_id, score, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_TOPK}
"""


@query(
    "sim_filtered_topk",
    oracle=_FILTERED_ORACLE,
    doc=f"Metadata-FILTERED vector search: cosine top-{_TOPK} restricted to "
    "candidates sharing the query's label — the constrained-ANN shape "
    "every production retrieval stack needs (tenant/category/language "
    "filters) and the classic pre-vs-post-filter design fork. This is "
    "the PRE-filter path: the label mask is applied inside each "
    "partition's scoring block BEFORE the local top-k, so a query can "
    "never come back short-listed against ineligible neighbors (a "
    "post-filter over an unfiltered top-k underfills k when the filter "
    "is selective — the correctness trap this operator exists to "
    "avoid). Same distributed block-matmul skeleton as sim_cosine_topk: "
    "queries broadcast once with their labels, per-partition BLAS "
    "scoring + masked local top-k, final rank over ≤ |Q|·k·partitions "
    "rows. At 100 TB with a selective filter, the scale path is "
    "label-partitioned storage so the mask becomes partition pruning; "
    "here the mask is in-block (labels are low-cardinality).",
)
def sim_filtered_topk(spark: SparkSession, sf: str) -> DataFrame:
    e = _t(spark, sf, "embeddings").select("vec_id", "embedding", "label")
    qb = _normalized_query_broadcast(
        spark, e.filter(F.col("vec_id") < _N_QUERIES).toPandas(), aux_col="label"
    )

    def mask(qi, q_ids, q_aux, c_ids, c_lab):  # same label, never self
        import numpy as np

        return np.nonzero((c_ids != q_ids[qi]) & (c_lab == q_aux[qi]))[0]

    pruned = fan_out(e).mapInPandas(
        _block_topk_op(qb, _TOPK, mask=mask),
        schema="query_id long, neighbor_id long, score double",
    )
    return _rank_topk(pruned, _TOPK)


# --------------------------------------------------------------------------
# Rank-order agreement: Kendall concordance of ANN vs exact rankings
# --------------------------------------------------------------------------


@query(
    "sim_rank_tau",
    oracle=f"""
    WITH e AS (SELECT query_id, neighbor_id, rn AS re FROM ({_TOPK_ORACLE})),
    a AS (SELECT query_id, neighbor_id, rn AS ra FROM ({_ANN_LSH_ORACLE})),
    c AS (
      SELECT e.query_id, e.re, a.ra
      FROM e JOIN a ON e.query_id = a.query_id
              AND e.neighbor_id = a.neighbor_id
    ),
    pc AS (SELECT query_id, COUNT(*) AS n_common FROM c GROUP BY 1),
    pr AS (
      SELECT c1.query_id, COUNT(*) AS n_pairs,
             SUM(CASE WHEN c1.ra > c2.ra THEN 1 ELSE 0 END) AS discordant
      FROM c c1 JOIN c c2
        ON c1.query_id = c2.query_id AND c1.re < c2.re
      GROUP BY 1
    )
    SELECT pc.query_id,
           CAST(pc.n_common AS BIGINT) AS n_common,
           CAST(COALESCE(pr.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(COALESCE(pr.n_pairs, 0) - COALESCE(pr.discordant, 0)
                AS BIGINT) AS concordant,
           CAST(COALESCE(pr.discordant, 0) AS BIGINT) AS discordant,
           CAST(((COALESCE(pr.n_pairs, 0) - 2 * COALESCE(pr.discordant, 0))
                 * 1000) // GREATEST(COALESCE(pr.n_pairs, 0), 1)
                AS BIGINT) AS tau_milli
    FROM pc LEFT JOIN pr ON pc.query_id = pr.query_id
    """,
    doc=f"Rank-ORDER agreement of the LSH retrieval against the exact "
    f"cosine top-{_TOPK}, per query — the eval recall@k cannot see: two "
    "methods can return the same k items in opposite order and recall "
    "calls them identical. Kendall concordance over the common items is "
    "pure integer counting (concordant/discordant pairs of distinct "
    "ranks; tau in exact fixed-point milli units, truncating div both "
    "engines agree on), so the oracle hash-matches bit-for-bit. Spark "
    "side reuses the two registered retrievals, inner-joins their "
    f"(query, neighbor) pairs, and counts inversions INSIDE a <= {_TOPK}"
    "-element packed array per query (one collect_list + higher-order "
    "functions in codegen) — no pair self-join ever touches the engine, "
    "so cost is the two retrievals plus one bounded-width aggregate; "
    "queries whose candidate sets do not intersect drop out of BOTH "
    "engines identically. At 100 TB the retrievals dominate; the tau "
    "layer is O(queries).",
)
def sim_rank_tau(spark: SparkSession, sf: str) -> DataFrame:
    exact = sim_cosine_topk(spark, sf).select(
        "query_id", "neighbor_id", F.col("rn").alias("re")
    )
    ann = sim_ann_lsh(spark, sf).select(
        "query_id", "neighbor_id", F.col("rn").alias("ra")
    )
    c = exact.join(ann, ["query_id", "neighbor_id"])
    g = c.groupBy("query_id").agg(
        F.array_sort(F.collect_list(F.struct("re", "ra"))).alias("p")
    )
    # inversions of the ra sequence once sorted by re — the discordant count
    disc = F.expr(
        "CASE WHEN size(p) >= 2 THEN aggregate(flatten("
        "transform(sequence(1, size(p) - 1), i -> "
        "transform(sequence(i + 1, size(p)), j -> "
        "CASE WHEN p[i-1].ra > p[j-1].ra THEN 1L ELSE 0L END))), "
        "0L, (acc, x) -> acc + x) ELSE 0L END"
    )
    g = g.select(
        "query_id",
        F.size("p").cast("long").alias("n_common"),
        F.expr("size(p) * (size(p) - 1) div 2").cast("long").alias("n_pairs"),
        disc.alias("discordant"),
    )
    return g.select(
        "query_id",
        "n_common",
        "n_pairs",
        (F.col("n_pairs") - F.col("discordant")).cast("long").alias("concordant"),
        "discordant",
        F.expr(
            "((n_pairs - 2 * discordant) * 1000) div greatest(n_pairs, 1)"
        ).cast("long").alias("tau_milli"),
    )


# --------------------------------------------------------------------------
# Embedding distribution drift (ML-ops shift monitor)
# --------------------------------------------------------------------------

_DRIFT_DIM = 64
_DRIFT_BAR_MICRO = 20_000  # |mean shift| > 0.02 flags the dimension


@query(
    "sim_embedding_drift",
    oracle=f"""
    WITH agg AS (
      SELECT
        {", ".join(
            f"SUM(CASE WHEN vec_id % 2 = 0 THEN CAST(TRUNC(CAST(embedding[{i + 1}]"
            f" AS DOUBLE) * 1000000) AS BIGINT) ELSE 0 END) AS sa{i}, "
            f"SUM(CASE WHEN vec_id % 2 = 1 THEN CAST(TRUNC(CAST(embedding[{i + 1}]"
            f" AS DOUBLE) * 1000000) AS BIGINT) ELSE 0 END) AS sb{i}"
            for i in range(_DRIFT_DIM)
        )},
        SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
        SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS nb
      FROM embeddings
    )
    SELECT dim,
           CAST(mean_ref_micro AS BIGINT) AS mean_ref_micro,
           CAST(mean_cur_micro AS BIGINT) AS mean_cur_micro,
           CAST(mean_cur_micro - mean_ref_micro AS BIGINT) AS delta_micro,
           CAST(CASE WHEN ABS(mean_cur_micro - mean_ref_micro)
                          > {_DRIFT_BAR_MICRO}
                THEN 1 ELSE 0 END AS INTEGER) AS drifted
    FROM (
      {" UNION ALL ".join(
          f"SELECT CAST({i} AS BIGINT) AS dim, sa{i} // na AS mean_ref_micro,"
          f" sb{i} // nb AS mean_cur_micro FROM agg"
          for i in range(_DRIFT_DIM)
      )}
    )
    """,
    doc="Embedding DISTRIBUTION-DRIFT monitor (the ML-ops shift check run "
    "between an embedding model's reference window and the current one "
    "before trusting downstream ANN/dedup results): per dimension, the "
    "fixed-point mean of the even-vec_id half (reference) vs the odd half "
    "(current) and the flagged shift. The q56 discipline: every component "
    "is TRUNCATED to exact integer micro-units before any sum (truncation "
    "of the same double is engine-identical; round-half is not), so no float "
    "summation order exists anywhere and the oracle hash-matches "
    f"bit-for-bit. Execution is ONE map-side-combining pass ({_DRIFT_DIM}"
    "x2 conditional integer sums + 2 counts in a single aggregate — no "
    "explode, no per-dim shuffle), then the 1-row result unpivots to one "
    "row per dimension driver-free. At 100 TB this is a scan-bound "
    "single aggregate whose final reduce is one row of 130 longs.",
)
def sim_embedding_drift(spark: SparkSession, sf: str) -> DataFrame:
    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    # posexplode + ONE 4-expression aggregate keyed by dim, instead of the
    # previous 130-expression single-row aggregate: the wide form spent its
    # whole runtime in analysis/codegen of the 128 conditional decimal sums
    # (2.8 s at sf0.1 for 2000 rows — pure plan fixed cost), and its scan
    # did 64 separate getItem walks per row. Same numbers by construction:
    # every embedding is a non-null 64-vector at every SF (asserted by the
    # generator; min=max=64, 0 nulls), so per-dim conditional counts equal
    # the oracle's whole-row counts, and the per-component expression
    # (double-cast, x1e6, TRUNCATE to long, decimal(38,0) accumulate — the
    # q56 overflow-headroom discipline) is unchanged. At 100 TB the explode
    # is map-local and partial aggregation reduces each task to <=64 rows
    # before the one 64-key exchange.
    ex = e.select(
        (F.col("vec_id") % 2 == 0).alias("even"),
        F.posexplode("embedding").alias("dim", "comp"),
    )
    # TRUNCATION, not ROUND: both engines truncate the identical double
    # exactly, while round-half semantics differ on boundary components.
    # Explicit DOUBLE: the column is array<float> and DuckDB would
    # otherwise multiply in single precision while Spark widens to double.
    micro = (F.col("comp").cast("double") * 1_000_000).cast("long")
    wide = micro.cast("decimal(38,0)")
    ev = F.col("even")
    g = ex.groupBy("dim").agg(
        F.sum(F.when(ev, wide).otherwise(F.lit(0))).alias("sa"),
        F.sum(F.when(~ev, wide).otherwise(F.lit(0))).alias("sb"),
        F.sum(F.when(ev, 1).otherwise(0)).alias("na"),
        F.sum(F.when(~ev, 1).otherwise(0)).alias("nb"),
    )
    z = g.select(
        F.col("dim").cast("long").alias("dim"),
        F.expr("cast(sa div na as bigint)").alias("mean_ref_micro"),
        F.expr("cast(sb div nb as bigint)").alias("mean_cur_micro"),
    )
    delta = F.col("mean_cur_micro") - F.col("mean_ref_micro")
    return z.select(
        "dim",
        F.col("mean_ref_micro").cast("long").alias("mean_ref_micro"),
        F.col("mean_cur_micro").cast("long").alias("mean_cur_micro"),
        delta.cast("long").alias("delta_micro"),
        F.when(F.abs(delta) > _DRIFT_BAR_MICRO, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("drifted"),
    )


# --------------------------------------------------------------------------
# IVF list-balance report (ANN index health check)
# --------------------------------------------------------------------------


@query(
    "sim_ivf_balance",
    oracle=f"""
    WITH unit AS (
      SELECT vec_id, {_o_normalize('embedding')} AS u FROM embeddings
    ),
    cent AS (SELECT vec_id AS cid, u AS cu FROM unit
             WHERE vec_id < {_IVF_NLISTS}),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_o_dot('e.u', 'c.cu')} DESC,
                                           c.cid) AS r
        FROM unit e, cent c)
      WHERE r = 1
    ),
    sizes AS (SELECT cid, COUNT(*) AS ls FROM assign GROUP BY 1)
    SELECT cid,
           CAST(ls AS BIGINT) AS list_size,
           CAST(ls * {_IVF_NLISTS} * 1000 // (SELECT SUM(ls) FROM sizes)
                AS BIGINT) AS load_milli,
           CAST(CASE WHEN ls * {_IVF_NLISTS} * 1000
                          // (SELECT SUM(ls) FROM sizes) > 2000
                THEN 1 ELSE 0 END AS INTEGER) AS hot
    FROM sizes
    """,
    doc="IVF inverted-list BALANCE report — the index health check run "
    "before trusting ANN latency numbers (a hot list means every query "
    "probing it scans disproportionate corpus; the standard remedies — "
    "re-train centroids, split the list — are decided from exactly this "
    "histogram): every corpus vector is assigned to its nearest "
    "centroid (the SAME assignment rule sim_ivf_topk queries against, "
    "so the report describes the real index), and per list the size, "
    "the load factor in milli units (1000 = perfectly balanced), and a "
    ">2x hot flag. Spark side is one Arrow-batched map pass emitting "
    "per-batch partial counts (centroids broadcast, assignment a tiny "
    "BLAS matmul per batch) + one tiny-domain aggregate; at 100 TB it "
    "is scan-bound with an nlists-row result.",
)
def sim_ivf_balance(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np

    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")

    def unit(m: "np.ndarray") -> "np.ndarray":
        return m / np.sqrt((m * m).sum(axis=1, keepdims=True))

    small = e.filter(F.col("vec_id") < _IVF_NLISTS).toPandas()
    cmat = unit(np.stack(small["embedding"].to_numpy()).astype(np.float64))
    bc = e.sparkSession.sparkContext.broadcast(cmat)

    def op(batches):
        import numpy as np
        import pandas as pd

        cmat = bc.value
        for b in batches:
            if not len(b):
                continue
            block = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            block /= np.sqrt((block * block).sum(axis=1, keepdims=True))
            lists = np.argmax(block @ cmat.T, axis=1)
            cids, cnts = np.unique(lists, return_counts=True)
            yield pd.DataFrame(
                {
                    "cid": cids.astype("int64"),
                    "cnt": cnts.astype("int64"),
                }
            )

    partials = fan_out(e).mapInPandas(op, schema="cid long, cnt long")
    sizes = partials.groupBy("cid").agg(F.sum("cnt").alias("list_size"))
    total = int(e.count())  # one scalar action; inlined as a literal below
    load = F.expr(f"list_size * {_IVF_NLISTS} * 1000 div {total}")
    return sizes.select(
        "cid",
        F.col("list_size").cast("long").alias("list_size"),
        load.cast("long").alias("load_milli"),
        F.when(load > 2000, F.lit(1)).otherwise(F.lit(0)).cast("int")
        .alias("hot"),
    )


# --------------------------------------------------------------------------
# Hubness diagnostic — reverse-kNN occurrence distribution
# --------------------------------------------------------------------------

_HUB_QUERIES = 100  # bounded probe set: vec_id < 100, broadcast
_HUB_K = 5


@query(
    "sim_hubness",
    oracle=f"""
    WITH unit AS (
      SELECT vec_id, {_o_normalize('embedding')} AS u FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND({_o_dot('q.u', 'c.u')}, 6) AS score
      FROM unit q JOIN unit c
        ON q.vec_id < {_HUB_QUERIES} AND c.vec_id != q.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rn
      FROM scored
    ),
    occ AS (
      SELECT neighbor_id, COUNT(*) AS k_occ
      FROM ranked WHERE rn <= {_HUB_K}
      GROUP BY neighbor_id
    )
    SELECT CAST(k_occ AS BIGINT) AS k_occ,
           CAST(COUNT(*) AS BIGINT) AS n_neighbors,
           CAST(FLOOR(COUNT(*) * k_occ * 1000.0
                      / {_HUB_QUERIES * _HUB_K}) AS BIGINT) AS slot_milli
    FROM occ GROUP BY k_occ
    """,
    doc=f"Hubness audit — the k-occurrence distribution N_k (Radovanovic et "
    f"al. 2010): over a bounded {_HUB_QUERIES}-query probe set, how many "
    f"times each corpus vector appears in someone's exact top-{_HUB_K}, "
    "histogrammed by occurrence count with each bucket's share of total "
    "neighbor slots in milli. A right-skewed N_k (a few 'hub' vectors "
    "absorbing many slots) is the classic high-dimensional pathology that "
    "silently degrades ANN recall and dedup quality — this is the pre-flight "
    "you run before trusting cosine retrieval on a new embedding model. "
    "Mechanics: the same broadcast block-matmul skeleton as sim_cosine_topk "
    "(probe matrix broadcast, per-partition BLAS + local top-k pre-prune, "
    "corpus never self-joins), then two map-side-combining aggregates over "
    "the ≤ |Q|·k result rows. The slot denominator is the constant |Q|·k, "
    "so no global window is needed. Exact-parity oracle replays the probe "
    "mechanism at oracle scale.",
)
def sim_hubness(spark: SparkSession, sf: str) -> DataFrame:
    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    qb = _normalized_query_broadcast(
        spark, e.filter(F.col("vec_id") < _HUB_QUERIES).toPandas()
    )

    def mask(qi, q_ids, q_aux, c_ids, c_lab):  # exclude self-matches
        import numpy as np

        return np.nonzero(c_ids != q_ids[qi])[0]

    pruned = fan_out(e).mapInPandas(
        _block_topk_op(qb, _HUB_K, mask=mask),
        schema="query_id long, neighbor_id long, score double",
    )
    occ = (
        _rank_topk(pruned, _HUB_K)
        .groupBy("neighbor_id")
        .agg(F.count(F.lit(1)).alias("k_occ"))
    )
    return occ.groupBy("k_occ").agg(
        F.count(F.lit(1)).cast("long").alias("n_neighbors"),
        F.floor(
            F.count(F.lit(1)) * F.first("k_occ") * 1000.0
            / F.lit(_HUB_QUERIES * _HUB_K)
        )
        .cast("long")
        .alias("slot_milli"),
    ).withColumn("k_occ", F.col("k_occ").cast("long"))


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss sign projection + top-k recall eval
# --------------------------------------------------------------------------

_JL_D = 16  # projected dimensions
_JL_K = 10  # top-k whose preservation is scored
# deterministic +-1 projection matrix (16 x 64), sign j,i = parity of
# md5("jl:j:i") — a PUBLIC reproducible construction (Achlioptas 2003
# database-friendly JL: +-1 entries suffice), precomputed at authoring
# time and inlined as literals in BOTH engines so no in-engine hashing
# is needed
_JL_SIGNS = [[-1, -1, -1, 1, 1, 1, 1, -1, 1, 1, 1, 1, 1, -1, -1, 1, 1, -1, 1, -1, -1, -1, 1, -1, -1, 1, -1, 1, 1, 1, -1, -1, 1, 1, 1, -1, 1, -1, 1, -1, -1, 1, -1, -1, -1, 1, -1, -1, -1, 1, 1, -1, 1, -1, 1, 1, 1, -1, -1, 1, -1, -1, 1, 1], [1, -1, -1, 1, -1, -1, -1, -1, 1, -1, 1, 1, -1, 1, 1, 1, -1, 1, -1, 1, -1, -1, 1, 1, 1, -1, -1, 1, -1, 1, 1, -1, 1, -1, 1, -1, 1, 1, -1, -1, -1, -1, -1, 1, 1, 1, -1, 1, -1, -1, -1, -1, 1, -1, -1, -1, -1, -1, -1, -1, 1, -1, -1, 1], [1, -1, -1, -1, -1, 1, 1, 1, -1, -1, -1, 1, -1, -1, 1, 1, 1, -1, -1, -1, 1, -1, 1, -1, 1, -1, 1, -1, 1, -1, 1, 1, -1, 1, -1, -1, 1, 1, 1, 1, -1, -1, 1, 1, 1, -1, 1, -1, -1, -1, -1, 1, 1, -1, 1, -1, 1, -1, 1, 1, -1, -1, 1, 1], [-1, -1, 1, 1, -1, 1, -1, 1, -1, 1, 1, -1, -1, -1, -1, -1, 1, -1, 1, -1, 1, 1, -1, 1, -1, -1, -1, -1, 1, 1, -1, -1, -1, 1, -1, -1, -1, -1, -1, -1, 1, -1, 1, 1, -1, -1, 1, 1, 1, 1, -1, -1, -1, -1, -1, 1, -1, 1, -1, 1, -1, 1, -1, 1], [-1, 1, -1, 1, 1, 1, -1, -1, 1, 1, 1, -1, -1, -1, -1, -1, 1, 1, -1, 1, 1, -1, -1, 1, 1, -1, -1, -1, 1, -1, 1, -1, -1, 1, -1, -1, -1, -1, 1, -1, -1, -1, 1, 1, -1, 1, -1, -1, -1, -1, 1, 1, 1, 1, -1, -1, -1, 1, 1, -1, -1, -1, 1, -1], [1, -1, 1, 1, -1, 1, 1, -1, -1, -1, -1, 1, -1, 1, 1, -1, 1, -1, 1, 1, -1, -1, 1, -1, -1, 1, 1, -1, 1, -1, 1, -1, 1, 1, -1, 1, -1, -1, -1, -1, 1, -1, 1, -1, -1, 1, -1, -1, -1, 1, -1, 1, -1, 1, -1, 1, -1, 1, 1, -1, 1, -1, 1, -1], [1, 1, -1, 1, 1, 1, 1, -1, 1, -1, -1, -1, -1, -1, 1, 1, -1, -1, -1, -1, 1, -1, 1, -1, -1, 1, 1, -1, 1, -1, 1, -1, 1, -1, -1, 1, 1, -1, 1, 1, -1, 1, 1, 1, -1, 1, -1, -1, -1, 1, 1, 1, 1, 1, -1, 1, -1, -1, 1, -1, 1, 1, -1, 1], [-1, -1, -1, 1, 1, -1, -1, 1, -1, 1, -1, 1, 1, -1, 1, -1, -1, -1, -1, 1, -1, -1, -1, -1, -1, -1, 1, 1, 1, 1, -1, 1, 1, 1, -1, -1, 1, -1, 1, 1, 1, -1, -1, -1, -1, 1, -1, 1, 1, -1, -1, -1, 1, -1, 1, -1, 1, 1, -1, 1, 1, 1, -1, 1], [1, -1, 1, 1, -1, -1, 1, -1, 1, -1, 1, 1, -1, -1, -1, -1, 1, 1, -1, -1, -1, -1, 1, -1, -1, 1, -1, -1, 1, 1, -1, 1, -1, 1, -1, -1, 1, 1, 1, 1, -1, -1, -1, 1, 1, -1, 1, 1, -1, 1, -1, -1, -1, 1, 1, 1, -1, -1, -1, 1, -1, 1, -1, 1], [1, 1, -1, -1, -1, 1, 1, -1, -1, -1, -1, -1, 1, 1, 1, -1, -1, 1, 1, -1, -1, 1, 1, 1, 1, 1, 1, -1, -1, 1, -1, 1, 1, -1, 1, 1, 1, -1, 1, -1, -1, 1, -1, -1, -1, -1, 1, -1, -1, -1, -1, 1, -1, -1, -1, 1, -1, 1, 1, -1, -1, -1, -1, 1], [-1, 1, 1, -1, -1, -1, 1, 1, -1, -1, 1, 1, 1, 1, 1, -1, 1, 1, 1, 1, 1, -1, -1, -1, 1, -1, -1, -1, 1, -1, 1, 1, -1, -1, 1, 1, 1, -1, 1, -1, 1, -1, 1, 1, 1, 1, 1, -1, 1, -1, -1, 1, 1, -1, -1, 1, 1, 1, -1, -1, 1, 1, -1, -1], [1, 1, -1, 1, -1, 1, -1, -1, -1, 1, 1, 1, 1, 1, 1, -1, 1, 1, 1, -1, 1, -1, -1, 1, 1, -1, 1, -1, 1, -1, 1, 1, 1, 1, -1, -1, -1, 1, 1, -1, -1, -1, 1, 1, 1, 1, 1, -1, 1, 1, -1, 1, 1, 1, -1, 1, -1, 1, 1, -1, 1, -1, 1, -1], [1, 1, 1, -1, -1, -1, -1, 1, 1, -1, -1, 1, 1, 1, 1, -1, 1, 1, -1, 1, -1, -1, 1, -1, 1, 1, 1, -1, 1, -1, -1, 1, 1, 1, -1, -1, 1, 1, 1, -1, -1, -1, -1, -1, -1, 1, -1, 1, 1, -1, -1, -1, -1, 1, 1, 1, -1, -1, -1, 1, -1, -1, 1, -1], [-1, -1, 1, -1, 1, 1, 1, 1, 1, -1, -1, 1, -1, 1, 1, 1, 1, -1, -1, -1, -1, -1, 1, 1, 1, 1, 1, 1, 1, 1, -1, 1, -1, 1, 1, 1, -1, -1, 1, 1, -1, -1, -1, -1, 1, -1, 1, -1, 1, 1, 1, -1, -1, 1, -1, -1, 1, 1, 1, 1, 1, -1, 1, -1], [1, 1, 1, -1, 1, -1, 1, -1, -1, -1, 1, -1, -1, 1, -1, -1, 1, -1, -1, 1, 1, 1, 1, -1, -1, 1, 1, -1, 1, 1, -1, 1, -1, -1, -1, 1, 1, -1, -1, -1, -1, 1, -1, 1, -1, 1, 1, -1, -1, -1, 1, -1, -1, 1, -1, -1, -1, 1, -1, -1, 1, 1, -1, -1], [-1, -1, 1, -1, 1, 1, -1, -1, 1, -1, 1, 1, -1, -1, -1, 1, 1, 1, 1, 1, -1, 1, 1, 1, -1, -1, 1, 1, -1, -1, -1, -1, 1, 1, 1, 1, 1, 1, -1, 1, 1, -1, 1, 1, -1, -1, 1, 1, -1, 1, -1, 1, 1, 1, 1, 1, 1, 1, 1, -1, 1, 1, 1, -1]]

_JL_ORACLE = f"""
WITH v AS (
  SELECT vec_id,
         LIST_TRANSFORM(embedding,
           x -> CAST(TRUNC(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS vi
  FROM embeddings),
sm AS (SELECT {_JL_SIGNS} AS s),
-- the sign matrix binds ONCE as a 1-row cross-joined column: inlining the
-- 16x64 literal inside the lambda makes DuckDB re-construct the nested
-- list per ELEMENT evaluation (measured 153 s -> ~2 s at sf0.01)
p AS (
  SELECT vec_id, vi,
         LIST_TRANSFORM(RANGE(1, {_JL_D + 1}),
           j -> LIST_SUM(LIST_TRANSFORM(RANGE(1, 65),
             i -> vi[i] * sm.s[j][i]))) AS pj
  FROM v, sm),
q AS (SELECT vec_id AS qid, vi AS qvi, pj AS qpj FROM p
      WHERE vec_id < {_N_QUERIES}),
c AS (SELECT vec_id, vi, pj FROM p WHERE vec_id >= {_N_QUERIES}),
d AS (
  SELECT q.qid, c.vec_id,
         LIST_SUM(LIST_TRANSFORM(RANGE(1, 65),
           i -> (c.vi[i] - q.qvi[i]) * (c.vi[i] - q.qvi[i]))) AS fdist,
         LIST_SUM(LIST_TRANSFORM(RANGE(1, {_JL_D + 1}),
           j -> (c.pj[j] - q.qpj[j]) * (c.pj[j] - q.qpj[j]))) AS pdist
  FROM q, c),
r AS (
  SELECT qid, vec_id,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY fdist, vec_id) AS fr,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY pdist, vec_id) AS pr
  FROM d)
SELECT qid AS query_id,
       CAST(COUNT(CASE WHEN fr <= {_JL_K} AND pr <= {_JL_K} THEN 1 END)
            AS BIGINT) AS n_overlap,
       CAST(COUNT(CASE WHEN fr <= {_JL_K} AND pr <= {_JL_K} THEN 1 END)
            * 1000 // {_JL_K} AS BIGINT) AS recall_milli
FROM r GROUP BY qid
"""


@query(
    "sim_jl_projection",
    oracle=_JL_ORACLE,
    doc=f"Johnson-Lindenstrauss SIGN projection (Achlioptas-style +-1 "
    f"matrix, 64 -> {_JL_D} dims = 4x less memory/bandwidth per vector) "
    f"with an in-query quality eval: for each of the {_N_QUERIES} query "
    f"vectors, the top-{_JL_K} by exact L2 in the PROJECTED space vs the "
    f"full space, scored as recall@{_JL_K} — the measurement you run "
    "before swapping a pipeline's ANN pre-filter onto compressed vectors "
    "(the dimensionality twin of sim_quantize_int8's precision cut). "
    "Deterministic end to end: coordinates truncate to integer micro-"
    "units, the projection is an integer +-1 matmul (inlined literal "
    "matrix — no in-engine RNG or hashing), distances are exact int64, "
    "ties break on vec_id; the oracle replays projection, both distance "
    "sets, both rankings, and the overlap bit-for-bit. Scale shape: "
    "projection + block-local top-k pruning run Arrow-batched per "
    "partition against the broadcast query matrix (both spaces pruned in "
    "the same pass, so the ranking shuffle carries <= 2k rows per query "
    "per partition); the corpus never self-joins and never leaves its "
    "partitions — the sim_cosine_topk discipline.",
)
def sim_jl_projection(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np

    e = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    qpdf = e.filter(F.col("vec_id") < _N_QUERIES).toPandas()
    schema = "query_id long, n_overlap long, recall_milli long"
    if not len(qpdf):
        return spark.createDataFrame([], schema)
    S = np.asarray(_JL_SIGNS, dtype=np.int64)  # d x 64
    order = np.argsort(qpdf["vec_id"].to_numpy())
    qv = np.trunc(
        np.stack(qpdf["embedding"].to_numpy())[order].astype(np.float64)
        * 1_000_000
    ).astype(np.int64)
    qids = qpdf["vec_id"].to_numpy(dtype=np.int64)[order]
    qp = qv @ S.T
    bc = spark.sparkContext.broadcast((qids, qv, qp))
    k = _JL_K
    nq = _N_QUERIES

    def op(batches):
        import pandas as pd

        qids, qv, qp = bc.value
        Sm = np.asarray(_JL_SIGNS, dtype=np.int64)
        for pdf in batches:
            pdf = pdf[pdf["vec_id"] >= nq]
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cv = np.trunc(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                * 1_000_000
            ).astype(np.int64)
            cp = cv @ Sm.T
            out_q, out_c, out_f, out_p = [], [], [], []
            for t in range(len(qids)):
                fd = ((cv - qv[t]) ** 2).sum(axis=1)
                pd_ = ((cp - qp[t]) ** 2).sum(axis=1)
                keep = set()
                # per-batch partial top-k in EACH space: the global top-k
                # of either space is contained in the union of its batch
                # partials; extra rows can only rank below them
                for dist in (fd, pd_):
                    sel = np.lexsort((ids, dist))[: min(k, len(ids))]
                    keep.update(int(s) for s in sel)
                for s in sorted(keep):
                    out_q.append(int(qids[t]))
                    out_c.append(int(ids[s]))
                    out_f.append(int(fd[s]))
                    out_p.append(int(pd_[s]))
            yield pd.DataFrame(
                {
                    "qid": pd.Series(out_q, dtype="int64"),
                    "vec_id": pd.Series(out_c, dtype="int64"),
                    "fdist": pd.Series(out_f, dtype="int64"),
                    "pdist": pd.Series(out_p, dtype="int64"),
                }
            )

    partials = fan_out(e).mapInPandas(
        op, schema="qid long, vec_id long, fdist long, pdist long"
    )
    wf = W.partitionBy("qid").orderBy("fdist", "vec_id")
    wp = W.partitionBy("qid").orderBy("pdist", "vec_id")
    ranked = partials.withColumn("fr", F.row_number().over(wf)).withColumn(
        "pr", F.row_number().over(wp)
    )
    both = F.when((F.col("fr") <= k) & (F.col("pr") <= k), 1)
    return ranked.groupBy(F.col("qid").alias("query_id")).agg(
        F.count(both).cast("long").alias("n_overlap"),
        (F.count(both) * F.lit(1000) / F.lit(k))
        .cast("long")
        .alias("recall_milli"),
    )
