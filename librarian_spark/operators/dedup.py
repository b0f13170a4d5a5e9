"""Deduplication operators over the ``documents`` table.

Four strategies, trading exactness for scale (no reference analogue — these are
the training-data-pipeline extensions):

- **exact**: hash-groupBy on the full text. One shuffle on md5(text).
- **n-gram Jaccard** (exact near-dup): shingle → explode → self-join on shingle →
  count-based Jaccard. Exact but O(pairs sharing a shingle) — the correctness
  oracle for the approximate methods.
- **MinHash + LSH** (approximate near-dup): k minhashes per doc → banded
  signatures → join only within LSH buckets → verify candidates with exact
  Jaccard. This is the 100 TB path: the only join is on (band, signature), whose
  cardinality is |docs|×bands, and the verify step touches candidate pairs only.
- **SimHash**: 64-bit weighted-projection fingerprint; hamming-close pairs within
  LSH bands over bit-slices.

Determinism: all hash families derive from xxhash64 with fixed literal seeds, so
every run (and every engine re-run) produces identical signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from librarian_spark.functions.textfns import shingles_of_tokens, tokens
from librarian_spark.operators.registry import query
from librarian_spark.sources.batch import fan_out
from librarian_spark.sources.batch import load_table as _t

# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
    SELECT doc_id,
           MD5(text) AS text_md5,
           MIN(doc_id) OVER (PARTITION BY MD5(text)) AS canonical_id,
           (doc_id != MIN(doc_id) OVER (PARTITION BY MD5(text))) AS is_duplicate
    FROM documents
    """,
    doc="Exact dedup via hash-groupBy: every doc mapped to the min doc_id of its "
    "text-hash group. One shuffle on md5(text) — hashing first keeps the shuffle "
    "key 32 bytes instead of the full document.",
)
def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    w = W.partitionBy(F.md5(F.col("text").cast("binary")))
    canonical = F.min("doc_id").over(w)
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
        canonical.alias("canonical_id"),
        (F.col("doc_id") != canonical).alias("is_duplicate"),
    )


# --------------------------------------------------------------------------
# Exact n-gram Jaccard near-dup (the oracle-grade method)
# --------------------------------------------------------------------------

_JACCARD_THRESHOLD = 0.5

_NGRAM_ORACLE = f"""
WITH sh AS (
  SELECT doc_id,
         LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(w) - 1, 1)),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
           AS shingles
  FROM (SELECT doc_id, STR_SPLIT(TRIM(LOWER(text)), ' ') AS w FROM documents)
),
ex AS (SELECT doc_id, UNNEST(shingles) AS s FROM sh),
pairs AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, COUNT(*) AS n_common
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_id_1, p.doc_id_2,
       CAST(p.n_common AS BIGINT) AS n_common,
       ROUND(p.n_common * 1.0 / (LEN(s1.shingles) + LEN(s2.shingles) - p.n_common), 6)
         AS jaccard
FROM pairs p
JOIN sh s1 ON p.doc_id_1 = s1.doc_id
JOIN sh s2 ON p.doc_id_2 = s2.doc_id
WHERE p.n_common * 1.0 / (LEN(s1.shingles) + LEN(s2.shingles) - p.n_common)
      >= {_JACCARD_THRESHOLD}
"""


def ngram_jaccard_pairs(
    spark: SparkSession, sf: str, threshold: float = _JACCARD_THRESHOLD
) -> DataFrame:
    """All document pairs with word-3-gram Jaccard ≥ threshold (exact).

    Plan: shingle-set per doc (map-only) → explode → self-equi-join on the
    shingle string → per-pair common count → Jaccard from the three set sizes.
    The join is on the shingle value, so cost is Σ_s |docs(s)|² — fine while no
    shingle is ubiquitous; at 100 TB drop stop-shingles (document frequency cap)
    first, or use the MinHash path below.
    """
    sh = shingle_sets(spark, sf)
    sizes = sh.select("doc_id", F.size("shingles").alias("n_shingles"))
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id_1"), F.col("b.doc_id").alias("doc_id_2")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    s1 = sizes.withColumnRenamed("doc_id", "doc_id_1").withColumnRenamed(
        "n_shingles", "n1"
    )
    s2 = sizes.withColumnRenamed("doc_id", "doc_id_2").withColumnRenamed(
        "n_shingles", "n2"
    )
    jac = F.col("n_common") * F.lit(1.0) / (F.col("n1") + F.col("n2") - F.col("n_common"))
    return (
        pairs.join(F.broadcast(s1), "doc_id_1")
        .join(F.broadcast(s2), "doc_id_2")
        .filter(jac >= threshold)
        .select(
            "doc_id_1",
            "doc_id_2",
            F.col("n_common").cast("long").alias("n_common"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


@query("dedup_ngram_jaccard", oracle=_NGRAM_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    return ngram_jaccard_pairs(spark, sf)


# --------------------------------------------------------------------------
# MinHash + LSH near-dup (the scale path)
# --------------------------------------------------------------------------

_MINHASH_K = 64  # minhash functions
_LSH_BANDS = 16  # bands of 4 rows each → catches jaccard ≳ 0.5 reliably
_ROWS_PER_BAND = _MINHASH_K // _LSH_BANDS
_MERSENNE31 = (1 << 31) - 1  # universal-hash prime; a·h ≤ 2^62 stays in int64


def _hash_family(k: int = _MINHASH_K) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i = (a·h + b) mod 2^31-1, a,b < p via a
    fixed LCG. The multiplier must be large enough to wrap the modulus — an
    order-preserving affine map would make every minhash pick the same argmin
    shingle and the signature would carry one bit of information."""
    pairs, x = [], 0x5DEECE66D
    for _ in range(k):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (x >> 16) % (_MERSENNE31 - 1) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = (x >> 16) % _MERSENNE31
        pairs.append((a, b))
    return pairs


def shingle_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Cached doc_id → distinct word-3-gram set. Shared by the signature build
    and the candidate-verify joins so the corpus text is shingled exactly once.

    Tokenizes in its own projection, then shingles from the materialized token
    array — see :func:`shingles_of_tokens` for why the two-step shape matters.
    """
    d = fan_out(_t(spark, sf, "documents"))
    toks = d.select("doc_id", tokens("text").alias("w"))
    return toks.select(
        "doc_id", shingles_of_tokens("w").alias("shingles")
    ).cache()


def minhash_signatures(spark: SparkSession, sf: str) -> DataFrame:
    """doc_id → array of K minhashes.

    Base hash: xxhash64(shingle) reduced mod 2^31-1 (keeps a·h + b inside int64 —
    ANSI mode overflow-checks). Family: h_i = (a_i·h + b_i) mod p.

    Formulation: explode shingles → K ``min`` aggregates grouped by doc_id. The
    K mins combine map-side (partial aggregation), so the shuffle carries only
    |docs|×K longs regardless of corpus size — and every expression (explode,
    xxhash64, the affine maps, the hash-agg mins) stays inside whole-stage
    codegen. MEASURED dead end (do not redo): the shuffle-free
    ``array_min(transform(...))`` form runs the K maps as interpreted HOFs and
    is 3-5× slower with wild run-to-run variance (4.7s-21.8s at sf0.1
    depending on JVM warmth) despite doing no shuffle.
    """
    sh = shingle_sets(spark, sf)
    ex = sh.select("doc_id", F.explode("shingles").alias("s")).withColumn(
        "h", F.abs(F.xxhash64("s")) % _MERSENNE31
    )
    mins = [
        F.min((F.col("h") * a + b) % _MERSENNE31).alias(f"mh_{i}")
        for i, (a, b) in enumerate(_hash_family())
    ]
    sig = ex.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[f"mh_{i}" for i in range(_MINHASH_K)]).alias("sig")
    )


def minhash_lsh_candidates(spark: SparkSession, sf: str) -> DataFrame:
    """Candidate pairs from banded LSH: docs sharing ≥1 identical band signature."""
    sig = minhash_signatures(spark, sf)
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.element_at("sig", i + 1)
                            for i in range(
                                b * _ROWS_PER_BAND, (b + 1) * _ROWS_PER_BAND
                            )
                        ]
                    )
                    for b in range(_LSH_BANDS)
                ]
            )
        ).alias("band", "band_sig"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_1"), F.col("b.doc_id").alias("doc_id_2")
        )
        .distinct()
    )


@query(
    "dedup_minhash_lsh",
    oracle=_NGRAM_ORACLE,
    doc="MinHash(64)+LSH(16×4) candidates, verified with exact Jaccard ≥ 0.5 "
    "computed ONLY on candidate pairs (array_intersect of the two shingle sets) — "
    "never the all-pairs shingle join. Same output contract as "
    "dedup_ngram_jaccard (the exact oracle); with these parameters the per-pair "
    "miss probability at j=0.5 is (1-0.5⁴)¹⁶ ≈ 0.35 in theory, but the planted "
    "near-dups sit at j≥0.9 where it is < 1e-7 — and the exact-verify step "
    "removes all false positives, so LSH recall is the only approximation. At "
    "100 TB total join traffic is |docs|×bands for candidates plus "
    "|candidate pairs| for verification.",
)
def dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    sh = shingle_sets(spark, sf)
    cands = minhash_lsh_candidates(spark, sf)
    s1 = sh.select(F.col("doc_id").alias("doc_id_1"), F.col("shingles").alias("sh1"))
    s2 = sh.select(F.col("doc_id").alias("doc_id_2"), F.col("shingles").alias("sh2"))
    # verify candidates exactly: fetch both shingle sets per candidate pair and
    # intersect — O(|candidates|), not O(pairs sharing a shingle)
    n_common = F.size(F.array_intersect("sh1", "sh2"))
    jac = n_common * F.lit(1.0) / (F.size("sh1") + F.size("sh2") - n_common)
    return (
        cands.join(s1, "doc_id_1")
        .join(s2, "doc_id_2")
        .withColumn("raw_jac", jac)  # filter on the unrounded value (oracle parity)
        .filter(F.col("raw_jac") >= _JACCARD_THRESHOLD)
        .select(
            "doc_id_1",
            "doc_id_2",
            n_common.cast("long").alias("n_common"),
            F.round("raw_jac", 6).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# SimHash near-dup
# --------------------------------------------------------------------------

_SIMHASH_BITS = 64


def simhash(spark: SparkSession, sf: str) -> DataFrame:
    """doc_id → 64-bit SimHash of the token multiset.

    Per token: xxhash64 → for each bit, vote +1/-1; fingerprint bit b = sign of
    the vote sum. Expressed as 64 conditional sums over the exploded tokens —
    one shuffle on doc_id (same shape as minhash_signatures).
    """
    d = fan_out(_t(spark, sf, "documents"))
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), " ")).alias("t"),
    ).withColumn("h", F.xxhash64("t"))
    one = F.lit(1).cast("long")
    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.shiftleft(one, b)) != 0, 1).otherwise(-1)
        ).alias(f"v_{b}")
        for b in range(_SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    fp = None
    for b in range(_SIMHASH_BITS):
        # shiftleft instead of a 1<<b literal: 1<<63 overflows a signed-long lit
        bit = F.when(F.col(f"v_{b}") > 0, F.shiftleft(one, b)).otherwise(
            F.lit(0).cast("long")
        )
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return agg.select("doc_id", fp.alias("simhash"))


@query(
    "dedup_simhash",
    oracle=None,  # bit-level fingerprint pairs aren't ANSI-SQL-expressible tersely
    doc="SimHash-64 hamming-close pairs (≤ 8 differing bits) via 8-way band LSH "
    "on bit-slices: docs agreeing on any 8-bit slice are candidates, then exact "
    "popcount filter. Rows-only check; recall/precision asserted in unit tests "
    "against the exact Jaccard pairs.",
)
def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    fps = simhash(spark, sf)
    slices = fps.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), 8 * i).bitwiseAND(
                        F.lit(0xFF)
                    )
                    for i in range(8)
                ]
            )
        ).alias("slice_idx", "slice_val"),
    )
    a, b = slices.alias("a"), slices.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.slice_idx") == F.col("b.slice_idx"))
            & (F.col("a.slice_val") == F.col("b.slice_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
            F.col("a.simhash").alias("sh1"),
            F.col("b.simhash").alias("sh2"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2")))
    return cands.select(
        "doc_id_1", "doc_id_2", hamming.cast("long").alias("hamming")
    ).filter(F.col("hamming") <= 8)
