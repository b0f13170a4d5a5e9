"""Text-analysis operators over the ``documents`` table.

These are the training-data-pipeline text ops (no reference analogue — librarian
moves bytes, it never inspects text): token counting, quality scoring, language
ID, and document fingerprinting. All pure DataFrame expressions (whole-stage
codegen; no shuffle except stated) so they scale linearly with the corpus: at
100 TB each is a single map-only pass over the documents, partition-parallel,
with no driver involvement.

Every operator has an exact DuckDB oracle — the scoring formulas use only
integer arithmetic and single IEEE divisions, which are bit-reproducible across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from librarian_spark.functions.numeric import hash_bucket, o_hash_bucket
from librarian_spark.functions.textfns import (
    FP_MOD,
    STOPWORDS,
    fingerprint,
    fingerprint_codes,
    o_fingerprint,
    o_shingles,
    shingles_of_tokens,
    tokens,
)
from librarian_spark.operators.registry import query
from librarian_spark.sources.batch import fan_out
from librarian_spark.sources.batch import load_table as _t

# --------------------------------------------------------------------------
# Token counting
# --------------------------------------------------------------------------


@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           CAST(LEN(w) AS BIGINT) AS n_tokens,
           CAST(LEN(LIST_DISTINCT(w)) AS BIGINT) AS n_uniq_tokens,
           LENGTH(TRIM(text)) * 1.0 / LEN(w) AS avg_token_len
    FROM (SELECT doc_id, text, STR_SPLIT(TRIM(LOWER(text)), ' ') AS w FROM documents)
    """,
    doc="Whitespace token counts + type/token stats; map-only, no shuffle.",
)
def text_token_count(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    w = tokens("text")
    return d.select(
        "doc_id",
        F.size(w).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("long").alias("n_uniq_tokens"),
        (F.length(F.trim(F.col("text"))) * F.lit(1.0) / F.size(w)).alias(
            "avg_token_len"
        ),
    )


# BPE-ish subword segmentation: the GPT-2-style pre-tokenizer pattern reduced
# to ASCII classes that Java regex (Spark) and RE2 (DuckDB) interpret
# identically — runs of letters, runs of digits, runs of other non-space
# symbols, each optionally absorbing one leading space.
_BPE_PATTERN = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


@query(
    "text_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(LEN(pieces) AS BIGINT) AS n_pieces,
           CAST(LEN(LIST_DISTINCT(pieces)) AS BIGINT) AS n_uniq_pieces,
           CAST(LEN(LIST_FILTER(pieces, p -> LENGTH(p) >= 4)) AS BIGINT) AS n_long_pieces
    FROM (SELECT doc_id,
                 regexp_extract_all(LOWER(text), '{_BPE_PATTERN}') AS pieces
          FROM documents)
    """,
    doc="BPE-ish token counting: a GPT-2-style pre-tokenizer regex (letter / "
    "digit / symbol runs with leading-space absorption) as a cheap stand-in "
    "for a learned BPE vocab — the count is the standard per-document budget "
    "signal for LLM training pipelines. Map-only, regex inside codegen, no "
    "shuffle; at 100 TB this is a pure scan-rate-bound pass.",
)
def text_bpe_token_count(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    pieces = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_PATTERN), 0)
    d = d.select("doc_id", pieces.alias("p"))
    return d.select(
        "doc_id",
        F.size("p").cast("long").alias("n_pieces"),
        F.size(F.array_distinct("p")).cast("long").alias("n_uniq_pieces"),
        F.size(F.filter("p", lambda x: F.length(x) >= 4))
        .cast("long")
        .alias("n_long_pieces"),
    )


# --------------------------------------------------------------------------
# Quality scoring
# --------------------------------------------------------------------------

_EN_STOP_SQL = "['" + "','".join(STOPWORDS["en"]) + "']"


@query(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars,
           CAST(LEN(w) AS BIGINT) AS n_tokens,
           CAST(LEN(LIST_FILTER(w, t -> LIST_CONTAINS({_EN_STOP_SQL}, t))) AS BIGINT)
             AS n_stopwords,
           LEN(LIST_FILTER(w, t -> LIST_CONTAINS({_EN_STOP_SQL}, t))) * 1.0
             / GREATEST(LEN(w), 1) AS stopword_ratio,
           LEN(LIST_DISTINCT(w)) * 1.0 / GREATEST(LEN(w), 1) AS uniq_ratio,
           (LEN(w) BETWEEN 5 AND 1000
            AND LEN(LIST_DISTINCT(w)) * 1.0 / GREATEST(LEN(w), 1) > 0.2) AS keep
    FROM (SELECT doc_id, text, STR_SPLIT(TRIM(LOWER(text)), ' ') AS w FROM documents)
    """,
    doc="Heuristic quality gate (length band + lexical diversity + stopword "
    "density) — the standard pre-training corpus filter shape; map-only.",
)
def text_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    w = tokens("text")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n_tok = F.size(w)
    n_stop = F.size(F.filter(w, lambda t: F.array_contains(stop_arr, t)))
    uniq_ratio = F.size(F.array_distinct(w)) * F.lit(1.0) / F.greatest(
        n_tok, F.lit(1)
    )
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        n_stop.cast("long").alias("n_stopwords"),
        (n_stop * F.lit(1.0) / F.greatest(n_tok, F.lit(1))).alias("stopword_ratio"),
        uniq_ratio.alias("uniq_ratio"),
        (n_tok.between(5, 1000) & (uniq_ratio > 0.2)).alias("keep"),
    )


# --------------------------------------------------------------------------
# Language ID (stopword-vote heuristic)
# --------------------------------------------------------------------------


def _votes_sql(lang: str) -> str:
    lst = "['" + "','".join(STOPWORDS[lang]) + "']"
    return f"LEN(LIST_FILTER(w, t -> LIST_CONTAINS({lst}, t)))"


@query(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id,
           CASE
             WHEN {_votes_sql('en')} >= GREATEST({_votes_sql('de')}, {_votes_sql('es')}, {_votes_sql('fr')}, 1) THEN 'en'
             WHEN {_votes_sql('de')} >= GREATEST({_votes_sql('es')}, {_votes_sql('fr')}, 1) THEN 'de'
             WHEN {_votes_sql('es')} >= GREATEST({_votes_sql('fr')}, 1) THEN 'es'
             WHEN {_votes_sql('fr')} >= 1 THEN 'fr'
             ELSE 'und'
           END AS lang_pred,
           CAST({_votes_sql('en')} AS BIGINT) AS votes_en
    FROM (SELECT doc_id, STR_SPLIT(TRIM(LOWER(text)), ' ') AS w FROM documents)
    """,
    doc="Stopword-vote language ID with a deterministic precedence order "
    "(en>de>es>fr on ties). A production lang-ID swaps in a fastText-style "
    "model via pandas_udf; the plumbing (map-only pass, per-doc label) is identical.",
)
def text_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    w = tokens("text")

    def votes(lang: str):
        arr = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
        return F.size(F.filter(w, lambda t: F.array_contains(arr, t)))

    en, de, es, fr = votes("en"), votes("de"), votes("es"), votes("fr")
    pred = (
        F.when(en >= F.greatest(de, es, fr, F.lit(1)), "en")
        .when(de >= F.greatest(es, fr, F.lit(1)), "de")
        .when(es >= F.greatest(fr, F.lit(1)), "es")
        .when(fr >= F.lit(1), "fr")
        .otherwise("und")
    )
    return d.select(
        "doc_id", pred.alias("lang_pred"), en.cast("long").alias("votes_en")
    )


# --------------------------------------------------------------------------
# Document fingerprinting
# --------------------------------------------------------------------------


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           {o_fingerprint('text')} AS fp,
           {o_fingerprint("TRIM(LOWER(text))")} AS fp_normalized
    FROM documents
    """,
    doc=f"Polynomial rolling-hash fingerprint (base 31 mod {FP_MOD}) on raw and "
    "normalized text — cheap identity for exact-dup detection and incremental "
    "re-crawl diffing; map-only.",
)
def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(_t(spark, sf, "documents"))
    return d.select(
        "doc_id",
        fingerprint("text").alias("fp"),
        F.aggregate(
            F.split(F.trim(F.lower(F.col("text"))), ""),
            F.lit(0).cast("long"),
            lambda acc, ch: (acc * 31 + F.ascii(ch)) % FP_MOD,
        ).alias("fp_normalized"),
    )


# --------------------------------------------------------------------------
# Document chunking (context-window splitting)
# --------------------------------------------------------------------------

_CHUNK_CHARS = 200  # chunk width
_CHUNK_OVERLAP = 50  # chars shared between consecutive chunks
_CHUNK_STRIDE = _CHUNK_CHARS - _CHUNK_OVERLAP

# single source of truth: text_chunk (codegen) and text_chunk_udtf (Python
# UDTF) pin against the SAME oracle string - two copies would drift
_CHUNK_ORACLE = f"""
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           SUBSTRING(text, CAST(i * {_CHUNK_STRIDE} + 1 AS BIGINT), {_CHUNK_CHARS})
             AS chunk_text,
           CAST(LENGTH(SUBSTRING(text, CAST(i * {_CHUNK_STRIDE} + 1 AS BIGINT),
                                 {_CHUNK_CHARS})) AS BIGINT) AS chunk_len
    FROM (SELECT doc_id, text,
                 UNNEST(RANGE(0, GREATEST(CAST(CEIL((LENGTH(text) - {_CHUNK_OVERLAP})
                       * 1.0 / {_CHUNK_STRIDE}) AS BIGINT), 1))) AS i
          FROM documents)
    """


@query(
    "text_chunk",
    oracle=_CHUNK_ORACLE,
    doc=f"Sliding-window document chunking ({_CHUNK_CHARS}-char windows, "
    f"{_CHUNK_OVERLAP}-char overlap) — the context-window splitting step every "
    "RAG / pre-training pipeline runs before tokenization. Pure generator "
    "expression (`posexplode(sequence)` + substring, all codegen): map-only, "
    "no shuffle, output is ~len/stride rows per doc produced executor-side — "
    "at 100 TB the fan-out never touches the driver and chunk boundaries are "
    "independent per row, so it scales with the scan.",
)
def text_chunk(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    n_chunks = F.greatest(
        F.ceil(
            (F.length("text") - F.lit(_CHUNK_OVERLAP)) * F.lit(1.0) / _CHUNK_STRIDE
        ).cast("long"),
        F.lit(1).cast("long"),
    )
    d = d.select(
        "doc_id",
        "text",
        F.posexplode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "_pos", "chunk_idx"
        ),
    )
    chunk = F.col("text").substr(
        (F.col("chunk_idx") * _CHUNK_STRIDE + 1).cast("int"), F.lit(_CHUNK_CHARS)
    )
    return d.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("long").alias("chunk_len"),
    )


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

# Patterns restricted to syntax Java regex (Spark) and RE2 (DuckDB) read
# identically: character classes, +, bounded repetition — no backrefs.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
_LONGNUM_RE = r"[0-9][0-9][0-9][0-9][0-9][0-9]+"  # 6+ digit runs (phone/SSN/CC-ish)


@query(
    "text_pii_redact",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_LONGNUM_RE}', '<NUM>', 'g') AS redacted,
           CAST(LEN(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(LEN(regexp_extract_all(text, '{_LONGNUM_RE}')) AS BIGINT) AS n_longnums
    FROM documents
    """,
    doc="PII scrubbing: emails and 6+-digit number runs replaced with typed "
    "placeholder tokens, with per-document match counts for audit. Map-only "
    "regexp_replace/regexp_count inside codegen (patterns kept to the "
    "Java-regex ∩ RE2 common subset so the oracle is exact); at 100 TB this "
    "is scan-rate bound with zero shuffle — the canonical pre-release "
    "compliance pass over a training corpus.",
)
def text_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _LONGNUM_RE,
        "<NUM>",
    )
    return d.select(
        "doc_id",
        redacted.alias("redacted"),
        F.regexp_count(F.col("text"), F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(_LONGNUM_RE))
        .cast("long")
        .alias("n_longnums"),
    )


# --------------------------------------------------------------------------
# Corpus n-gram vocabulary (token/bigram frequency tables)
# --------------------------------------------------------------------------

_VOCAB_MIN_COUNT = 5


@query(
    "text_ngram_freq",
    oracle=f"""
    SELECT gram, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(w)),
                                       i -> w[i] || ' ' || w[i+1])) AS gram
          FROM (SELECT STR_SPLIT(TRIM(LOWER(text)), ' ') AS w FROM documents))
    GROUP BY gram HAVING COUNT(*) >= {_VOCAB_MIN_COUNT}
    """,
    doc=f"Corpus bigram frequency table (count >= {_VOCAB_MIN_COUNT}) — the "
    "vocabulary-building pass of a tokenizer-training / phrase-mining "
    "pipeline. Explode is executor-side; the count is one hash aggregate "
    "with map-side combine, so the shuffle carries (distinct gram, partial "
    "count) pairs, not the token stream. At 100 TB the same plan holds; "
    "add a two-level count (pre-aggregate on (gram, partition-salt)) only "
    "if a single gram dominates the corpus.",
)
def text_ngram_freq(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    w = tokens("text")
    # shingles_of_tokens carries the size guard (sequence(1, 0) infers step
    # -1 and element_at(_w, 0) aborts under ANSI — any doc under 2 tokens
    # would crash the pass); occurrences, not set semantics, hence
    # distinct=False. The oracle's end-exclusive RANGE is inherently safe.
    bigrams = shingles_of_tokens("_w", 2, distinct=False)
    return (
        d.select(w.alias("_w"))
        .select(F.explode(bigrams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= _VOCAB_MIN_COUNT)
    )


# --------------------------------------------------------------------------
# Benchmark decontamination (eval-set n-gram overlap)
# --------------------------------------------------------------------------

# every 50th doc plays the role of a held-out benchmark/eval document; in a
# real pipeline this is a separate (small) table of benchmark prompts/answers
_EVAL_MOD = 50
_DECON_N = 5  # word n-gram width used for the overlap test


@query(
    "text_decontaminate",
    oracle=f"""
    WITH tk AS (SELECT doc_id, STR_SPLIT(TRIM(LOWER(text)), ' ') AS w
                FROM documents),
    g AS (SELECT doc_id,
                 LIST_DISTINCT(LIST_TRANSFORM(
                   RANGE(1, GREATEST(LEN(w) - {_DECON_N - 2}, 1)),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                        || ' ' || w[i+4])) AS grams
          FROM tk),
    ev AS (SELECT DISTINCT UNNEST(grams) AS gram FROM g
           WHERE doc_id % {_EVAL_MOD} = 0),
    corpus AS (SELECT doc_id, UNNEST(grams) AS gram FROM g
               WHERE doc_id % {_EVAL_MOD} != 0),
    hits AS (SELECT doc_id, COUNT(*) AS n FROM corpus JOIN ev USING (gram)
             GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS n_eval_grams,
           COALESCE(h.n, 0) > 0 AS is_contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % {_EVAL_MOD} != 0
    """,
    doc=f"Benchmark decontamination: flag training documents sharing any word "
    f"{_DECON_N}-gram with the held-out eval set (here: every {_EVAL_MOD}th "
    "doc stands in for the benchmark table). The eval side is tiny by "
    "construction, so its distinct-gram table is BROADCAST — the corpus side "
    "stays a map-only explode + broadcast-hash-join + per-doc count, no "
    "all-to-all shuffle of corpus grams. At 100 TB this is the standard "
    "pre-training decontamination pass: cost is one scan of the corpus plus "
    "|eval grams| bytes to every executor.",
)
def text_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    from librarian_spark.functions.textfns import shingles_of_tokens

    d = _t(spark, sf, "documents")
    toks = d.select("doc_id", tokens("text").alias("_w"))
    # cached: the eval branch and the corpus branch both read this exploded
    # gram stream — uncached, every document would tokenize+shingle twice.
    # (MEMORY_AND_DISK, so at 100 TB the hot partitions spill rather than
    # OOM; checkpoint to a table if the plan needs full durability.)
    grams = toks.select(
        "doc_id", F.explode(shingles_of_tokens("_w", _DECON_N)).alias("gram")
    ).cache()
    ev = (
        grams.filter(F.col("doc_id") % _EVAL_MOD == 0).select("gram").distinct()
    )
    corpus = grams.filter(F.col("doc_id") % _EVAL_MOD != 0)
    hits = (
        corpus.join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        d.filter(F.col("doc_id") % _EVAL_MOD != 0)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_eval_grams"),
            (F.coalesce("n", F.lit(0)) > 0).alias("is_contaminated"),
        )
    )


# --------------------------------------------------------------------------
# Repetition filtering (Gopher-style intra-document repetition signals)
# --------------------------------------------------------------------------

_REP_TOP_TOKEN_MAX = 0.2  # keep docs whose most frequent token is <= 20%
_REP_DUP_BIGRAM_MAX = 0.5  # and whose duplicate-bigram share is <= 50%


@query(
    "text_repetition",
    oracle=f"""
    WITH tk AS (SELECT doc_id, STR_SPLIT(TRIM(LOWER(text)), ' ') AS w
                FROM documents),
    bi AS (SELECT doc_id,
                  LIST_TRANSFORM(RANGE(1, GREATEST(LEN(w), 1)),
                                 i -> w[i] || ' ' || w[i+1]) AS b
           FROM tk),
    top AS (SELECT doc_id, MAX(c) AS top_cnt
            FROM (SELECT doc_id, t, COUNT(*) AS c
                  FROM (SELECT doc_id, UNNEST(w) AS t FROM tk)
                  GROUP BY doc_id, t)
            GROUP BY doc_id)
    SELECT tk.doc_id,
           CAST(LEN(w) AS BIGINT) AS n_tokens,
           top_cnt * 1.0 / GREATEST(LEN(w), 1) AS top_token_ratio,
           1.0 - LEN(LIST_DISTINCT(b)) * 1.0 / GREATEST(LEN(b), 1)
             AS dup_bigram_ratio,
           (top_cnt * 1.0 / GREATEST(LEN(w), 1) <= {_REP_TOP_TOKEN_MAX}
            AND 1.0 - LEN(LIST_DISTINCT(b)) * 1.0 / GREATEST(LEN(b), 1)
                <= {_REP_DUP_BIGRAM_MAX}) AS keep
    FROM tk JOIN bi USING (doc_id) JOIN top USING (doc_id)
    """,
    doc="Intra-document repetition signals (the Gopher/MassiveText filter "
    "family): most-frequent-token share and duplicate-bigram share, plus the "
    "combined keep gate. The bigram ratio is map-only (array expressions in "
    "codegen); the top-token share is a two-level hash aggregate "
    "((doc, token) counts with map-side combine, then a per-doc max) — both "
    "shuffles carry only (key, count) pairs and partition by doc_id, so at "
    "100 TB cost tracks distinct (doc, token) pairs, never the token stream.",
)
def text_repetition(spark: SparkSession, sf: str) -> DataFrame:
    from librarian_spark.functions.textfns import shingles_of_tokens

    d = _t(spark, sf, "documents")
    toks = d.select("doc_id", tokens("text").alias("_w"))
    bi = shingles_of_tokens("_w", 2, distinct=False)
    map_stats = toks.select(
        "doc_id",
        F.size("_w").cast("long").alias("n_tokens"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(bi))
            * F.lit(1.0)
            / F.greatest(F.size(bi), F.lit(1))
        ).alias("dup_bigram_ratio"),
    )
    top = (
        toks.select("doc_id", F.explode("_w").alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_cnt"))
    )
    j = map_stats.join(top, "doc_id")
    top_ratio = F.col("top_cnt") * F.lit(1.0) / F.greatest(
        F.col("n_tokens"), F.lit(1).cast("long")
    )
    return j.select(
        "doc_id",
        "n_tokens",
        top_ratio.alias("top_token_ratio"),
        "dup_bigram_ratio",
        (
            (top_ratio <= _REP_TOP_TOKEN_MAX)
            & (F.col("dup_bigram_ratio") <= _REP_DUP_BIGRAM_MAX)
        ).alias("keep"),
    )


# --------------------------------------------------------------------------
# Stratified domain sampling (training-mixture reweighting)
# --------------------------------------------------------------------------

# percent of each source domain to keep; unlisted domains default to 10%.
# In a real pipeline these are the mixture weights of the training recipe.
_MIX_RATES = {"src0": 100, "src1": 75, "src2": 50, "src3": 25}
_MIX_DEFAULT = 10


def _mix_rate_sql() -> str:
    whens = " ".join(
        f"WHEN source = '{s}' THEN {r}" for s, r in _MIX_RATES.items()
    )
    return f"CASE {whens} ELSE {_MIX_DEFAULT} END"


@query(
    "text_stratified_sample",
    oracle=f"""
    SELECT doc_id, source, lang
    FROM documents
    WHERE {o_hash_bucket("doc_id")} < {_mix_rate_sql()}
    """,
    doc="Stratified per-domain sampling by deterministic key hash — the "
    "training-mixture reweighting step (e.g. keep 100% of curated sources, "
    "10% of crawl). Same md5-bucket idiom as q35_hash_sample so the selected "
    "set is stable across runs, engines, partitionings, and re-ingestions; "
    "per-row rate comes from a CASE on the domain column. Map-only filter in "
    "codegen: no shuffle, no per-group pre-pass, works identically at 100 TB.",
)
def text_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    bucket = hash_bucket("doc_id")
    rate = F.lit(_MIX_DEFAULT)
    for s, r in reversed(_MIX_RATES.items()):
        rate = F.when(F.col("source") == s, F.lit(r)).otherwise(rate)
    return d.filter(bucket < rate).select("doc_id", "source", "lang")


# --------------------------------------------------------------------------
# Corpus-LM quality scoring (token-frequency signals)
# --------------------------------------------------------------------------

_RARE_FREQ = 3  # tokens seen fewer than this many times corpus-wide are "rare"


@query(
    "text_lm_score",
    oracle=f"""
    WITH tk AS (SELECT doc_id, STR_SPLIT(TRIM(LOWER(text)), ' ') AS w
                FROM documents),
    tok AS (SELECT doc_id, UNNEST(w) AS t FROM tk),
    vocab AS (SELECT t, COUNT(*) AS freq FROM tok GROUP BY t),
    scored AS (
      SELECT tok.doc_id,
             COUNT(*) AS n_tokens,
             SUM(v.freq) AS freq_sum,
             SUM(CASE WHEN v.freq < {_RARE_FREQ} THEN 1 ELSE 0 END) AS n_rare
      FROM tok JOIN vocab v USING (t)
      GROUP BY tok.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           freq_sum * 1.0 / n_tokens AS mean_token_freq,
           n_rare * 1.0 / n_tokens AS rare_ratio
    FROM scored
    """,
    doc="Corpus-LM quality scoring: each document scored by how 'ordinary' its "
    "tokens are corpus-wide — mean token frequency and rare-token ratio, the "
    "integer-exact core of a CCNet-style LM/perplexity filter (a real LM "
    "swaps the frequency table for n-gram log-probs; the dataflow is "
    "identical). Plan: vocabulary = one hash aggregate with map-side combine "
    "(shuffle carries distinct tokens, not the token stream); scoring = "
    "exploded tokens ⋈ vocab on the token (broadcast when the vocab fits, "
    "shuffle-join otherwise) + one per-doc aggregate. All counts stay int64 "
    "until two final IEEE divides, so the score is bit-reproducible across "
    "engines, runs, and partitionings.",
)
def text_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    # cached: vocab build and scoring both consume the exploded token stream
    tok = d.select("doc_id", tokens("text").alias("_w")).select(
        "doc_id", F.explode("_w").alias("t")
    ).cache()
    vocab = tok.groupBy("t").agg(F.count(F.lit(1)).alias("freq"))
    scored = (
        tok.join(vocab, "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("freq").alias("freq_sum"),
            F.sum(F.when(F.col("freq") < _RARE_FREQ, 1).otherwise(0)).alias(
                "n_rare"
            ),
        )
    )
    return scored.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (F.col("freq_sum") * F.lit(1.0) / F.col("n_tokens")).alias(
            "mean_token_freq"
        ),
        (F.col("n_rare") * F.lit(1.0) / F.col("n_tokens")).alias("rare_ratio"),
    )


# --------------------------------------------------------------------------
# Sequence packing (training-batch assembly)
# --------------------------------------------------------------------------

_PACK_BUDGET = 2048  # tokens per packed training sequence


@query(
    "text_pack_sequences",
    oracle=f"""
    WITH t AS (SELECT doc_id, source,
                      LEN(STR_SPLIT(TRIM(LOWER(text)), ' ')) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, source, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum
          FROM t)
    SELECT doc_id, source,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(cum - n_tokens
                - ((cum - n_tokens) // {_PACK_BUDGET}) * {_PACK_BUDGET}
                AS BIGINT) AS pack_offset
    FROM c
    """,
    doc=f"Sequence packing: assign each document a (pack_id, pack_offset) "
    f"inside {_PACK_BUDGET}-token training sequences, per source domain, in "
    "deterministic doc_id order — the batch-assembly step between tokenization "
    "and the trainer (docs spanning a boundary are split downstream at "
    "pack_offset). One window cumulative sum per domain partition — a single "
    "shuffle on the domain key, integer-exact, stable under re-partitioning. "
    "At 100 TB pack within finer deterministic shards (e.g. (source, "
    "hash-bucket)) so no single window partition grows unbounded; the "
    "assignment stays reproducible because the shard key is content-derived.",
)
def text_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = _t(spark, sf, "documents")
    n_tok = F.size(tokens("text"))
    t = d.select("doc_id", "source", n_tok.alias("n_tokens"))
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    pre = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("pre")
    t = t.select("doc_id", "source", "n_tokens", pre)
    pack_id = F.expr(f"pre div {_PACK_BUDGET}")
    return t.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        pack_id.cast("long").alias("pack_id"),
        (F.col("pre") - pack_id * _PACK_BUDGET).cast("long").alias("pack_offset"),
    )


# --------------------------------------------------------------------------
# Train/val/test split assignment
# --------------------------------------------------------------------------

_SPLITS = (("train", 80), ("val", 10), ("test", 10))  # percent, in order


@query(
    "text_split_assign",
    oracle=f"""
    SELECT doc_id, source,
           CASE
             WHEN b < {_SPLITS[0][1]} THEN 'train'
             WHEN b < {_SPLITS[0][1] + _SPLITS[1][1]} THEN 'val'
             ELSE 'test'
           END AS split
    FROM (SELECT doc_id, source, {o_hash_bucket("doc_id")} AS b
          FROM documents)
    """,
    doc="Deterministic 80/10/10 train/val/test assignment by key hash: every "
    "engine, run, partitioning, and re-ingestion gives each document the "
    "same split — the property that makes eval sets trustworthy (a rand() "
    "split silently reshuffles docs between train and test on every rerun). "
    "Same md5-bucket idiom as the samplers; map-only CASE in codegen, no "
    "shuffle. Hashing the stable business key (not a row number) also keeps "
    "assignments fixed when upstream filtering changes the row set.",
)
def text_split_assign(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    b = hash_bucket("doc_id")
    split = (
        F.when(b < _SPLITS[0][1], "train")
        .when(b < _SPLITS[0][1] + _SPLITS[1][1], "val")
        .otherwise("test")
    )
    return d.select("doc_id", "source", split.alias("split"))


# --------------------------------------------------------------------------
# Corpus statistics rollup (dataset card)
# --------------------------------------------------------------------------


@query(
    "text_corpus_stats",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEN(STR_SPLIT(TRIM(LOWER(text)), ' '))) AS BIGINT)
             AS total_tokens,
           SUM(LEN(STR_SPLIT(TRIM(LOWER(text)), ' '))) * 1.0 / COUNT(*)
             AS mean_doc_tokens,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM documents
    GROUP BY lang
    """,
    doc="Per-language corpus statistics — the dataset-card numbers every "
    "release ships (doc counts, token totals, length envelope, source "
    "diversity) in ONE pass: a single hash aggregate with map-side combine "
    "plus one distinct-count expansion, all counts integer-exact. At 100 TB "
    "this replaces the accidental 'run five summary queries over the whole "
    "corpus' pattern with one scan.",
)
def text_corpus_stats(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    n_tok = F.size(tokens("text"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).cast("long").alias("total_tokens"),
        (F.sum(n_tok) * F.lit(1.0) / F.count(F.lit(1))).alias("mean_doc_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.count_distinct("source").cast("long").alias("n_sources"),
    )


# --------------------------------------------------------------------------
# N-gram novelty (memorization / uniqueness signal)
# --------------------------------------------------------------------------


@query(
    "text_ngram_novelty",
    oracle="""
    WITH tk AS (SELECT doc_id, STR_SPLIT(TRIM(LOWER(text)), ' ') AS w
                FROM documents),
    bi AS (SELECT doc_id,
                  LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(w), 1)),
                                               i -> w[i] || ' ' || w[i+1])) AS b
           FROM tk),
    ex AS (SELECT doc_id, UNNEST(b) AS gram FROM bi),
    df AS (SELECT gram, COUNT(*) AS docfreq FROM ex GROUP BY gram),
    per_doc AS (
      SELECT ex.doc_id,
             COUNT(*) AS n_grams,
             SUM(CASE WHEN df.docfreq = 1 THEN 1 ELSE 0 END) AS n_unique
      FROM ex JOIN df USING (gram)
      GROUP BY ex.doc_id
    )
    SELECT doc_id,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_unique AS BIGINT) AS n_unique,
           n_unique * 1.0 / n_grams AS novelty
    FROM per_doc
    """,
    doc="Per-document bigram novelty: the fraction of a doc's distinct "
    "bigrams that occur in NO other document — high novelty marks fresh "
    "content, near-zero novelty marks templated/boilerplate/memorized text "
    "(the inverse signal of the dedup family, useful as a curation score "
    "when a doc isn't a dup of any single other doc but is assembled from "
    "corpus-common fragments). Plan: document-frequency table = one hash "
    "aggregate over distinct (doc, gram) pairs with map-side combine; "
    "per-doc rollup = one join on the gram + one aggregate; all counts "
    "integer-exact until the final divide. Same scaling shape as "
    "text_lm_score — shuffles carry (gram, count) pairs, never raw text.",
)
def text_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    from librarian_spark.functions.textfns import shingles_of_tokens

    d = _t(spark, sf, "documents")
    toks = d.select("doc_id", tokens("text").alias("_w"))
    ex = toks.select(
        "doc_id", F.explode(shingles_of_tokens("_w", 2)).alias("gram")
    ).cache()  # document-frequency build and per-doc rollup share this stream
    docfreq = ex.groupBy("gram").agg(F.count(F.lit(1)).alias("docfreq"))
    per_doc = (
        ex.join(docfreq, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("docfreq") == 1, 1).otherwise(0)).alias("n_unique"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_unique").cast("long").alias("n_unique"),
        (F.col("n_unique") * F.lit(1.0) / F.col("n_grams")).alias("novelty"),
    )


# --------------------------------------------------------------------------
# BM25 relevance scoring (retrieval / curation ranking)
# --------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "hash", "vector")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPN = 100


def bm25_score_ctes() -> str:
    """The CTE block scoring EVERY document (``... bscore AS (doc_id, score)``)
    — single-sourced so the top-k oracle and the RRF-fusion oracle can never
    drift from each other."""
    tf_cols = ",\n         ".join(
        f"LEN(LIST_FILTER(tk, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    k1, b = _BM25_K1, _BM25_B
    contrib = " + ".join(
        f"LN(1 + (n - df{i} + 0.5) / (df{i} + 0.5)) * "
        f"(tf{i} * ({k1} + 1)) / (tf{i} + {k1} * (1 - {b} + {b} * dl / avgdl))"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
    tok AS (
      SELECT doc_id, STR_SPLIT(TRIM(LOWER(text)), ' ') AS tk FROM documents
    ),
    d AS (
      SELECT doc_id, LEN(tk) AS dl,
         {tf_cols}
      FROM tok
    ),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl,
         {df_cols}
      FROM d
    ),
    bscore AS (SELECT doc_id, ROUND({contrib}, 6) AS score FROM d, s)
    """


def _bm25_oracle() -> str:
    return f"""
    WITH {bm25_score_ctes()}
    SELECT doc_id, score
    FROM bscore
    ORDER BY score DESC, doc_id
    LIMIT {_BM25_TOPN}
    """


@query(
    "text_bm25_topk",
    oracle=_bm25_oracle(),
    doc=f"BM25 top-{_BM25_TOPN} relevance ranking for a fixed query "
    f"{_BM25_TERMS} (k1={_BM25_K1}, b={_BM25_B}) — the classic retrieval / "
    "quality-curation scorer. Plan shape at scale: one map-only pass computes "
    "per-doc term frequencies and length (codegen, no UDF); ONE tiny "
    "corpus-stats row (N, avgdl, per-term document frequency) comes back via "
    "an aggregate and is broadcast into the scoring pass; the final top-N is "
    "TakeOrderedAndProject (per-partition heap + driver merge) — never a "
    "global sort or single-partition window. Shuffle volume is the stats row "
    "plus N result rows, independent of corpus size. Scores rounded to 6 "
    "digits in both engines (same grain as the similarity ops) so IEEE "
    "summation-order differences cannot flip the comparison.",
)
def text_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    return (
        bm25_scores(spark, sf)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_BM25_TOPN)
    )


def bm25_scores(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, score) for EVERY document — the scoring pass text_bm25_topk
    and sim_rrf_fusion share (map-only + one inlined stats row)."""

    def tf_of(term: str) -> F.Column:
        # NB: the lambda must be unary — F.filter treats a 2-arg lambda as
        # (element, index), silently binding the index where a captured
        # default-arg would go
        return F.size(F.filter(F.col("tk"), lambda x: x == F.lit(term)))

    d = _t(spark, sf, "documents").select("doc_id", tokens("text").alias("tk"))
    per_doc = d.select(
        "doc_id",
        F.size("tk").alias("dl"),
        *[tf_of(t).alias(f"tf{i}") for i, t in enumerate(_BM25_TERMS)],
    )
    # corpus stats (N, avgdl, per-term df) are ONE tiny aggregate row,
    # collected at build time and inlined as literals: the scoring pass is
    # then purely map-only (zero joins — a 1-row crossJoin would plan a
    # BroadcastNestedLoopJoin, tripping the global no-nested-loop gate).
    # Doubles round-trip exactly through collect → lit, so the arithmetic is
    # bit-identical to keeping the row in-plan.
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    ).collect()[0]
    n, avgdl = F.lit(stats["n"]), F.lit(stats["avgdl"])
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    contrib = None
    for i in range(len(_BM25_TERMS)):
        dfi = F.lit(stats[f"df{i}"])
        idf = F.log(F.lit(1) + (n - dfi + F.lit(0.5)) / (dfi + F.lit(0.5)))
        # association order must MIRROR the oracle's left-to-right parse,
        # (idf * num) / den — grouping as idf * (num / den) differs in the
        # last ulp and can flip a ROUND(...,6) boundary between engines
        term = (
            idf
            * (F.col(f"tf{i}") * (k1 + F.lit(1)))
            / (F.col(f"tf{i}") + k1 * (F.lit(1) - b + b * F.col("dl") / avgdl))
        )
        contrib = term if contrib is None else contrib + term
    return per_doc.select("doc_id", F.round(contrib, 6).alias("score"))


# --------------------------------------------------------------------------
# Dataset mixture balancing (derived per-group sampling rates)
# --------------------------------------------------------------------------

_MIX_BUDGET = 0.6  # keep 60% of the corpus overall
_MIX_BUCKETS = 10000


@query(
    "text_balance_mixture",
    oracle=f"""
    WITH c AS (
      SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n_l FROM documents GROUP BY lang
    ),
    s AS (
      SELECT CAST(SUM(n_l) AS DOUBLE) AS n, CAST(COUNT(*) AS DOUBLE) AS k FROM c
    )
    SELECT d.doc_id, d.lang, d.source,
           ROUND(LEAST(1.0, ({_MIX_BUDGET} * n / k) / c.n_l), 6) AS rate
    FROM documents d JOIN c USING (lang), s
    WHERE {o_hash_bucket('doc_id', _MIX_BUCKETS)}
          < FLOOR(LEAST(1.0, ({_MIX_BUDGET} * n / k) / c.n_l) * {_MIX_BUCKETS})
    """,
    doc=f"Dataset-mixture BALANCING: unlike text_stratified_sample's fixed "
    "per-domain rates, the rates here are DERIVED from corpus statistics — "
    f"equalize language shares within a {_MIX_BUDGET:.0%} overall budget "
    "(rate_l = min(1, budget·N/K/n_l): dominant languages downsample, "
    "minority languages keep everything). One tiny per-group count aggregate "
    "is collected at build time and inlined as a CASE literal, so the "
    "selection itself is a map-only codegen filter using the shared md5 "
    "hash-bucket idiom — the sampled set is stable across runs, engines, "
    "partitionings, and re-ingestions. At 100 TB the pre-pass is one "
    "map-side-combining count over the group column only; the filter "
    "streams at scan rate with zero shuffles.",
)
def text_balance_mixture(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    counts = {
        r["lang"]: float(r["n"])
        for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n, k = float(sum(counts.values())), float(len(counts))
    target = F.lit(_MIX_BUDGET) * F.lit(n) / F.lit(k)
    n_l = None
    for lang, c in counts.items():
        n_l = (
            F.when(F.col("lang") == lang, F.lit(c))
            if n_l is None
            else n_l.when(F.col("lang") == lang, F.lit(c))
        )
    rate = F.least(F.lit(1.0), target / n_l)
    sel = hash_bucket("doc_id", _MIX_BUCKETS) < F.floor(rate * _MIX_BUCKETS)
    return d.filter(sel).select(
        "doc_id", "lang", "source", F.round(rate, 6).alias("rate")
    )


# --------------------------------------------------------------------------
# Feature-hashing document vectors (the "bring your own embedding" bridge)
# --------------------------------------------------------------------------

_FH_DIM = 32  # hashed bag-of-words dimensionality


@query(
    "text_feature_hash_embed",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             LIST_TRANSFORM(STR_SPLIT(TRIM(LOWER(text)), ' '),
                            t -> {o_fingerprint('t')} % {_FH_DIM}) AS b
      FROM documents
    )
    SELECT doc_id,
           ARRAY_TO_STRING(
             LIST_TRANSFORM(RANGE(0, {_FH_DIM}),
                            d -> LEN(LIST_FILTER(b, x -> x = d))), ',')
             AS vec_str,
           CAST(LEN(b) AS BIGINT) AS n_tokens,
           CAST(LEN(LIST_DISTINCT(b)) AS BIGINT) AS n_active_dims
    FROM t
    """,
    doc=f"Hashing-trick document vectors: each token is bucketed by the shared "
    f"polynomial rolling hash into {_FH_DIM} dimensions and the document "
    "becomes its integer bucket-count vector — the classic feature-hashing "
    "(Weinberger et al. 2009) bag-of-words embedding that needs NO "
    "vocabulary build, so it runs map-only in one pass: no shuffle, no "
    "fitted state, stable under re-partitioning and corpus growth. This is "
    "the bridge from raw documents to every vector operator in "
    "similarity.py (cosine/LSH/IVF take any array column). Integer counts "
    "make the oracle exact — no float summation-order concerns — and the "
    "vector is emitted comma-joined (every output column scalar, the q25 "
    "convention the sort-based comparison harness requires; split(',') "
    "recovers the array). At 100 TB this is a scan-rate-bound codegen "
    "pass; the nested-lambda hash folds stay JVM-side.",
)
def text_feature_hash_embed(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents").select("doc_id", tokens("text").alias("w"))
    d = fan_out(d).select(
        "doc_id",
        F.transform("w", lambda t: fingerprint(t) % _FH_DIM).alias("b"),
    )
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(_FH_DIM - 1)),
        lambda dim: F.size(F.filter("b", lambda x: x == dim)),
    )
    return d.select(
        "doc_id",
        F.array_join(counts, ",").alias("vec_str"),
        F.size("b").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("b")).cast("long").alias("n_active_dims"),
    )


# --------------------------------------------------------------------------
# document chunking as a Python UDTF (§2D surface: user-defined TABLE function)
# --------------------------------------------------------------------------

@query(
    "text_chunk_udtf",
    oracle=_CHUNK_ORACLE,
    doc="The SAME chunking contract as text_chunk, implemented as a Python "
    "UDTF (Spark 4 user-defined TABLE function) — §2D's user-extension "
    "surface driven end-to-end: one input row expands to a variable number "
    "of output rows inside the Python worker, Arrow-batched, schema "
    "declared on the decorator. Hash-matching the identical oracle as the "
    "codegen version pins the two implementations together. The builtin "
    "posexplode form (text_chunk) remains the hot path — this exists "
    "because a real user extension point must be shown working, and the "
    "UDTF is the shape custom generators (parsers, tokenizers, format "
    "exploders) take when no builtin composition exists. Map-only: the "
    "UDTF never shuffles; fan_out pre-spreads rows so Python workers "
    "saturate all cores.",
)
def text_chunk_udtf(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="doc_id long, chunk_idx long, chunk_text string, chunk_len long")
    class ChunkDoc:
        def eval(self, doc_id: int, text: str):  # noqa: D102
            t = text or ""
            n = len(t)
            n_chunks = max(1, -(-(n - _CHUNK_OVERLAP) // _CHUNK_STRIDE))
            for i in range(n_chunks):
                c = t[i * _CHUNK_STRIDE : i * _CHUNK_STRIDE + _CHUNK_CHARS]
                yield doc_id, i, c, len(c)

    d = fan_out(_t(spark, sf, "documents").select("doc_id", "text"))
    d.createOrReplaceTempView("__chunk_in")
    spark.udtf.register("chunk_doc", ChunkDoc)
    return spark.sql(
        "SELECT c.* FROM __chunk_in, LATERAL chunk_doc(doc_id, text) c"
    )


# --------------------------------------------------------------------------
# Count-min-sketch heavy hitters (mergeable fixed-size frequency summary)
# --------------------------------------------------------------------------
#
# The boilerplate-phrase detector at corpus scale: find bigrams whose corpus
# frequency exceeds a budget WITHOUT keeping the full vocabulary. The sketch
# is a d×w integer matrix (constant size regardless of vocabulary); it is
# LINEAR, so per-source sketches built independently merge by cell-wise
# addition — the same partial-aggregate re-use story as q42's HLL and
# q50's stored partials, here for frequencies. The estimate min_j cms[j][h_j(x)]
# only OVER-counts, so the sketch shortlist provably contains every true heavy
# hitter; the exact-verify join then splits true positives from collision
# inflation (both exposed in the output).
#
# Hash family: three independent 32-bit words of md5(gram) — deterministic and
# identical in DuckDB, so the oracle replays sketch build, merge, probe, and
# verify exactly, collisions included. w is sized so the shortlist is
# selective on the 916-bigram test corpus yet collisions still occur, so
# `overestimate` is nonzero and the verify stage observably matters.

_CMS_D = 3  # sketch rows (independent hash functions)
_CMS_W = 1024  # sketch width (buckets per row)
_CMS_T = 40  # heavy-hitter frequency threshold

_CMS_RANGE = f"CROSS JOIN (SELECT UNNEST(RANGE(0, {_CMS_D})) AS row_id) r"
_CMS_BUCKET = (
    f"CAST(('0x' || SUBSTRING(MD5(gram), 1 + 8 * row_id, 8))::UBIGINT AS BIGINT)"
    f" % {_CMS_W}"
)

_CMS_ORACLE = f"""
WITH tk AS (SELECT source, STR_SPLIT(TRIM(LOWER(text)), ' ') AS w FROM documents),
occ AS (SELECT source,
               UNNEST(LIST_TRANSFORM(RANGE(1, LEN(w)), i -> w[i] || ' ' || w[i+1]))
                 AS gram
        FROM tk),
v AS (SELECT source, gram, COUNT(*) AS cnt FROM occ GROUP BY 1, 2),
b AS (SELECT source, cnt, row_id, {_CMS_BUCKET} AS bucket FROM v {_CMS_RANGE}),
persrc AS (SELECT source, row_id, bucket, SUM(cnt) AS c FROM b GROUP BY 1, 2, 3),
sk AS (SELECT row_id, bucket, SUM(c) AS c FROM persrc GROUP BY 1, 2),
tok AS (SELECT gram, SUM(cnt) AS true_cnt FROM v GROUP BY 1),
probe AS (SELECT gram, row_id, {_CMS_BUCKET} AS bucket FROM tok {_CMS_RANGE}),
est AS (SELECT p.gram, MIN(sk.c) AS est
        FROM probe p JOIN sk USING (row_id, bucket) GROUP BY 1)
SELECT e.gram,
       CAST(e.est AS BIGINT) AS est_count,
       CAST(k.true_cnt AS BIGINT) AS true_count,
       CAST(e.est - k.true_cnt AS BIGINT) AS overestimate,
       k.true_cnt >= {_CMS_T} AS is_true_heavy
FROM est e JOIN tok k USING (gram)
WHERE e.est >= {_CMS_T}
"""


@query(
    "text_heavy_hitters",
    oracle=_CMS_ORACLE,
    doc=f"Count-min-sketch heavy hitters: per-source d={_CMS_D}×w={_CMS_W} "
    "integer sketches over bigram occurrences, MERGED by cell-wise addition "
    "(CMS is linear — the per-partition-sketch-then-merge shape that scales "
    "to 100 TB without ever shuffling the token stream twice), probed for "
    f"bigrams with estimate >= {_CMS_T}, then the shortlist exact-verified "
    "against true counts. CMS only over-counts, so the shortlist provably "
    "contains every true heavy hitter; `overestimate` exposes collision "
    "inflation (nonzero here by construction). The sketch is "
    "constant-size; the only vocabulary-sized shuffle is the verify "
    "aggregate, which a pure-sketch deployment drops.",
)
def text_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    w = tokens("text")
    occ = d.select("source", w.alias("_w")).select(
        "source",
        F.explode(shingles_of_tokens("_w", 2, distinct=False)).alias("gram"),
    )
    v = occ.groupBy("source", "gram").agg(F.count(F.lit(1)).alias("cnt"))

    def buckets() -> F.Column:
        md5 = F.md5(F.col("gram").cast("binary"))
        return F.array(
            *[
                F.struct(
                    F.lit(j).alias("row_id"),
                    (
                        F.conv(F.substring(md5, 1 + 8 * j, 8), 16, 10).cast("long")
                        % _CMS_W
                    ).alias("bucket"),
                )
                for j in range(_CMS_D)
            ]
        )

    b = v.select("source", "cnt", F.inline(buckets()))
    persrc = b.groupBy("source", "row_id", "bucket").agg(F.sum("cnt").alias("c"))
    sk = persrc.groupBy("row_id", "bucket").agg(F.sum("c").alias("c"))
    tok = v.groupBy("gram").agg(F.sum("cnt").alias("true_cnt"))
    probe = tok.select("gram", F.inline(buckets()))
    est = (
        probe.join(F.broadcast(sk), ["row_id", "bucket"])
        .groupBy("gram")
        .agg(F.min("c").alias("est"))
    )
    return (
        est.filter(F.col("est") >= _CMS_T)
        .join(tok, "gram")
        .select(
            "gram",
            F.col("est").cast("long").alias("est_count"),
            F.col("true_cnt").cast("long").alias("true_count"),
            (F.col("est") - F.col("true_cnt")).cast("long").alias("overestimate"),
            (F.col("true_cnt") >= _CMS_T).alias("is_true_heavy"),
        )
    )


# --------------------------------------------------------------------------
# Hashed n-gram importance weights (DSIR-style data selection)
# --------------------------------------------------------------------------
#
# Data Selection via Importance Resampling (Xie et al., 2023) reduced to its
# engine shape: model a TARGET domain and the RAW pool as distributions over
# hashed n-gram features, weight each raw document by how target-like its
# features are, and feed the weights to a sampler. Hashing makes the feature
# space a fixed B buckets — both distributions are one map-side-combining
# aggregate each, the weight table is B rows (broadcast), and scoring is a
# map-only pass + one per-doc aggregate. At 100 TB nothing grows with
# vocabulary.
#
# The canonical formulation sums log-likelihood ratios; engine log() (java
# libm vs duckdb libm) is not guaranteed bit-identical across engines, so the
# oracle-checked variant keeps the per-bucket likelihood RATIO in fixed-point
# (round(1e6·(t+1)/(r+1))) and averages those — deterministic end-to-end
# (integer counts, one IEEE multiply+divide on identical operands, exact
# int64 sum, two final IEEE divides).

_DSIR_B = 512  # hashed feature buckets
_DSIR_TARGET = "src0"  # the target domain; everything else is the raw pool
_DSIR_SCALE = 1_000_000.0

_DSIR_ORACLE = f"""
WITH tk AS (SELECT doc_id, source, STR_SPLIT(TRIM(LOWER(text)), ' ') AS w
            FROM documents),
occ AS (SELECT doc_id, source,
               {o_hash_bucket("gram", _DSIR_B)} AS bucket
        FROM (SELECT doc_id, source,
                     UNNEST(LIST_TRANSFORM(RANGE(1, LEN(w)),
                                           i -> w[i] || ' ' || w[i+1])) AS gram
              FROM tk)),
tgt AS (SELECT bucket, COUNT(*) AS t FROM occ
        WHERE source = '{_DSIR_TARGET}' GROUP BY 1),
rawocc AS (SELECT * FROM occ WHERE source != '{_DSIR_TARGET}'),
rawb AS (SELECT bucket, COUNT(*) AS r FROM rawocc GROUP BY 1),
wt AS (SELECT rawb.bucket,
              CAST(ROUND((CAST(COALESCE(t, 0) + 1 AS DOUBLE) * {_DSIR_SCALE})
                         / (r + 1)) AS BIGINT) AS wr
       FROM rawb LEFT JOIN tgt ON rawb.bucket = tgt.bucket)
SELECT o.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       (CAST(SUM(wt.wr) AS DOUBLE) / {_DSIR_SCALE}) / COUNT(*) AS importance
FROM rawocc o JOIN wt ON o.bucket = wt.bucket
GROUP BY o.doc_id
"""


@query(
    "text_importance_weights",
    oracle=_DSIR_ORACLE,
    doc=f"DSIR-style importance weights: hashed-bigram (B={_DSIR_B}) feature "
    f"distributions for the target domain ('{_DSIR_TARGET}') and the raw "
    "pool, per-bucket smoothed likelihood ratios in fixed point, and each "
    "raw document scored by its mean feature ratio — the data-selection "
    "signal for domain-targeted pre-training mixtures. Two "
    "map-side-combining aggregates (bucket counts), one B-row broadcast "
    "weight table, one map-only scoring pass: nothing scales with "
    "vocabulary, so the plan is unchanged at 100 TB.",
)
def text_importance_weights(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    w = tokens("text")
    occ = (
        d.select("doc_id", "source", w.alias("_w"))
        .select(
            "doc_id",
            "source",
            F.explode(shingles_of_tokens("_w", 2, distinct=False)).alias("gram"),
        )
        .select("doc_id", "source", hash_bucket("gram", _DSIR_B).alias("bucket"))
    )
    tgt = (
        occ.filter(F.col("source") == _DSIR_TARGET)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    rawocc = occ.filter(F.col("source") != _DSIR_TARGET)
    rawb = rawocc.groupBy("bucket").agg(F.count(F.lit(1)).alias("r"))
    wt = rawb.join(tgt, "bucket", "left").select(
        "bucket",
        F.round(
            ((F.coalesce("t", F.lit(0)) + 1).cast("double") * F.lit(_DSIR_SCALE))
            / (F.col("r") + 1)
        )
        .cast("long")
        .alias("wr"),
    )
    return (
        rawocc.join(F.broadcast(wt), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            (
                (F.sum("wr").cast("double") / F.lit(_DSIR_SCALE))
                / F.count(F.lit(1))
            ).alias("importance"),
        )
    )


# --------------------------------------------------------------------------
# BPE-style merge training (tokenizer training as a distributed job)
# --------------------------------------------------------------------------
#
# The inner loop of byte-pair-encoding training, at word granularity
# (phrase-mining form): each round counts all adjacent token pairs across the
# corpus, picks the most frequent pair, and merges its occurrences — the
# merge TABLE (pair per rank) is the training artifact a tokenizer ships.
# Engine shape per round: ONE map-side-combining pair-count aggregate, ONE
# argmax row collected to the driver (the bm25 stats-row discipline — the
# artifact is inherently tiny), ONE map-only literal REPLACE pass. At 100 TB
# each round is a corpus scan + a vocabulary-sized shuffle; rounds are
# strictly sequential (that's BPE), so wall-clock is rounds × scan — the
# standard trade every distributed tokenizer trainer makes.
#
# Determinism: counts are integers, argmax tie-breaks on the pair string,
# and REPLACE is left-to-right non-overlapping in BOTH engines (Java
# String.replace and DuckDB REPLACE agree, including the consumed-boundary
# behavior on back-to-back occurrences), so the oracle replays every round.

_BPE_ROUNDS = 3


def _bpe_oracle() -> str:
    ctes = [
        "t0 AS (SELECT ' ' || TRIM(LOWER(text)) || ' ' AS pt FROM documents)"
    ]
    outs = []
    for r in range(_BPE_ROUNDS):
        ctes.append(
            f"""
c{r} AS (SELECT pair, COUNT(*) AS cnt FROM (
  SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(w)), i -> w[i] || ' ' || w[i+1]))
    AS pair
  FROM (SELECT STR_SPLIT(TRIM(pt), ' ') AS w FROM t{r})) GROUP BY pair),
b{r} AS (SELECT pair, cnt FROM c{r} ORDER BY cnt DESC, pair LIMIT 1)"""
        )
        outs.append(
            f"SELECT CAST({r + 1} AS BIGINT) AS merge_rank, pair, "
            f"CAST(cnt AS BIGINT) AS freq FROM b{r}"
        )
        if r + 1 < _BPE_ROUNDS:
            ctes.append(
                f"""
t{r + 1} AS (SELECT REPLACE(pt,
    ' ' || (SELECT pair FROM b{r}) || ' ',
    ' ' || REPLACE((SELECT pair FROM b{r}), ' ', '_') || ' ') AS pt
  FROM t{r})"""
            )
    return (
        "WITH "
        + ",".join(ctes)
        + " "
        + " UNION ALL ".join(outs)
    )


def _bpe_best_pair(cur):
    """One BPE training round's count+argmax over the current corpus state:
    returns (pair, freq) or None when no adjacent pair exists anywhere.
    THE shared derivation — text_bpe_train_merges (train) and
    text_bpe_apply (encode) must pick identical merges or the tokenizer's
    two sides silently desynchronize."""
    toks = cur.select(F.split(F.trim(F.col("pt")), " ").alias("_w"))
    pairs = toks.select(
        F.explode(shingles_of_tokens("_w", 2, distinct=False)).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
    best = counts.orderBy(F.col("cnt").desc(), "pair").limit(1).collect()
    if not best:
        return None
    return best[0]["pair"], int(best[0]["cnt"])


def _bpe_merge_expr(pair: str):
    """The literal REPLACE that applies one merge (space-delimited match,
    underscore-joined result) — single-sourced for train and apply."""
    return F.replace(
        F.col("pt"),
        F.lit(f" {pair} "),
        F.lit(" " + pair.replace(" ", "_") + " "),
    )


@query(
    "text_bpe_train_merges",
    oracle=_bpe_oracle(),
    doc=f"BPE-style merge training ({_BPE_ROUNDS} rounds, word granularity): "
    "per round, count every adjacent token pair corpus-wide (one map-side-"
    "combining aggregate), take the most frequent pair (deterministic "
    "argmax, tie-break on the pair string), and merge its occurrences with "
    "a literal map-only REPLACE. The output is the learned merge table — "
    "the artifact tokenizer training exists to produce. The oracle unrolls "
    "the rounds and replays count/argmax/merge exactly (REPLACE is "
    "left-to-right non-overlapping in both engines). At 100 TB: rounds are "
    "sequential by definition; each costs one corpus scan plus a "
    "vocabulary-sized shuffle, and only the 1-row argmax ever reaches the "
    "driver.",
)
def text_bpe_train_merges(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(_t(spark, sf, "documents"))
    cur = d.select(
        F.concat(F.lit(" "), F.trim(F.lower(F.col("text"))), F.lit(" ")).alias(
            "pt"
        )
    )
    merges: list[tuple[int, str, int]] = []
    for r in range(_BPE_ROUNDS):
        best = _bpe_best_pair(cur)
        if best is None:  # degenerate corpus with no adjacent pairs anywhere
            break
        pair, cnt = best
        merges.append((r + 1, pair, cnt))
        if r + 1 < _BPE_ROUNDS:
            cur = cur.select(_bpe_merge_expr(pair).alias("pt"))
    return spark.createDataFrame(
        merges, "merge_rank long, pair string, freq long"
    )


# --------------------------------------------------------------------------
# TF-IDF keyword extraction (top terms per document)
# --------------------------------------------------------------------------

_TFIDF_SCALE = 1_000_000
_TFIDF_TOPK = 3


@query(
    "text_keyword_tfidf",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(STR_SPLIT(TRIM(LOWER(text)), ' ')) AS token
      FROM documents
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT t.doc_id, t.token, t.tf, d.df,
             t.tf * (({_TFIDF_SCALE} * n.n) // d.df) AS score_scaled,
             ROW_NUMBER() OVER (
               PARTITION BY t.doc_id
               ORDER BY t.tf * (({_TFIDF_SCALE} * n.n) // d.df) DESC, t.token
             ) AS rn
      FROM tf t JOIN df d USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(score_scaled AS BIGINT) AS score_scaled, CAST(rn AS BIGINT) AS rn
    FROM scored WHERE rn <= {_TFIDF_TOPK}
    """,
    doc=f"Top-{_TFIDF_TOPK} keywords per document by TF-IDF — the "
    "keyword-extraction / topic-labeling primitive. IDF is kept in exact "
    f"integer fixed point (tf · ({_TFIDF_SCALE}·N // df)) — "
    "rank-equivalent to tf/df weighting and bit-reproducible across "
    "engines where a float log-IDF is not; ties broken by token. Two "
    "aggregates (doc-term tf, term df — the df frame is term-count-sized "
    "and broadcast back) + one window PARTITIONED by doc (parallel). "
    "The corpus size N is a one-row aggregate inlined as a literal "
    "(the bm25 pattern). At 100 TB the doc-term table shuffles once on "
    "term for df and once on doc for the window — both unavoidable and "
    "both partial-aggregated map-side.",
)
def text_keyword_tfidf(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = _t(spark, sf, "documents")
    n_docs = d.count()  # one scalar to the driver, inlined as a literal
    tf = (
        d.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.call_function(
        "div", F.lit(_TFIDF_SCALE * n_docs).cast("long"), F.col("df")
    )
    scored = tf.join(F.broadcast(df), "token").withColumn(
        "score_scaled", F.col("tf") * idf
    )
    w = W.partitionBy("doc_id").orderBy(
        F.col("score_scaled").desc(), F.col("token")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TFIDF_TOPK)
        .select(
            "doc_id", "token",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("score_scaled").cast("long").alias("score_scaled"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


# --------------------------------------------------------------------------
# BPE merge application (tokenizer inference over the trained merges)
# --------------------------------------------------------------------------


def _bpe_apply_oracle() -> str:
    ctes = [
        "t0 AS (SELECT doc_id, ' ' || TRIM(LOWER(text)) || ' ' AS pt "
        "FROM documents)"
    ]
    for r in range(_BPE_ROUNDS):
        ctes.append(
            f"""
c{r} AS (SELECT pair, COUNT(*) AS cnt FROM (
  SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(w)), i -> w[i] || ' ' || w[i+1]))
    AS pair
  FROM (SELECT STR_SPLIT(TRIM(pt), ' ') AS w FROM t{r})) GROUP BY pair),
b{r} AS (SELECT pair, cnt FROM c{r} ORDER BY cnt DESC, pair LIMIT 1),
t{r + 1} AS (SELECT doc_id, REPLACE(pt,
    ' ' || COALESCE((SELECT pair FROM b{r}), CHR(1)) || ' ',
    ' ' || REPLACE(COALESCE((SELECT pair FROM b{r}), CHR(1)), ' ', '_') || ' ')
    AS pt
  FROM t{r})"""
        )
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
SELECT a.doc_id,
       CAST(LEN(STR_SPLIT(TRIM(a.pt), ' ')) AS BIGINT) AS n_tokens_raw,
       CAST(LEN(STR_SPLIT(TRIM(b.pt), ' ')) AS BIGINT) AS n_tokens_bpe,
       CAST(LEN(STR_SPLIT(TRIM(a.pt), ' '))
            - LEN(STR_SPLIT(TRIM(b.pt), ' ')) AS BIGINT) AS n_merged
FROM t0 a JOIN t{_BPE_ROUNDS} b USING (doc_id)
"""
    )


@query(
    "text_bpe_apply",
    oracle=_bpe_apply_oracle(),
    doc=f"Tokenizer INFERENCE over the {_BPE_ROUNDS} trained BPE merges — "
    "the encode side of text_bpe_train_merges (train and apply share one "
    "merge derivation, so the pair is the full tokenizer lifecycle): every "
    "merge is applied in rank order as a literal map-only REPLACE (the "
    "merge table is inherently tiny — it rides into the task as a "
    "literal, the broadcast-artifact pattern), and the output is per-doc "
    "raw vs encoded token counts — the compression measurement a "
    "token-budgeted training pipeline actually consumes. Apply is "
    "embarrassingly parallel: N sequential REPLACEs per row, no shuffle "
    "after the merge table exists; at 100 TB re-deriving the merges costs "
    "rounds × scan (text_bpe_train_merges' trade) and a production run "
    "loads the persisted merge table instead — the apply pass itself is "
    "ONE scan regardless.",
)
def text_bpe_apply(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(_t(spark, sf, "documents"))
    base = d.select(
        "doc_id",
        F.concat(F.lit(" "), F.trim(F.lower(F.col("text"))), F.lit(" ")).alias(
            "pt"
        ),
    )
    cur = base
    for _ in range(_BPE_ROUNDS):
        best = _bpe_best_pair(cur)
        if best is None:
            break
        cur = cur.select("doc_id", _bpe_merge_expr(best[0]).alias("pt"))
    n_raw = F.size(F.split(F.trim(F.col("pt")), " "))
    raw = base.select("doc_id", n_raw.alias("n_tokens_raw"))
    enc = cur.select("doc_id", n_raw.alias("n_tokens_bpe"))
    return (
        raw.join(enc, "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens_raw").cast("long").alias("n_tokens_raw"),
            F.col("n_tokens_bpe").cast("long").alias("n_tokens_bpe"),
            (F.col("n_tokens_raw") - F.col("n_tokens_bpe"))
            .cast("long")
            .alias("n_merged"),
        )
    )


# --------------------------------------------------------------------------
# Weighted sampling (deterministic A-ES-style priority sample per stratum)
# --------------------------------------------------------------------------

_WS_SCALE = 1_000_000
_WS_K = 10


@query(
    "text_weighted_sample",
    oracle=f"""
    WITH pri AS (
      SELECT doc_id, source, n_chars,
             (({o_hash_bucket('doc_id', 65536)}) + 1)
               * {_WS_SCALE} // GREATEST(n_chars, 1) AS priority
      FROM documents
    )
    SELECT * FROM (
      SELECT doc_id, source, n_chars, priority,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY priority, doc_id) AS BIGINT) AS rn
      FROM pri)
    WHERE rn <= {_WS_K}
    """,
    doc=f"Size-weighted sampling without replacement, top-{_WS_K} per source "
    "stratum: each doc draws a DETERMINISTIC pseudo-uniform from the shared "
    "md5 hash-bucket idiom and its priority is hash/weight in exact integer "
    "arithmetic (the A-ES exponential-jitter scheme with the randomness "
    "replaced by the reproducible hash — same sample on every run, engine, "
    "and partitioning, which float -ln(u)/w sampling cannot give). "
    "Larger docs (weight = n_chars) win smaller priorities and are "
    "over-represented — byte-budget-proportional corpus subsetting. "
    "Map-only priorities + one per-stratum top-k window; at 100 TB the "
    "window's shuffle carries only (stratum, priority) keys and per-"
    "partition TakeOrdered pre-pruning applies if k·strata is small.",
)
def text_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = _t(spark, sf, "documents")
    pri = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.call_function(
            "div",
            (hash_bucket("doc_id", 65536) + 1) * _WS_SCALE,
            F.greatest(F.col("n_chars"), F.lit(1)),
        ).alias("priority"),
    )
    w = W.partitionBy("source").orderBy("priority", "doc_id")
    return (
        pri.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _WS_K)
        .withColumn("rn", F.col("rn").cast("long"))
    )


# --------------------------------------------------------------------------
# PMI collocations (informative-pair mining, fixed-point)
# --------------------------------------------------------------------------

_PMI_SCALE = 1_000_000
_PMI_MIN_COUNT = 5


@query(
    "text_collocations_pmi",
    oracle=f"""
    WITH tok AS (
      SELECT STR_SPLIT(TRIM(LOWER(text)), ' ') AS w FROM documents
    ),
    bg AS (
      SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(w)), i -> [w[i], w[i+1]])) AS p
      FROM tok WHERE LEN(w) >= 2
    ),
    pc AS (SELECT p[1] AS x, p[2] AS y, COUNT(*) AS cxy FROM bg GROUP BY 1, 2),
    ux AS (SELECT x, SUM(cxy) AS cx FROM pc GROUP BY 1),
    uy AS (SELECT y, SUM(cxy) AS cy FROM pc GROUP BY 1),
    n AS (SELECT SUM(cxy) AS nn FROM pc)
    SELECT x, y, CAST(cxy AS BIGINT) AS cxy,
           CAST((cxy * nn * {_PMI_SCALE}) // (cx * cy) AS BIGINT) AS pmi_scaled
    FROM pc JOIN ux USING (x) JOIN uy USING (y) CROSS JOIN n
    WHERE cxy >= {_PMI_MIN_COUNT}
    """,
    doc="Collocation mining by pointwise mutual information: bigrams scored "
    "by p(x,y)/(p(x)p(y)) in exact integer fixed point ((cxy·N·1e6) // "
    "(cx·cy) — monotone in PMI, so ranking and thresholds agree while "
    "staying bit-reproducible where log-PMI is not) — frequency finds "
    "COMMON pairs (text_heavy_hitters); PMI finds INFORMATIVE ones, the "
    "phrase-mining signal behind tokenizer vocab curation and multi-word "
    "entity detection. One pair-count aggregate (map-side combining), two "
    "marginal aggregates over the PAIR table (vocabulary-sized, not "
    "corpus-sized), marginals broadcast back, support cut at "
    f"{_PMI_MIN_COUNT}. Headroom: the int64 bound is cxy·N·1e6 < 2^63 "
    "(cxy·N ≲ 9.2e12), CHECKED at runtime with a loud remediation error — "
    "under ANSI mode an overflow is a hard mid-query crash while DuckDB "
    "silently widens to HUGEINT, so the engines would otherwise diverge; "
    "shift the scale down as the corpus grows (the ratio, not the "
    "magnitude, carries the signal).",
)
def text_collocations_pmi(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    # tokens materialized in their own projection FIRST — an inline split
    # expression inside the shingle lambda re-evaluates per window position
    # (the measured O(tokens²) trap in shingles_of_tokens' docstring)
    toks = d.select(tokens("text").alias("_w"))
    pairs = (
        toks.select(
            F.explode(shingles_of_tokens("_w", 2, distinct=False)).alias("s")
        )
        .select(F.split("s", " ").alias("p"))
        .select(F.col("p")[0].alias("x"), F.col("p")[1].alias("y"))
    )
    pc = pairs.groupBy("x", "y").agg(F.count(F.lit(1)).alias("cxy"))
    stats = pc.agg(
        F.sum("cxy").alias("n"), F.max("cxy").alias("mx")
    ).collect()[0]
    n = int(stats["n"] or 0)  # sum over zero rows is NULL, not 0
    if n == 0:  # no bigrams anywhere — empty result, matching the oracle
        return spark.createDataFrame(
            [], "x string, y string, cxy long, pmi_scaled long"
        )
    # int64 headroom is cxy·N·SCALE < 2^63 (NOT 'N alone'); under ANSI mode
    # an overflow is a hard crash while DuckDB silently widens to HUGEINT —
    # fail LOUDLY with the remediation instead of diverging
    if int(stats["mx"]) * n * _PMI_SCALE >= 2**63:
        raise RuntimeError(
            f"PMI fixed-point overflow: max(cxy)={stats['mx']} × N={n} × "
            f"{_PMI_SCALE} exceeds int64 — lower _PMI_SCALE (the ratio, not "
            "the magnitude, carries the signal)"
        )
    ux = pc.groupBy("x").agg(F.sum("cxy").alias("cx"))
    uy = pc.groupBy("y").agg(F.sum("cxy").alias("cy"))
    return (
        pc.join(F.broadcast(ux), "x")
        .join(F.broadcast(uy), "y")
        .filter(F.col("cxy") >= _PMI_MIN_COUNT)
        .select(
            "x",
            "y",
            F.col("cxy").cast("long").alias("cxy"),
            F.call_function(
                "div",
                F.col("cxy") * F.lit(int(n)) * F.lit(_PMI_SCALE),
                F.col("cx") * F.col("cy"),
            ).cast("long").alias("pmi_scaled"),
        )
    )


# --------------------------------------------------------------------------
# PII detection / scrubbing (the pre-training redaction gate)
# --------------------------------------------------------------------------

# RE2-and-Java-compatible patterns (no lookaround, no backrefs): both engines
# must parse them identically or the parity breaks loudly
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
_PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH pii_docs AS (
      -- the corpus is PII-free by construction, so both sides append the
      -- SAME deterministic synthetic PII (keyed off doc_id) — every match
      -- and replacement path fires on real spans instead of vacuously
      -- matching nothing
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 5 = 0
                     THEN ' contact_' || doc_id || '@example.com' ELSE '' END
             || CASE WHEN doc_id % 7 = 0
                     THEN ' from 10.' || doc_id % 256 || '.0.' || doc_id % 200
                     ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                     THEN ' call 555-867-5309' ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(LENGTH(text) - LENGTH(regexp_replace(text,
                '{_PII_EMAIL}', '', 'g')) AS BIGINT) > 0 AS has_email,
           CAST(ARRAY_LENGTH(regexp_extract_all(text, '{_PII_EMAIL}'))
                AS BIGINT) AS n_emails,
           CAST(ARRAY_LENGTH(regexp_extract_all(text, '{_PII_IP}'))
                AS BIGINT) AS n_ips,
           CAST(ARRAY_LENGTH(regexp_extract_all(text, '{_PII_PHONE}'))
                AS BIGINT) AS n_phones,
           CAST(LENGTH(regexp_replace(regexp_replace(regexp_replace(text,
                '{_PII_EMAIL}', '<EMAIL>', 'g'),
                '{_PII_IP}', '<IP>', 'g'),
                '{_PII_PHONE}', '<PHONE>', 'g')) AS BIGINT)
             AS scrubbed_n_chars
    FROM pii_docs
    """,
    doc="PII detection + redaction — the scrub gate every pre-training "
    "corpus passes before release: per-document counts of emails / IPv4s / "
    "phone numbers and the length of the text after replacing each class "
    "with a typed placeholder (the length, not the scrubbed text itself, "
    "keeps the oracle comparison scalar; the replacement expression is the "
    "productized output). Patterns are restricted to the RE2∩Java-regex "
    "common subset (no lookaround/backrefs) so Spark's JVM regex and "
    "DuckDB's RE2 match identical spans — a portability constraint any "
    "cross-engine pipeline must pin, which the hash parity does. Pure "
    "map-only codegen (regexp_count/regexp_replace): zero shuffles, "
    "streams at scan speed over 100 TB, the cheapest full-corpus pass "
    "in the pipeline.",
)
def text_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    raw = _t(spark, sf, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(" contact_"), F.col("doc_id"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" from 10."),
                F.col("doc_id") % 256,
                F.lit(".0."),
                F.col("doc_id") % 200,
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit(" call 555-867-5309")).otherwise(
            F.lit("")
        ),
    )
    d = raw.select("doc_id", aug.alias("text"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), F.lit(_PII_EMAIL), F.lit("<EMAIL>")),
            F.lit(_PII_IP),
            F.lit("<IP>"),
        ),
        F.lit(_PII_PHONE),
        F.lit("<PHONE>"),
    )
    n_emails = F.regexp_count("text", F.lit(_PII_EMAIL))
    return d.select(
        "doc_id",
        (n_emails > 0).alias("has_email"),
        n_emails.cast("long").alias("n_emails"),
        F.regexp_count("text", F.lit(_PII_IP)).cast("long").alias("n_ips"),
        F.regexp_count("text", F.lit(_PII_PHONE)).cast("long").alias("n_phones"),
        F.length(scrubbed).cast("long").alias("scrubbed_n_chars"),
    )


# --------------------------------------------------------------------------
# Readability scoring (Flesch / Flesch-Kincaid, fixed-point)
# --------------------------------------------------------------------------


@query(
    "text_readability",
    oracle=r"""
    WITH c AS (
      SELECT doc_id,
             LEN(regexp_extract_all(text, '[^ \t\n\r]+')) AS nw,
             GREATEST(LEN(regexp_extract_all(text, '[.!?]+')), 1) AS ns,
             LEN(regexp_extract_all(text, '[AEIOUYaeiouy]+')) AS sy
      FROM documents)
    SELECT doc_id,
           CAST(nw AS BIGINT) AS n_words,
           CAST(ns AS BIGINT) AS n_sentences,
           CAST(sy AS BIGINT) AS n_syllables,
           CASE WHEN nw > 0 THEN CAST(206835 - (1015*nw)//ns - (84600*sy)//nw
                                      AS BIGINT) END AS flesch_milli,
           CASE WHEN nw > 0 THEN CAST((390*nw)//ns + (11800*sy)//nw - 15590
                                      AS BIGINT) END AS fkgl_milli
    FROM c
    """,
    doc="Readability scoring — Flesch reading ease and Flesch-Kincaid "
    "grade level per document, the classic text-quality feature for "
    "corpus curation (filter too-hard/too-trivial docs, stratify "
    "training mixes by difficulty). Syllables use the standard "
    "vowel-group heuristic (runs of [aeiouy]), words are "
    "whitespace-delimited runs, sentences count [.!?]+ terminators "
    "(floored at 1). All three counters are single regexp_count "
    "expressions — map-only, whole-stage-codegen, zero shuffles, and "
    "the patterns stay in the RE2∩Java subset (explicit character "
    "classes, no lookaround) so both engines count identically. Scores "
    "are fixed-point milli-units via truncating integer division — "
    "exact cross-engine, no float formula drift. Empty docs emit NULL "
    "scores, never a divide-by-zero (ANSI mode crashes on those).",
)
def text_readability(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    # counters widened to long BEFORE the score arithmetic: 84600*sy in
    # 32-bit overflows at ~25k vowel groups (~150 KB of text) — an ANSI
    # crash on any realistically-sized pre-training document
    c = d.select(
        "doc_id",
        F.regexp_count("text", F.lit(r"[^ \t\n\r]+"))
        .cast("long")
        .alias("nw"),
        F.greatest(F.regexp_count("text", F.lit(r"[.!?]+")), F.lit(1))
        .cast("long")
        .alias("ns"),
        F.regexp_count("text", F.lit("[AEIOUYaeiouy]+"))
        .cast("long")
        .alias("sy"),
    )
    nw, ns, sy = F.col("nw"), F.col("ns"), F.col("sy")
    div = lambda a, b: F.call_function("div", a, b)  # noqa: E731
    return c.select(
        "doc_id",
        nw.cast("long").alias("n_words"),
        ns.cast("long").alias("n_sentences"),
        sy.cast("long").alias("n_syllables"),
        F.when(
            nw > 0,
            F.lit(206835) - div(1015 * nw, ns) - div(84600 * sy, nw),
        )
        .cast("long")
        .alias("flesch_milli"),
        F.when(
            nw > 0, div(390 * nw, ns) + div(11800 * sy, nw) - F.lit(15590)
        )
        .cast("long")
        .alias("fkgl_milli"),
    )


# --------------------------------------------------------------------------
# Byte-entropy quality signal (compression-ratio proxy)
# --------------------------------------------------------------------------


@query(
    "text_byte_entropy",
    oracle="""
    WITH hx AS (SELECT doc_id, HEX(ENCODE(text)) AS h,
                       OCTET_LENGTH(ENCODE(text)) AS n FROM documents),
    codes AS (SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, n+1),
            i -> (STRPOS('0123456789ABCDEF',
                         SUBSTR(h, CAST(2*i-1 AS BIGINT), 1)) - 1) * 16
               + (STRPOS('0123456789ABCDEF',
                         SUBSTR(h, CAST(2*i AS BIGINT), 1)) - 1))) AS b
      FROM hx),
    cnt AS (SELECT doc_id, b, COUNT(*) AS c FROM codes GROUP BY 1, 2),
    tot AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS k FROM cnt GROUP BY 1)
    SELECT c.doc_id,
           CAST(MIN(t.n) AS BIGINT) AS n_bytes,
           CAST(MIN(t.k) AS BIGINT) AS n_distinct_bytes,
           ROUND(-SUM((c.c * 1.0 / t.n) * LN(c.c * 1.0 / t.n)), 4) + 0.0
             AS entropy_nats
    FROM cnt c JOIN tot t ON c.doc_id = t.doc_id
    GROUP BY 1
    """,
    doc="Per-document byte entropy — the compression-ratio proxy quality "
    "filters use to catch both degenerate repetition (entropy ≪ "
    "natural-text ~4.2 nats: boilerplate, repeated tokens, padding) and "
    "already-compressed/binary junk (entropy → ln 256): Shannon entropy "
    "of the UTF-8 byte histogram per doc. The Spark side is ONE "
    "map-only Arrow pass (np.bincount + p·ln p per batch row — nothing "
    "shuffles, the 100 TB shape for any per-doc statistic); the oracle "
    "rebuilds the histogram relationally from the hex transcription "
    "(byte semantics, the phash idiom). ROUND-4 grain absorbs libm and "
    "summation-order noise; +0.0 normalizes IEEE -0.0 for single-byte "
    "docs. Empty docs are omitted by BOTH sides (no bytes, no "
    "distribution).",
)
def text_byte_entropy(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    d = _t(spark, sf, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def op(batches):
        for pdf in batches:
            ids, nb, nd, ent = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                cnt = np.bincount(arr, minlength=256)
                p = cnt[cnt > 0] / arr.size
                ids.append(doc_id)
                nb.append(arr.size)
                nd.append(int((cnt > 0).sum()))
                ent.append(float(np.round(-(p * np.log(p)).sum(), 4)) + 0.0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_bytes": pd.Series(nb, dtype="int64"),
                    "n_distinct_bytes": pd.Series(nd, dtype="int64"),
                    "entropy_nats": pd.Series(ent, dtype="float64"),
                }
            )

    return fan_out(d).mapInPandas(
        op,
        schema="doc_id long, n_bytes long, n_distinct_bytes long, "
        "entropy_nats double",
    )


# --------------------------------------------------------------------------
# Hapax-legomena ratio (within-document vocabulary concentration)
# --------------------------------------------------------------------------


@query(
    "text_hapax_ratio",
    oracle="""
    WITH w AS (
      SELECT doc_id, UNNEST(STR_SPLIT(TRIM(LOWER(text)), ' ')) AS tok
      FROM documents
    ),
    tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM w
           WHERE tok <> '' GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax,
           CAST(FLOOR(COUNT(*) FILTER (WHERE c = 1) * 1000000.0 / SUM(c))
                AS BIGINT) AS hapax_ppm
    FROM tc GROUP BY doc_id
    """,
    doc="Hapax-legomena profile per document — token count, type count, "
    "and the share of tokens that appear exactly once IN THAT document "
    "(ppm): high hapax share signals generative/organic text, low share "
    "signals template/boilerplate repetition — a standard lexical-"
    "diversity quality signal next to text_repetition's top-token gate. "
    "One explode + one (doc, token) hash aggregate (map-side combining "
    "inside each doc's partition) + one doc-level reduce; everything "
    "keys on doc_id, nothing global. Exact integers + one FLOOR'd IEEE "
    "division.",
)
def text_hapax_ratio(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    w = d.select(
        "doc_id", F.explode(tokens("text")).alias("tok")
    ).filter(F.col("tok") != "")
    tc = w.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    return tc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.count(F.when(F.col("c") == 1, 1)).cast("long").alias("n_hapax"),
        F.floor(
            F.count(F.when(F.col("c") == 1, 1))
            * F.lit(1000000.0)
            / F.sum("c")
        )
        .cast("long")
        .alias("hapax_ppm"),
    )


# --------------------------------------------------------------------------
# Vocabulary growth curve (Heaps' law empirics, global-sort-free)
# --------------------------------------------------------------------------


@query(
    "text_vocab_growth",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, STR_SPLIT(TRIM(LOWER(text)), ' ') AS w FROM documents
    ),
    bg AS (SELECT doc_id, UNNEST({o_shingles('w', 2)}) AS tok FROM tk),
    fo AS (SELECT tok, MIN(doc_id) AS first_doc FROM bg GROUP BY 1),
    nd AS (SELECT first_doc AS doc_id, COUNT(*) AS new_types
           FROM fo GROUP BY 1)
    SELECT doc_id, CAST(new_types AS BIGINT) AS new_types,
           CAST(SUM(new_types) OVER (ORDER BY doc_id) AS BIGINT)
             AS cum_vocab
    FROM nd
    """,
    doc="Vocabulary growth curve (Heaps'-law empirics) over BIGRAM types "
    "(the unigram vocabulary of this corpus saturates within a handful "
    "of documents — bigrams keep the curve informative, and the "
    "construction is identical at any n): for each document that "
    "introduces vocabulary, how many types appear there for the FIRST "
    "time in doc_id order, and the running vocabulary size — "
    "the curve that decides tokenizer vocab budgets and detects corpus "
    "staleness (a flattening curve means new data adds no new language). "
    "First-occurrence = min(doc_id) per token (one token-keyed "
    "aggregate); the cumulative sum NEVER runs a global window — the "
    "per-doc new-type counts range-partition on doc_id, P per-partition "
    "sums (cluster-bounded) prefix-sum on the driver into offsets, and "
    "the running total = offset + within-partition cumulative window "
    "(the q79 construction on a SUM instead of a rank). The oracle's "
    "global window is honest at its scale.",
)
def text_vocab_growth(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = _t(spark, sf, "documents")
    tk = d.select("doc_id", tokens("text").alias("w"))
    w = tk.select(
        "doc_id", F.explode(shingles_of_tokens("w", 2)).alias("tok")
    )
    fo = w.groupBy("tok").agg(F.min("doc_id").alias("first_doc"))
    nd = fo.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("new_types")
    )
    n_parts = int(
        d.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = (
        nd.repartitionByRange(n_parts, "doc_id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # pin layout: the offset collect
        # materializes the blocks; the window then reads the SAME layout
    )
    parts = sorted(
        ranged.groupBy("_pid").agg(F.sum("new_types").alias("s")).collect()
    )
    offs, acc = [], 0
    for row in parts:  # partition ids are emitted in range order
        offs.append((row._pid, acc))
        acc += row.s
    offdf = d.sparkSession.createDataFrame(offs, "_pid int, _off long")
    cum = W.partitionBy("_pid").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    return (
        ranged.join(F.broadcast(offdf), "_pid")
        .select(
            "doc_id",
            F.col("new_types").cast("long").alias("new_types"),
            (F.col("_off") + F.sum("new_types").over(cum))
            .cast("long")
            .alias("cum_vocab"),
        )
    )


# --------------------------------------------------------------------------
# Composed quality-filter pipeline (Dolma/C4-style gate with reason bitmask)
# --------------------------------------------------------------------------

# per-mille thresholds → every gate is an INTEGER cross-multiplication
# (n_uniq * 1000 < n_tokens * T), so keep/drop is exact on both engines
_QF_MIN_TOKENS = 40  # bit 0: too short
_QF_MIN_UNIQ_PM = 300  # bit 1: type/token ratio below 30%
_QF_MAX_TOP_PM = 150  # bit 2: most frequent token above 15% of tokens
_QF_MAX_CHARS_PER_TOK_X10 = 80  # bit 3: mean token length above 8.0 chars


def _qf_conditions(n_tokens, n_uniq, top_cnt, n_chars) -> list:
    """The four quality-gate failure conditions (bit order 0..3) as Spark
    Columns — the SINGLE Spark-side copy (text_quality_filter and
    text_prep_pipeline both consume it, so the thresholds can never drift;
    the fingerprint-fold rule from functions/textfns.py:104 applied here).
    All comparisons are integer CROSS-MULTIPLICATIONS — no float ratio."""
    return [
        n_tokens < _QF_MIN_TOKENS,
        n_uniq * 1000 < n_tokens * _QF_MIN_UNIQ_PM,
        top_cnt * 1000 > n_tokens * _QF_MAX_TOP_PM,
        n_chars * 10 > n_tokens * _QF_MAX_CHARS_PER_TOK_X10,
    ]


def _o_qf_conditions(t: str = "t", a: str = "a") -> list[str]:
    """DuckDB twins of :func:`_qf_conditions` over aliases ``t`` (has
    n_chars) and ``a`` (has n_tokens/n_uniq/top_cnt), same bit order."""
    return [
        f"{a}.n_tokens < {_QF_MIN_TOKENS}",
        f"{a}.n_uniq * 1000 < {a}.n_tokens * {_QF_MIN_UNIQ_PM}",
        f"{a}.top_cnt * 1000 > {a}.n_tokens * {_QF_MAX_TOP_PM}",
        f"{t}.n_chars * 10 > {a}.n_tokens * {_QF_MAX_CHARS_PER_TOK_X10}",
    ]


_QF_MASK_SQL = " + ".join(
    f"(CASE WHEN {cond} THEN {1 << bit} ELSE 0 END)"
    for bit, cond in enumerate(_o_qf_conditions())
)


@query(
    "text_quality_filter",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, LENGTH(TRIM(text)) AS n_chars,
             STR_SPLIT(TRIM(LOWER(text)), ' ') AS w
      FROM documents
    ),
    agg AS (
      SELECT doc_id, MAX(top_cnt) AS top_cnt, COUNT(*) AS n_uniq,
             SUM(top_cnt) AS n_tokens
      FROM (SELECT doc_id, tok, COUNT(*) AS top_cnt
            FROM (SELECT doc_id, UNNEST(w) AS tok FROM tk) GROUP BY 1, 2)
      GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(a.n_tokens AS BIGINT) AS n_tokens,
           CAST({_QF_MASK_SQL} AS BIGINT) AS fail_mask,
           {_QF_MASK_SQL} = 0 AS keep
    FROM tk t JOIN agg a USING (doc_id)
    """,
    doc="Composed quality-filter pipeline (the C4/Dolma-style keep/drop "
    "gate): four independent filters — minimum length, type/token "
    "diversity floor, top-token repetition ceiling, mean-token-length "
    "ceiling — evaluated per document into a REASON BITMASK (bit k set = "
    "filter k failed) plus the final keep decision. The bitmask is what "
    "a production pipeline needs: per-filter rejection rates and filter "
    "overlap fall out of one aggregation over it, and relaxing one gate "
    "is a mask AND away, with no re-scan. Every threshold compares via "
    "integer CROSS-MULTIPLICATION (n_uniq*1000 < n_tokens*300), so the "
    "decisions are exact on both engines — no float ratio ever exists. "
    "One explode + (doc, token) count + doc reduce (the hapax shape); "
    "everything keys on doc_id.",
)
def text_quality_filter(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    tk = d.select(
        "doc_id",
        F.length(F.trim(F.col("text"))).cast("long").alias("n_chars"),
        tokens("text").alias("w"),
    )
    tok = tk.select("doc_id", F.explode("w").alias("tok"))
    agg = (
        tok.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").alias("top_cnt"),
            F.count(F.lit(1)).alias("n_uniq"),
            F.sum("c").alias("n_tokens"),
        )
    )
    j = tk.select("doc_id", "n_chars").join(agg, "doc_id")
    conds = _qf_conditions(
        F.col("n_tokens"), F.col("n_uniq"), F.col("top_cnt"), F.col("n_chars")
    )
    mask = sum(
        (
            F.when(cond, F.lit(1 << bit)).otherwise(F.lit(0))
            for bit, cond in enumerate(conds)
        ),
        start=F.lit(0),
    )
    return j.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        mask.cast("long").alias("fail_mask"),
        (mask == 0).alias("keep"),
    )


# --------------------------------------------------------------------------
# Top-K vocabulary coverage curve (tokenizer-budget planning)
# --------------------------------------------------------------------------

_VC_TOP = 100  # ranked head size (fixed constant — bounded by design)


@query(
    "text_vocab_coverage",
    oracle=f"""
    WITH w AS (
      SELECT UNNEST(STR_SPLIT(TRIM(LOWER(text)), ' ')) AS tok FROM documents
    ),
    tc AS (SELECT tok, COUNT(*) AS c FROM w WHERE tok <> '' GROUP BY 1),
    tot AS (SELECT SUM(c) AS t FROM tc),
    top AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r FROM tc
      QUALIFY r <= {_VC_TOP}
    ),
    cum AS (SELECT r, SUM(c) OVER (ORDER BY r) AS cov FROM top)
    SELECT CAST(r AS BIGINT) AS k, CAST(cov AS BIGINT) AS covered_tokens,
           CAST(FLOOR(cov * 1000000.0 / t) AS BIGINT) AS coverage_ppm
    FROM cum, tot WHERE r % 10 = 0
    """,
    doc=f"Vocabulary coverage curve — what share of ALL token occurrences "
    f"the top-k most frequent types cover, for k = 10..{_VC_TOP} step 10: "
    "the curve that sizes tokenizer vocabularies and byte-fallback "
    "budgets (a head-heavy curve means a small vocab suffices). Token "
    "counts are one map-side-combining aggregate; the ranked head comes "
    f"via TakeOrderedAndProject (top-{_VC_TOP} on (count DESC, token) — "
    "never a global sort of the vocabulary, which scales with the "
    "corpus); the cumulative sum runs DRIVER-SIDE over those fixed "
    f"{_VC_TOP} rows (a bounded constant, not a corpus-dependent "
    "domain). The total is a 1-row scalar inlined as a literal.",
)
def text_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    w = d.select(F.explode(tokens("text")).alias("tok")).filter(
        F.col("tok") != ""
    )
    tc = w.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(eager=False)
    total = tc.agg(F.sum("c")).collect()[0][0]
    head = (
        tc.orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(_VC_TOP)
        .collect()
    )
    import math

    rows, cov = [], 0
    for r, row in enumerate(head, start=1):
        cov += row.c
        if r % 10 == 0:
            # math.floor(a / b) replays the oracle's FLOOR(double division)
            # operation-for-operation (float floordiv a // b is NOT the
            # same primitive and can land 1 ulp away)
            rows.append((r, cov, math.floor(cov * 1000000.0 / total)))
    return spark.createDataFrame(
        rows, "k long, covered_tokens long, coverage_ppm long"
    )


# --------------------------------------------------------------------------
# End-to-end training-data preparation pipeline (the flagship composition)
# --------------------------------------------------------------------------


@query(
    "text_prep_pipeline",
    oracle=f"""
    WITH tk AS MATERIALIZED (
      SELECT doc_id, source, LENGTH(TRIM(text)) AS n_chars,
             STR_SPLIT(TRIM(LOWER(text)), ' ') AS w,
             {o_fingerprint("TRIM(LOWER(text))")} AS fpn
      FROM documents
    ),
    qa AS (
      SELECT doc_id, MAX(c) AS top_cnt, COUNT(*) AS n_uniq, SUM(c) AS n_tokens
      FROM (SELECT doc_id, tok, COUNT(*) AS c
            FROM (SELECT doc_id, UNNEST(w) AS tok FROM tk) GROUP BY 1, 2)
      GROUP BY doc_id
    ),
    s1 AS (  -- stage 1: eval split held out + quality gate (all four filters)
      SELECT t.doc_id, t.source, t.fpn, a.n_tokens
      FROM tk t JOIN qa a USING (doc_id)
      WHERE t.doc_id % {_EVAL_MOD} != 0
        AND NOT ({" OR ".join(_o_qf_conditions())})
    ),
    s2 AS MATERIALIZED (  -- stage 2: exact dedup on fingerprint, keep-first
      SELECT doc_id, source, n_tokens FROM (
        SELECT s1.*, ROW_NUMBER() OVER (PARTITION BY fpn ORDER BY doc_id) AS rn
        FROM s1)
      WHERE rn = 1
    ),
    g AS MATERIALIZED (
      SELECT doc_id, {o_shingles('w', _DECON_N)} AS grams FROM tk
    ),
    ev AS (SELECT DISTINCT UNNEST(grams) AS gram FROM g
           WHERE doc_id % {_EVAL_MOD} = 0),
    dirty AS (  -- stage 3: drop survivors sharing any eval n-gram
      SELECT DISTINCT cg.doc_id
      FROM (SELECT g.doc_id, UNNEST(g.grams) AS gram
            FROM g JOIN s2 USING (doc_id)) cg
      JOIN ev USING (gram)
    ),
    s3 AS (SELECT s2.* FROM s2 ANTI JOIN dirty USING (doc_id)),
    c AS (  -- stage 4: deterministic sequence packing per source domain
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM s3
    )
    SELECT doc_id, source,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(cum - n_tokens
                - ((cum - n_tokens) // {_PACK_BUDGET}) * {_PACK_BUDGET}
                AS BIGINT) AS pack_offset
    FROM c
    """,
    doc=f"END-TO-END training-data preparation — the composition a reference "
    "user actually ships, as ONE declarative plan: (1) hold out the eval "
    f"split (doc_id % {_EVAL_MOD}) and apply the four-filter C4/Dolma "
    "quality gate (the SHARED _qf_conditions predicate — one copy, so the "
    "thresholds can never drift from text_quality_filter), (2) exact-dedup "
    "on the normalized rolling-hash fingerprint keeping the first doc_id "
    "(text_fingerprint + row_number, the dedup_exact keep-first "
    f"convention), (3) decontaminate: drop any survivor sharing a word "
    f"{_DECON_N}-gram with the eval split (broadcast eval grams, the "
    "text_decontaminate shape), (4) pack survivors into "
    f"{_PACK_BUDGET}-token training sequences per source domain in "
    "deterministic doc_id order (text_pack_sequences). The gram stream is "
    "CACHED (the text_decontaminate convention — both the eval and corpus "
    "branches read it) and the survivor set s2 is cached too (the "
    "contamination probe and the anti-join both consume it; uncached, the "
    "fingerprint fold + quality aggregate + dedup window would run twice); "
    "token arrays never ride a shuffle — the dedup window carries only "
    "(doc_id, source, fpn, n_tokens), and shingles come from the cached "
    "pre-window gram stream keyed by doc_id. The oracle marks its "
    "multiply-referenced CTEs AS MATERIALIZED (DuckDB inlines plain CTEs "
    "per reference — the repo's standing lesson). Scale: two shuffles for "
    "the quality aggregate, one window on the near-unique fingerprint, a "
    "broadcast join, one window per source domain; every stage is the "
    "already-scale-reviewed building block.",
)
def text_prep_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = _t(spark, sf, "documents")
    tk = d.select(
        "doc_id",
        "source",
        F.length(F.trim(F.col("text"))).cast("long").alias("n_chars"),
        tokens("text").alias("w"),
        fingerprint(F.trim(F.lower(F.col("text")))).alias("fpn"),
    )
    qa = (
        tk.select("doc_id", F.explode("w").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").alias("top_cnt"),
            F.count(F.lit(1)).alias("n_uniq"),
            F.sum("c").alias("n_tokens"),
        )
    )
    conds = _qf_conditions(
        F.col("n_tokens"), F.col("n_uniq"), F.col("top_cnt"), F.col("n_chars")
    )
    bad = conds[0]
    for cnd in conds[1:]:
        bad = bad | cnd
    # token arrays stay OUT of s1/s2: the dedup window shuffles only doc
    # metadata; shingles come from the cached gram stream below
    s1 = (
        tk.join(qa, "doc_id")
        .filter((F.col("doc_id") % _EVAL_MOD != 0) & ~bad)
        .select("doc_id", "source", "fpn", "n_tokens")
    )
    rn = F.row_number().over(W.partitionBy("fpn").orderBy("doc_id"))
    # cached: the contamination probe AND the anti-join both consume s2 —
    # uncached, the fingerprint fold + quality aggregate + dedup window
    # would evaluate twice (and differing column pruning between the two
    # consumers defeats ReusedExchange)
    s2 = (
        s1.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "n_tokens")
        .cache()
    )
    # cached: both the eval side and the corpus probe read the gram stream
    # (the text_decontaminate convention)
    grams = tk.select(
        "doc_id", F.explode(shingles_of_tokens("w", _DECON_N)).alias("gram")
    ).cache()
    ev = (
        grams.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .select("gram")
        .distinct()
    )
    dirty = (
        grams.join(s2.select("doc_id"), "doc_id")
        .join(F.broadcast(ev), "gram")
        .select("doc_id")
        .distinct()
    )
    s3 = s2.join(dirty, "doc_id", "left_anti")
    w_pack = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    pre = (F.sum("n_tokens").over(w_pack) - F.col("n_tokens")).alias("pre")
    c = s3.select("doc_id", "source", "n_tokens", pre)
    pack_id = F.expr(f"pre div {_PACK_BUDGET}")
    return c.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        pack_id.cast("long").alias("pack_id"),
        (F.col("pre") - pack_id * _PACK_BUDGET)
        .cast("long")
        .alias("pack_offset"),
    )


# --------------------------------------------------------------------------
# Linear quality-classifier inference (model-based filtering)
# --------------------------------------------------------------------------

_CLF_DIM = 64  # hashed feature space of the "trained" linear model
# Deterministic stand-in for trained weights (a real pipeline loads these
# from the classifier artifact): integer weights in [-500, 500] derived from
# the dimension index by a fixed multiplicative hash, embedded as literals
# in BOTH engines so the parity check is exact. Integer weights make the
# score an exact sum — no float-order concerns anywhere.
_CLF_WEIGHTS = [((d * 2654435761) % (1 << 31)) % 1001 - 500 for d in range(_CLF_DIM)]


@query(
    "text_classifier_score",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, STR_SPLIT(TRIM(LOWER(text)), ' ') AS w FROM documents
    ), s AS (
      SELECT doc_id,
             CAST(LEN(w) AS BIGINT) AS n_tokens,
             CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(w,
               t -> ([{", ".join(str(x) for x in _CLF_WEIGHTS)}])
                      [({o_fingerprint('t')} % {_CLF_DIM}) + 1])), 0)
               AS BIGINT) AS score
      FROM w
    )
    SELECT doc_id, n_tokens, score,
           CAST(score * 1000 // GREATEST(n_tokens, 1) AS BIGINT)
             AS score_milli,
           CAST(CASE WHEN score * 1000 // GREATEST(n_tokens, 1) > 0
                     THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM s
    """,
    doc="Model-based quality filtering: the INFERENCE half of a linear "
    f"(fastText-style) document classifier — each token hashes into a "
    f"{_CLF_DIM}-dim feature space by the shared polynomial fingerprint, "
    "the document score is the exact integer sum of its tokens' weights "
    "(the model vector rides the plan as a constant-folded array literal — "
    "operationally a broadcast of the classifier artifact), and the keep "
    "decision thresholds the length-normalized fixed-point score. This is "
    "the FineWeb-Edu / DCLM pipeline shape (hash features -> linear score "
    "-> threshold gate) with deterministic stand-in weights, so the oracle "
    "replays the identical arithmetic. Map-only whole-stage codegen: no "
    "shuffle, no Python, no fitted state — at 100 TB it is scan-bound and "
    "embarrassingly parallel, exactly how a quality-model gate must run. "
    "Length-normalization uses exact integer div (both engines truncate "
    "toward zero) so scores are bit-reproducible across partitionings.",
)
def text_classifier_score(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents").select("doc_id", tokens("text").alias("w"))
    d = fan_out(d)  # per-token hash folds are compute-bound, not scan-bound
    ws = F.array(*[F.lit(int(x)) for x in _CLF_WEIGHTS])
    score = F.aggregate(
        F.col("w"),
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.element_at(ws, (fingerprint(t) % _CLF_DIM + 1).cast("int")),
    )
    s = d.select(
        "doc_id",
        F.size("w").cast("long").alias("n_tokens"),
        score.alias("score"),
    )
    milli = F.expr("(score * 1000) div greatest(n_tokens, 1)")
    return s.select(
        "doc_id",
        "n_tokens",
        "score",
        milli.cast("long").alias("score_milli"),
        F.when(milli > 0, F.lit(1)).otherwise(F.lit(0)).cast("int").alias("keep"),
    )


# --------------------------------------------------------------------------
# Tokenizer fertility (per-language tokenizer-quality report)
# --------------------------------------------------------------------------


@query(
    "text_tokenizer_fertility",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang,
             LEN(regexp_extract_all(LOWER(text), '{_BPE_PATTERN}'))
               AS n_pieces,
             LEN(STR_SPLIT(TRIM(LOWER(text)), ' ')) AS n_words,
             OCTET_LENGTH(ENCODE(text)) AS n_bytes
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_pieces) AS BIGINT) AS total_pieces,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(SUM(n_pieces) * 1000 // GREATEST(SUM(n_words), 1) AS BIGINT)
             AS fertility_milli,
           CAST(SUM(n_bytes) * 1000 // GREATEST(SUM(n_pieces), 1) AS BIGINT)
             AS bytes_per_piece_milli
    FROM per_doc GROUP BY 1
    """,
    doc="Tokenizer FERTILITY report per language — the tokenizer-evaluation "
    "metric multilingual pipelines gate vocab choices on (fertility = "
    "subword pieces per whitespace word; a language where it balloons is "
    "under-served by the vocabulary and pays more sequence length for "
    "the same text; bytes-per-piece is the compression view of the same "
    "trade): the shared BPE-ish pre-tokenizer segments each document, "
    "counts aggregate per lang in exact integer fixed point (milli "
    "units, truncating div both engines agree on). One map-only regex "
    "pass in codegen, one map-side-combining groupBy over the tiny "
    "language domain; at 100 TB it is scan-bound with a ~|langs|-row "
    "result — the report that decides whether the tokenizer gets "
    "retrained before the next corpus release.",
)
def text_tokenizer_fertility(spark: SparkSession, sf: str) -> DataFrame:
    return fertility_report(_t(spark, sf, "documents"))


def fertility_report(d: DataFrame) -> DataFrame:
    """Per-language fertility aggregate over any (lang, text) frame — the
    registry query runs it on documents; the unit test runs it on a
    punctuation-bearing fixture because the synthetic corpus is
    single-piece-per-word (fertility exactly 1000 for every language), so
    oracle parity alone never exercises the multi-piece path this metric
    exists to measure."""
    pieces = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit(_BPE_PATTERN), 0
    )
    per = d.select(
        "lang",
        F.size(pieces).alias("n_pieces"),
        F.size(tokens("text")).alias("n_words"),
        F.octet_length(F.col("text")).alias("n_bytes"),
    )
    g = per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_pieces").cast("long").alias("total_pieces"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.sum("n_bytes").alias("_tb"),
    )
    return g.select(
        "lang",
        "n_docs",
        "total_pieces",
        "total_words",
        F.expr("total_pieces * 1000 div greatest(total_words, 1)")
        .cast("long")
        .alias("fertility_milli"),
        F.expr("_tb * 1000 div greatest(total_pieces, 1)")
        .cast("long")
        .alias("bytes_per_piece_milli"),
    )


# --------------------------------------------------------------------------
# Winnowing fingerprints (MOSS) — robust k-gram selection
# --------------------------------------------------------------------------

_WIN_K = 5  # k-gram width in chars
_WIN_W = 4  # winnowing window (guarantee: any match >= K+W-1 chars is caught)

# rightmost-argmin without struct folds: minimize code = h*8 + (7 - i) over
# the window — smaller hash wins, ties prefer the LARGER in-window offset i
# (the winnowing rightmost rule); decode pos = j + 6 - (code % 8). Valid
# because the in-window offset i <= W < 8 and h < FP_MOD << 2^60/8.

# the shared winnowing CTE chain (base → k-gram hashes → window dims →
# selected positions), replayed by text_winnow_fingerprint's stats AND
# dedup_winnow_overlap's pair detector — one definition, two oracles
WINNOW_SEL_CTES = f"""base AS (
      SELECT doc_id, LOWER(TRIM(text)) AS t FROM documents
    ),
    kg AS (
      SELECT doc_id,
             CASE WHEN LENGTH(t) >= {_WIN_K}
                  THEN LIST_TRANSFORM(RANGE(1, LENGTH(t) - {_WIN_K} + 2),
                         p -> {o_fingerprint(f"SUBSTR(t, p, {_WIN_K})")})
                  ELSE CAST([] AS BIGINT[]) END AS kh
      FROM base
    ),
    dims AS (
      SELECT doc_id, kh, LEN(kh) AS m,
             CASE WHEN LEN(kh) = 0 THEN 0
                  WHEN LEN(kh) < {_WIN_W} THEN 1
                  ELSE LEN(kh) - {_WIN_W} + 1 END AS nw,
             LEAST({_WIN_W}, LEN(kh)) AS span
      FROM kg
    ),
    sel AS (
      SELECT doc_id, kh, m,
             CASE WHEN nw >= 1 THEN LIST_DISTINCT(
               LIST_TRANSFORM(RANGE(1, nw + 1),
                 j -> j + 6 - (LIST_MIN(
                        LIST_TRANSFORM(RANGE(1, span + 1),
                          i -> kh[j - 1 + i] * 8 + 7 - i)) % 8)))
             ELSE CAST([] AS BIGINT[]) END AS sp
      FROM dims
    )"""


def winnow_selections(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, kh k-gram hash array, m k-gram count, sp selected 1-based
    positions) — the Spark twin of :data:`WINNOW_SEL_CTES`, shared by
    text_winnow_fingerprint (per-doc stats) and dedup_winnow_overlap
    (pair detection). See text_winnow_fingerprint's doc for the plan
    shape and the argmin encoding."""
    # per-row-expensive map stage (char-code transform + per-window folds)
    # over single-row-group files: fan_out is the documented pattern, the
    # one exchange here moves each row once so the compute scales with cores
    d = fan_out(_t(spark, sf, "documents")).select(
        "doc_id", F.lower(F.trim(F.col("text"))).alias("t")
    )
    # split into char codes ONCE per doc (the shingles_of_tokens discipline:
    # bind the array to a column before lambda-heavy consumption), then hash
    # each window with the CANONICAL fold (textfns.fingerprint_codes — the
    # sliding-window twin of fingerprint/o_fingerprint; one split per doc
    # instead of one per position)
    codes = d.select(
        "doc_id",
        F.length("t").alias("n"),
        F.transform(F.split("t", ""), lambda ch: F.ascii(ch).cast("long")).alias(
            "cs"
        ),
    )
    kg = codes.select(
        "doc_id",
        F.when(
            F.col("n") >= _WIN_K,
            F.transform(
                F.sequence(F.lit(1), F.col("n") - _WIN_K + 1),
                lambda p: fingerprint_codes(F.slice(F.col("cs"), p, _WIN_K)),
            ),
        )
        .otherwise(F.expr("CAST(array() AS array<bigint>)"))
        .alias("kh"),
    )
    dims = kg.select(
        "doc_id",
        "kh",
        F.size("kh").alias("m"),
        F.expr(
            f"CASE WHEN size(kh) = 0 THEN 0 "
            f"WHEN size(kh) < {_WIN_W} THEN 1 "
            f"ELSE size(kh) - {_WIN_W} + 1 END"
        ).alias("nw"),
        F.least(F.lit(_WIN_W), F.size("kh")).alias("span"),
    )
    return dims.select(
        "doc_id",
        "kh",
        "m",
        F.expr(
            "CASE WHEN nw >= 1 THEN array_distinct("
            "transform(sequence(1, nw), "
            "j -> j + 6 - (array_min(transform(sequence(1, span), "
            "i -> element_at(kh, j - 1 + i) * 8 + 7 - i)) % 8)"
            ")) ELSE CAST(array() AS array<bigint>) END"
        ).alias("sp"),
    )


@query(
    "text_winnow_fingerprint",
    oracle=f"""
    WITH {WINNOW_SEL_CTES}
    SELECT doc_id,
           CAST(m AS BIGINT) AS n_kgrams,
           CAST(LEN(sp) AS BIGINT) AS n_selected,
           CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(sp, p -> kh[p])), 0)
                AS BIGINT) AS winnow_digest,
           CAST(CASE WHEN m > 0
                THEN FLOOR(LEN(sp) * 1000.0 / m) ELSE 0 END AS BIGINT)
             AS density_milli
    FROM sel
    """,
    doc=f"Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — "
    "the MOSS algorithm): hash every {k}-char k-gram with the shared "
    "31-polynomial rolling hash, slide a {w}-kgram window, and select each "
    "window's minimum hash (rightmost on ties) — the selected set is a "
    "position-robust document fingerprint with the guarantee that any "
    "shared substring of length >= k+w-1 = {g} contributes at least one "
    "common fingerprint, at expected density 2/(w+1). This is the "
    "substring-dedup/plagiarism sketch that text_fingerprint (whole-doc "
    "hash) and dedup_substring (fixed-stride blocks) don't give: "
    "position-insensitive AND local. Emitted per doc: k-gram count, "
    "selected count, digest (sum of selected hashes — certifies the exact "
    "selection set), and selection density in milli. Everything is one "
    "map-only codegen'd expression tree (nested higher-order functions "
    "over a column-bound hash array — no UDF; the only exchange is "
    "fan_out's row-once repartition so the per-row-expensive folds scale "
    "with cores: 4.4 s single-partition → 0.8 s at sf0.1). The rightmost "
    "argmin folds to an array_min via the h*8+(7-i) encoding, exact "
    "because h < FP_MOD << 2^60. The oracle replays the identical "
    "selection, so parity certifies hash, window rule, and tie-break "
    "end-to-end.".format(k=_WIN_K, w=_WIN_W, g=_WIN_K + _WIN_W - 1),
)
def text_winnow_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    sel = winnow_selections(spark, sf)
    return sel.select(
        "doc_id",
        F.col("m").cast("long").alias("n_kgrams"),
        F.size("sp").cast("long").alias("n_selected"),
        F.expr(
            "aggregate(sp, 0L, (a, p) -> a + element_at(kh, cast(p as int)))"
        )
        .cast("long")
        .alias("winnow_digest"),
        F.expr(
            "CASE WHEN m > 0 THEN CAST(FLOOR(size(sp) * 1000.0 / m) AS BIGINT) "
            "ELSE 0L END"
        ).alias("density_milli"),
    )


# --------------------------------------------------------------------------
# Boilerplate / template detection per source
# --------------------------------------------------------------------------

_BP_PREFIX_TOKENS = 2  # prefix granularity (template signature length)
_BP_FLAG_MILLI = 250  # flag a source when >= 25% of its docs share a prefix


@query(
    "text_boilerplate_detect",
    oracle=f"""
    WITH pf AS (
      SELECT doc_id, source,
             MD5(ARRAY_TO_STRING(LIST_SLICE(
               STR_SPLIT(TRIM(LOWER(text)), ' '), 1, {_BP_PREFIX_TOKENS}), ' '))
               AS h
      FROM documents
    ),
    cnt AS (
      SELECT source, h, COUNT(*) AS c FROM pf GROUP BY source, h
    ),
    top AS (
      SELECT source, h, c,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY c DESC, h) AS rn
      FROM cnt
    ),
    n AS (SELECT source, COUNT(*) AS n_docs FROM pf GROUP BY source)
    SELECT n.source,
           CAST(n.n_docs AS BIGINT) AS n_docs,
           CAST(t.c AS BIGINT) AS top_prefix_docs,
           CAST(FLOOR(t.c * 1000.0 / n.n_docs) AS BIGINT) AS prefix_share_milli,
           FLOOR(t.c * 1000.0 / n.n_docs) >= {_BP_FLAG_MILLI} AS flagged
    FROM n JOIN top t ON n.source = t.source AND t.rn = 1
    """,
    doc=f"Boilerplate/template detection per source — the CommonCrawl-"
    "pipeline pre-flight that catches feeds whose documents all open with "
    "the same navigation/header text (boilerplate inflates n-gram counts, "
    "poisons MinHash, and wastes training tokens): hash each doc's first "
    f"{_BP_PREFIX_TOKENS} tokens, find every source's dominant prefix "
    "(ties to the smaller hash, replayed exactly), and report its "
    f"document share in milli with a >= {_BP_FLAG_MILLI}/1000 flag — a "
    "flagged source goes to template-stripping before dedup. Shape: one "
    "map-only prefix hash, a map-side-combining (source, hash) count, a "
    "per-source top-1 window over the counted DISTINCT prefixes (bounded "
    "by docs-per-source, partitioned on source — never a corpus sort), "
    "and a |sources|-row join. Prefix granularity is a constant; on real "
    "corpora it is 10-50 tokens — the mechanism is length-agnostic.",
)
def text_boilerplate_detect(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents").select("doc_id", "source", tokens("text").alias("w"))
    pf = d.select(
        "source",
        F.md5(
            F.encode(
                F.concat_ws(" ", F.slice("w", 1, _BP_PREFIX_TOKENS)), "utf-8"
            )
        ).alias("h"),
    )
    cnt = pf.groupBy("source", "h").agg(F.count(F.lit(1)).alias("c"))
    w = W.partitionBy("source").orderBy(F.col("c").desc(), "h")
    top = cnt.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    # per-source doc counts from the ALREADY-AGGREGATED prefix counts — a
    # second pf.groupBy would re-scan and re-hash the whole corpus
    n = cnt.groupBy("source").agg(F.sum("c").alias("n_docs"))
    share = F.floor(F.col("c") * 1000.0 / F.col("n_docs"))
    return n.join(top, "source").select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("c").cast("long").alias("top_prefix_docs"),
        share.cast("long").alias("prefix_share_milli"),
        (share >= _BP_FLAG_MILLI).alias("flagged"),
    )


# --------------------------------------------------------------------------
# Zipf conformance (corpus-health fit to the 1/rank law, all-integer)
# --------------------------------------------------------------------------

_ZIPF_RANKS = 100


@query(
    "text_zipf_fit",
    oracle=f"""
    WITH tok AS (
      SELECT source, UNNEST(STR_SPLIT(TRIM(LOWER(text)), ' ')) AS t
      FROM documents
    ),
    freq AS (SELECT source, t, COUNT(*) AS f FROM tok GROUP BY 1, 2),
    ranked AS (
      SELECT source, f,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY f DESC, t) AS rn
      FROM freq
    ),
    top AS (
      SELECT source, f, rn,
             FIRST_VALUE(f) OVER (PARTITION BY source ORDER BY rn) AS f1
      FROM ranked WHERE rn <= {_ZIPF_RANKS}
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_ranks,
           CAST(MAX(f1) AS BIGINT) AS top1_freq,
           CAST(SUM(f) AS BIGINT) AS top_mass,
           CAST(1000 * SUM(ABS(f - f1 // rn)) // SUM(f) AS BIGINT)
             AS zipf_dev_milli
    FROM top GROUP BY source
    """,
    doc=f"Zipf CONFORMANCE per source — the corpus-health check that flags "
    "template/boilerplate-dominated or synthetic-spam sources before "
    "training (natural language tracks freq(r) ≈ f1/r; machine-generated "
    f"and template text deviates hard): for the top {_ZIPF_RANKS} token "
    "ranks, the normalized L1 deviation from the ideal harmonic curve, "
    "Σ|f_r − f1∕r| / Σf_r in milli. ALL-INTEGER by construction — the "
    "ideal frequency is the truncating division f1//r, so no log-log "
    "regression (engine log() differs in the last ulp and is unhashable "
    "— the lm_score/pmi lesson) and the oracle replays every rank and "
    "deviation exactly. Execution: the one corpus-scale stage is the "
    "(source, token) frequency aggregate (map-side combining); ranking "
    "windows run per source over vocabulary-sized frames, and the final "
    f"reduce is {_ZIPF_RANKS} rows per source.",
)
def text_zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    tok = d.select("source", F.explode(tokens("text")).alias("t"))
    freq = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("f"))
    wr = W.partitionBy("source").orderBy(F.col("f").desc(), F.col("t"))
    ranked = freq.withColumn("rn", F.row_number().over(wr)).filter(
        F.col("rn") <= _ZIPF_RANKS
    )
    wf = W.partitionBy("source").orderBy("rn")
    top = ranked.withColumn("f1", F.first("f").over(wf))
    dev = F.abs(F.col("f") - F.call_function("div", F.col("f1"), F.col("rn")))
    return top.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_ranks"),
        F.max("f1").cast("long").alias("top1_freq"),
        F.sum("f").cast("long").alias("top_mass"),
        F.call_function(
            "div", F.lit(1000) * F.sum(dev), F.sum("f")
        ).cast("long").alias("zipf_dev_milli"),
    )


# --------------------------------------------------------------------------
# Corpus bigram language-model scoring (quality filtering by LM fit)
# --------------------------------------------------------------------------

_LM_SCALE = 1000  # per-bigram smoothed-probability ratio in milli-units


@query(
    "text_ngram_lm_score",
    oracle=f"""
    WITH tk AS (SELECT doc_id, STR_SPLIT(TRIM(LOWER(text)), ' ') AS w
                FROM documents),
    uni AS (SELECT t, COUNT(*) AS n
            FROM (SELECT UNNEST(w) AS t FROM tk) GROUP BY t),
    v AS (SELECT COUNT(*) AS nv FROM uni),
    bg AS (SELECT doc_id, w[i] AS w1, w[i] || ' ' || w[i+1] AS gram
           FROM (SELECT doc_id, w,
                        UNNEST(RANGE(1, GREATEST(LEN(w), 1))) AS i
                 FROM tk)),
    c12 AS (SELECT gram, COUNT(*) AS n FROM bg GROUP BY gram)
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM((c12.n + 1) * {_LM_SCALE} // (c1.n + v.nv)) AS BIGINT)
             AS lm_sum_milli,
           CAST(SUM((c12.n + 1) * {_LM_SCALE} // (c1.n + v.nv))
                // COUNT(*) AS BIGINT) AS lm_avg_milli
    FROM bg b
    JOIN c12 USING (gram)
    JOIN uni c1 ON c1.t = b.w1
    CROSS JOIN v
    GROUP BY b.doc_id
    """,
    doc=f"Corpus bigram language-model score per document — the quality "
    "signal pretraining pipelines use alongside the heuristic gates (CCNet/"
    "Gopher style: documents whose word transitions are atypical for the "
    "corpus score low — OCR noise, boilerplate, wrong-language residue). "
    "Model = add-one-smoothed bigram counts trained on the corpus itself "
    "(two map-side-combining aggregates); per-bigram fit = "
    f"(c12+1)·{_LM_SCALE} div (c1+V) in EXACT integer milli-units — no "
    "floating logs, so the oracle replays tokenization, both count tables, "
    "V, and every per-bigram ratio bit-for-bit (floats here are the "
    "classic cross-engine trap: ln() differs in the last ulp across libm "
    "builds). Per doc: bigram count, the milli-ratio sum, and the integer "
    "mean. Scale shape: the model tables are vocabulary-sized (grow "
    "sub-linearly — Heaps' law), the doc-side gram stream joins them on "
    "the gram keys (shuffle-hash on corpus-scale streams, the honest "
    "plan; broadcast only if the vocab fits), and V is one scalar inlined "
    "as a literal (bounded driver collect, the winnow n_docs pattern; the "
    "1-row CROSS JOIN stays oracle-side only — a 1-row join in Spark "
    "plans BroadcastNestedLoopJoin, the plan gate's forbidden class).",
)
def text_ngram_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    toks = fan_out(d).select("doc_id", tokens("text").alias("_w"))
    uni = toks.select(F.explode("_w").alias("t")).groupBy("t").agg(
        F.count(F.lit(1)).alias("c1")
    )
    nv = uni.count()  # scalar V (vocabulary size), inlined as a literal
    # bigram stream with w1 carried alongside (re-splitting the gram would
    # be wrong only for pathological tokens, but carrying it is free);
    # explicit >= 2 size guard — sequence() flips DESCENDING when the stop
    # is below the start (the shingles_of_tokens phantom-window trap)
    bg = (
        toks.filter(F.size("_w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_w) - 1), "
                    "i -> struct(_w[i-1] AS w1, "
                    "concat(_w[i-1], ' ', _w[i]) AS gram))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.gram")
    )
    c12 = bg.groupBy("gram").agg(F.count(F.lit(1)).alias("c12"))
    ratio = F.call_function(
        "div",
        (F.col("c12") + 1) * F.lit(_LM_SCALE),
        F.col("c1") + F.lit(nv),
    )
    return (
        bg.join(c12, "gram")
        .join(uni.withColumnRenamed("t", "w1"), "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(ratio).cast("long").alias("lm_sum_milli"),
            F.call_function(
                "div", F.sum(ratio), F.count(F.lit(1))
            ).cast("long").alias("lm_avg_milli"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic global shuffle into training shards
# --------------------------------------------------------------------------

_SHUF_SHARDS = 8

# 32-bit uniform doc hash both engines compute identically (the q107 idiom)
_SHUF_H_SPARK = (
    "conv(substring(md5(cast(cast(doc_id as string) as binary)), 1, 8), 16, 10)"
)
_SHUF_H_SQL = (
    "CAST(('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT"
    " AS BIGINT)"
)


@query(
    "text_shuffle_shards",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, {_SHUF_H_SQL} AS hv FROM documents
    ),
    s AS (
      SELECT doc_id, hv,
             hv * {_SHUF_SHARDS} // 4294967296 AS shard_id
      FROM h
    )
    SELECT doc_id,
           CAST(shard_id AS BIGINT) AS shard_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard_id
                                   ORDER BY hv, doc_id) AS BIGINT) AS pos
    FROM s
    """,
    doc=f"Deterministic global shuffle into {_SHUF_SHARDS} training shards — "
    "the data-ordering step between curation and tokenize/pack: every doc "
    "gets a content-independent pseudo-random position (md5 of its id) "
    "that is REPRODUCIBLE across reruns and resumes, unlike rand() — a "
    "re-executed task must shuffle identically or a resumed training run "
    "sees a different data order than its checkpoint assumed. Design: "
    "shard = equal slice of the 32-bit hash space (hash-RANGE sharding — "
    "no global sort, no single-partition rank; shard sizes concentrate "
    "at N/S by uniformity), position = per-shard window over (hash, id). "
    "At 100 TB each shard's window is an independent range partition and "
    "the whole op is one hash projection + one S-way partitioned sort — "
    "the same shape distributed training loaders shard by. Oracle replays "
    "hash, shard cut, and tie-broken position exactly (the q107 md5-prefix "
    "idiom).",
)
def text_shuffle_shards(spark: SparkSession, sf: str) -> DataFrame:
    d = _t(spark, sf, "documents")
    h = d.select("doc_id", F.expr(_SHUF_H_SPARK).cast("long").alias("hv"))
    s = h.withColumn(
        "shard_id",
        F.call_function(
            "div", F.col("hv") * F.lit(_SHUF_SHARDS), F.lit(4294967296)
        ),
    )
    w = W.partitionBy("shard_id").orderBy("hv", "doc_id")
    return s.select(
        "doc_id",
        F.col("shard_id").cast("long").alias("shard_id"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


# --------------------------------------------------------------------------
# Per-domain document cap (FineWeb-style source balancing)
# --------------------------------------------------------------------------

_CAP_N = 12  # absolute keep-budget per source domain
_CAP_SALTS = 64  # first-level prune fan; bounds the per-source final window


@query(
    "text_domain_cap",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source, lang, {_SHUF_H_SQL} AS hv FROM documents
    ),
    r AS (
      SELECT doc_id, source, lang, hv,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rn
      FROM h
    )
    SELECT doc_id, source, lang, CAST(rn AS BIGINT) AS rank
    FROM r WHERE rn <= {_CAP_N}
    """,
    doc=f"Per-domain document cap: keep at most {_CAP_N} documents per source, "
    "chosen as the bottom-N by a deterministic md5 doc-hash — the absolute "
    "per-domain budget of CommonCrawl-style curation (cap any one domain "
    "so no single site dominates the mixture), where "
    "text_stratified_sample is its RATE-based sibling. Bottom-N-by-stable-"
    "hash makes the kept set a uniform sample of the domain that is "
    "reproducible across runs, engines, partitionings and re-ingestions — "
    "and MONOTONE under corpus growth (new docs evict only hash-larger "
    "docs, never reshuffle the whole selection). Scale shape: the same "
    f"two-level bottom-k as the KMV sketches — a {_CAP_SALTS}-salt partial "
    "top-N per (source, salt) prunes the corpus to <= salts*N rows per "
    "source BEFORE the per-source final window, so a hot domain with 10^9 "
    "docs never funnels through one reducer; both windows are "
    "key-partitioned (never single-partition) and the final window's input "
    "is bounded at salts*N rows per source by construction.",
)
def text_domain_cap(spark: SparkSession, sf: str) -> DataFrame:
    from librarian_spark.operators.relational import two_level_bottom_k

    d = _t(spark, sf, "documents")
    h = d.select(
        "doc_id", "source", "lang", F.expr(_SHUF_H_SPARK).cast("long").alias("hv")
    )
    return two_level_bottom_k(
        h, ["source"], _CAP_N, _CAP_SALTS, ("hv", "doc_id"), keep_rank=True
    ).select("doc_id", "source", "lang", F.col("rn").cast("long").alias("rank"))
