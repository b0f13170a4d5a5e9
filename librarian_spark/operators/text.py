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

from librarian_spark.functions.textfns import (
    FP_MOD,
    STOPWORDS,
    fingerprint,
    o_fingerprint,
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


@query(
    "text_chunk",
    oracle=f"""
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
    """,
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
    bigrams = F.expr(
        "transform(sequence(1, size(_w) - 1), "
        "i -> concat(element_at(_w, i), ' ', element_at(_w, i + 1)))"
    )
    return (
        d.select(w.alias("_w"))
        .select(F.explode(bigrams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= _VOCAB_MIN_COUNT)
    )
