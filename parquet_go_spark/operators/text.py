"""Text-analysis operators over `documents`: token counting, quality
scoring, language signal, document fingerprinting.

All four are expressed as portable relational algebra (identical semantics
in Spark SQL and the DuckDB oracle): length/replace arithmetic and
posexplode/unnest folds — fully codegen'd, no UDFs, map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_DOCS = "SELECT * FROM parquet.`{sf}/documents.parquet`"


def _run(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents_v"
    )
    return spark.sql(sql)


# ---------------------------------------------------------------- counts

TOKEN_COUNT_SPARK = """
SELECT doc_id,
       CAST(size(split(text, ' ')) AS BIGINT) AS n_words,
       CAST(length(text) AS BIGINT) AS n_chars_m
FROM documents_v
"""

TOKEN_COUNT_ORACLE = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       CAST(length(text) AS BIGINT) AS n_chars_m
FROM documents
"""


def token_count_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, TOKEN_COUNT_SPARK)


# ------------------------------------------------------------- BPE-ish count

# GPT-2-flavored pre-tokenizer classes, restricted to constructs with
# identical semantics in Java regex (Spark) and RE2 (DuckDB): a token is an
# optional leading space + a letter run, digit run, or punctuation run.
_BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

BPE_COUNT_SPARK = f"""
SELECT doc_id,
       CAST(size(regexp_extract_all(text, '{_BPE_PATTERN}', 0)) AS BIGINT)
         AS n_bpe_tokens
FROM documents_v
"""

BPE_COUNT_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT)
         AS n_bpe_tokens
FROM documents
"""


def bpe_count_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, BPE_COUNT_SPARK)


# ---------------------------------------------------------------- quality

_QUALITY_CORE = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_m,
       CAST({nw} AS BIGINT) AS n_words,
       CAST(round((length(text) - length(replace(text, ' ', ''))) * 1.0
             / length(text), 4) AS DOUBLE) AS space_ratio,
       CAST(round(length(replace(text, ' ', '')) * 1.0 / {nw}, 4) AS DOUBLE)
         AS avg_word_len,
       CAST(round((length(text) - length(replace(text, ' the ', ' ')))
             / 5.0, 0) AS BIGINT) AS the_count
FROM {tbl}
"""

QUALITY_SPARK = _QUALITY_CORE.format(
    nw="size(split(text, ' '))", tbl="documents_v"
)
QUALITY_ORACLE = _QUALITY_CORE.format(
    nw="len(string_split(text, ' '))", tbl="documents"
)


def quality_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, QUALITY_SPARK)


# ---------------------------------------------------------------- lang

_LANG_CORE = """
SELECT doc_id, lang,
       CAST((length(padded) - length(replace(padded, ' the ', ''))) / 5
            AS BIGINT) AS en_signal,
       CAST((length(padded) - length(replace(padded, ' data ', ''))) / 6
            AS BIGINT) AS data_signal,
       CAST((length(padded) - length(replace(padded, ' join ', ''))) / 6
            AS BIGINT) AS join_signal
FROM (SELECT doc_id, lang, ' ' || text || ' ' AS padded FROM {tbl}) t
"""

LANG_SIGNAL_SPARK = _LANG_CORE.format(tbl="documents_v")
LANG_SIGNAL_ORACLE = _LANG_CORE.format(tbl="documents")


def lang_signal_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, LANG_SIGNAL_SPARK)


# ---------------------------------------------------------------- fingerprint

FINGERPRINT_SPARK = """
SELECT doc_id,
       CAST(sum((pos + 1) * (length(w) * 131 + ascii(substring(w, 1, 1))))
            % 1000000007 AS BIGINT) AS fp
FROM (
  SELECT doc_id, posexplode(split(text, ' ')) AS (pos, w) FROM documents_v
)
GROUP BY doc_id
"""

FINGERPRINT_ORACLE = """
SELECT doc_id,
       CAST(sum(ord * (length(w) * 131 + ascii(substr(w, 1, 1))))
            % 1000000007 AS BIGINT) AS fp
FROM (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
  FROM documents
) t
GROUP BY doc_id
"""


def fingerprint_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, FINGERPRINT_SPARK)


# ------------------------------------------------------- bigram LM quality

# Corpus-trained bigram language-model score (the KenLM-style quality
# filter of LLM data pipelines, count-based): train word-bigram and
# unigram counts over the WHOLE corpus, then score each document by its
# average bigram conditional frequency. Everything stays exact-integer
# until one correctly-rounded IEEE double division per output value
# (sum ratios and an order-insensitive MIN of per-bigram ratios), so
# Spark and DuckDB agree bit-for-bit — no log-sum whose float summation
# order could drift between engines.
#
# Plan shape (pinned in PLANS.md): two map-side-combinable count
# shuffles (bigram, unigram vocab), two equi-joins of the exploded doc
# bigrams against them, one final per-doc hash agg. At 100 TB the skew
# keys are stopword bigrams — AQE skew-join splits them, or broadcast
# the top-K hot entries; the vocab tables are corpus-scale, never
# driver-collected.

# Spark's arrays_zip yields struct fields named "0"/"1"; project them
# out of the exploded struct
BIGRAM_LM_SPARK = """
WITH ws AS (
  SELECT doc_id, split(text, ' ') AS w FROM documents_v
),
bg AS (
  SELECT doc_id, z['0'] AS w1, z['1'] AS b FROM (
    SELECT doc_id,
           explode(arrays_zip(
             slice(w, 1, size(w) - 1),
             transform(sequence(1, size(w) - 1),
                       i -> concat(element_at(w, i), ' ',
                                   element_at(w, i + 1)))
           )) AS z
    FROM ws WHERE size(w) > 1
  )
),
bgc AS (SELECT b, count(*) AS cb FROM bg GROUP BY b),
unc AS (
  SELECT u, count(*) AS cu
  FROM (SELECT explode(w) AS u FROM ws) GROUP BY u
)
SELECT bg.doc_id,
       CAST(count(*) AS BIGINT) AS n_bg,
       CAST(sum(cb) AS BIGINT) AS sum_cb,
       CAST(sum(cu) AS BIGINT) AS sum_cu,
       CAST(sum(cb) AS DOUBLE) / CAST(sum(cu) AS DOUBLE) AS lm_score,
       min(CAST(cb AS DOUBLE) / CAST(cu AS DOUBLE)) AS min_cond
FROM bg
JOIN bgc ON bg.b = bgc.b
JOIN unc ON bg.w1 = unc.u
GROUP BY bg.doc_id
"""

BIGRAM_LM_ORACLE = """
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(w[1:len(w) - 1]) AS w1,
         unnest(list_transform(range(2, len(w) + 1),
                               i -> w[i - 1] || ' ' || w[i])) AS b
  FROM ws WHERE len(w) > 1
),
bgc AS (SELECT b, count(*) AS cb FROM bg GROUP BY b),
unc AS (
  SELECT u, count(*) AS cu
  FROM (SELECT unnest(w) AS u FROM ws) GROUP BY u
)
SELECT bg.doc_id,
       CAST(count(*) AS BIGINT) AS n_bg,
       CAST(sum(cb) AS BIGINT) AS sum_cb,
       CAST(sum(cu) AS BIGINT) AS sum_cu,
       CAST(CAST(sum(cb) AS BIGINT) AS DOUBLE)
         / CAST(CAST(sum(cu) AS BIGINT) AS DOUBLE) AS lm_score,
       min(CAST(cb AS DOUBLE) / CAST(cu AS DOUBLE)) AS min_cond
FROM bg
JOIN bgc ON bg.b = bgc.b
JOIN unc ON bg.w1 = unc.u
GROUP BY bg.doc_id
"""


def bigram_lm_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, BIGRAM_LM_SPARK)
