"""Corpus-hygiene operators over `documents`: eval-set decontamination,
PII scrubbing, and the Gopher-style duplicate-n-gram quality signal.

Training-data pipeline components (the reference is a storage library;
these are the hygiene passes a 10^12-sequence corpus runs between raw
ingest and the encode job):

  * decontam_overlap — n-gram overlap of every train document against a
    (small) held-out eval set: the standard benchmark-contamination
    check. Eval shingles are DISTINCT + broadcast, so the train corpus is
    never shuffled; the only exchange is the per-doc count fold.
  * pii_scrub        — deterministic regex redaction (email / IPv4 /
    phone) with per-class counts and a digest of the scrubbed text.
    Map-only projection, JVM codegen, no shuffle at all.
  * text_dup_ngram   — fraction of a document's 2-gram occurrences that
    are intra-document repeats (Gopher repetition-quality rule family).
    One explode + two map-side-combinable aggregates on the same key
    prefix (doc_id, gram) -> (doc_id), so AQE coalesces the second
    exchange over already-local data.

Every decision is engine-portable (md5 hashes, bracket-only regexes with
no backslash escapes, integer thresholds precomputed in Python), so all
three are exactly oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import curation as _cur
from .dedup import _docs, _fan_out

# ------------------------------------------------------------- decontam

DECON_SEED = "decon-42"
EVAL_RATE = 0.03  # ~3% of docs form the held-out eval set
EVAL_THR = _cur._thr(EVAL_RATE)


def _sh3(df: DataFrame) -> DataFrame:
    """doc_id -> exploded DISTINCT 3-word shingles with the per-doc count.

    Same materialize-once discipline as dedup._shingles (w bound once per
    row; shingle array built inside ONE generator expression) — see the
    measured pitfalls documented there."""
    sh = F.expr(
        "transform(sequence(0, size(w) - 3),"
        " i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
    )
    return (
        df.select("doc_id", F.split(F.col("text"), " ").alias("w"))
        .filter(F.size("w") >= 3)
        .select("doc_id", F.array_distinct(sh).alias("shingles"))
        .select("doc_id", F.explode(F.expr(
            "transform(shingles, x -> struct(size(shingles) AS m, x AS sh))"
        )).alias("e"))
        .select("doc_id", F.col("e.m").alias("m"), F.col("e.sh").alias("sh"))
    )


def decontam_overlap(df: DataFrame, seed: str = DECON_SEED,
                     eval_thr: int = EVAL_THR) -> DataFrame:
    """3-gram contamination of train docs against the held-out eval set.

    The eval set is carved from the corpus by the same 60-bit md5
    membership rule the curation operators use (deterministic, engine-
    portable). Plan: the eval side reduces to DISTINCT shingles — a few
    thousand strings for any realistically-sized benchmark suite — and
    ships as a broadcast, so the train corpus takes NO join shuffle; the
    one exchange is the groupBy(doc_id) count fold over matched rows
    only. At 100 TB the eval set is still benchmark-sized (matching the
    real-world shape: you decontaminate against MMLU/GSM8K/... which are
    tiny), so the broadcast holds by construction."""
    h = _cur._h60(seed)
    docs = _fan_out(df, "doc_id").withColumn("is_eval", h < F.lit(eval_thr))
    eval_sh = _sh3(docs.filter("is_eval")).select("sh").distinct()
    train_sh = _sh3(docs.filter("NOT is_eval"))
    return (
        train_sh.join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(F.max("m").alias("m"), F.count(F.lit(1)).alias("n_shared"))
        .select(
            "doc_id",
            F.col("m").cast("bigint").alias("n_shingles"),
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.round(F.col("n_shared") / F.col("m"), 4)
            .cast("double").alias("overlap_ratio"),
        )
    )


def decontam_overlap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decontam_overlap(_docs(spark, sf_dir))


DECONTAM_ORACLE = f"""
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         {_cur._h60_duck(DECON_SEED)} < {EVAL_THR} AS is_eval
  FROM documents
), sh_list AS (
  SELECT doc_id, is_eval,
         list_distinct(list_transform(range(1, len(w) - 1),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
  FROM ws WHERE len(w) >= 3
), sh AS (
  SELECT doc_id, is_eval, len(shingles) AS m, unnest(shingles) AS sh
  FROM sh_list
), eval_sh AS (
  SELECT DISTINCT sh FROM sh WHERE is_eval
)
SELECT t.doc_id,
       CAST(max(t.m) AS BIGINT) AS n_shingles,
       CAST(count(*) AS BIGINT) AS n_shared,
       CAST(round(count(*) / max(t.m), 4) AS DOUBLE) AS overlap_ratio
FROM sh t JOIN eval_sh e ON t.sh = e.sh
WHERE NOT t.is_eval
GROUP BY t.doc_id
"""


# ------------------------------------------------------------- pii scrub

# Bracket-only character classes — no backslash escapes, so the literal
# pattern text is byte-identical under Spark SQL (Java regex) and DuckDB
# (RE2) string-literal rules.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
IP_RE = "[0-9][0-9]?[0-9]?([.][0-9][0-9]?[0-9]?)([.][0-9][0-9]?[0-9]?)([.][0-9][0-9]?[0-9]?)"
PHONE_RE = "555-[0-9][0-9][0-9][0-9]"

# The synthetic corpus contains no PII, so the operator injects a
# deterministic specimen per row (email + IPv4 + phone derived from
# doc_id) and then scrubs it: the oracle match proves injection,
# per-class counting, redaction order (email first — its local part
# would otherwise be chewed up by the IP rule), and the final digest all
# agree bit-for-bit across engines.
_PII_CORE = """
WITH inj AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS STRING)
              || '@example.com at 10.0.'
              || CAST(doc_id %% 256 AS STRING) || '.'
              || CAST(doc_id %% 100 AS STRING)
              || ' call 555-' || lpad(CAST(doc_id %% 10000 AS STRING), 4, '0')
           AS s
  FROM %(tbl)s
), s1 AS (
  SELECT doc_id, s, regexp_replace(s, '%(email)s', '<EMAIL>'%(g)s) AS t1
  FROM inj
), s2 AS (
  SELECT doc_id, s, t1, regexp_replace(t1, '%(ip)s', '<IP>'%(g)s) AS t2
  FROM s1
), s3 AS (
  SELECT doc_id, s, t1, t2,
         regexp_replace(t2, '%(phone)s', '<PHONE>'%(g)s) AS t3
  FROM s2
)
SELECT doc_id,
       CAST(%(len)s(regexp_extract_all(s,  '%(email)s'%(z)s)) AS BIGINT) AS n_email,
       CAST(%(len)s(regexp_extract_all(t1, '%(ip)s'%(z)s))    AS BIGINT) AS n_ip,
       CAST(%(len)s(regexp_extract_all(t2, '%(phone)s'%(z)s)) AS BIGINT) AS n_phone,
       md5(t3) AS scrub_digest
FROM s3
"""

PII_SCRUB_SPARK = _PII_CORE % {
    "tbl": "documents_v", "email": EMAIL_RE, "ip": IP_RE, "phone": PHONE_RE,
    "g": "", "len": "size", "z": ", 0",
}
PII_SCRUB_ORACLE = _PII_CORE % {
    "tbl": "documents", "email": EMAIL_RE, "ip": IP_RE, "phone": PHONE_RE,
    "g": ", 'g'", "len": "len", "z": "",
}


def pii_scrub_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only redaction projection: regexp_replace/extract_all are JVM
    codegen; zero shuffles; scales embarrassingly."""
    _docs(spark, sf_dir).createOrReplaceTempView("documents_v")
    return spark.sql(PII_SCRUB_SPARK)


# --------------------------------------------------------- dup 2-grams

DUP_NGRAM_SPARK = """
WITH g AS (
  SELECT doc_id,
         explode(transform(sequence(0, size(w) - 2),
                 i -> concat_ws(' ', w[i], w[i+1]))) AS gram
  FROM (SELECT doc_id, split(text, ' ') AS w FROM documents_v)
  WHERE size(w) >= 2
), c AS (
  SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram
)
SELECT doc_id,
       CAST(sum(cnt) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(round(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) * 1.0
                  / sum(cnt), 4) AS DOUBLE) AS dup_ratio
FROM c GROUP BY doc_id
"""

DUP_NGRAM_ORACLE = """
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                i -> w[i] || ' ' || w[i+1])) AS gram
  FROM ws WHERE len(w) >= 2
), c AS (
  SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram
)
SELECT doc_id,
       CAST(sum(cnt) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(round(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) * 1.0
                  / sum(cnt), 4) AS DOUBLE) AS dup_ratio
FROM c GROUP BY doc_id
"""


def dup_ngram_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicate-2-gram fraction (Gopher repetition rules): the
    (doc_id, gram) pre-aggregate is map-side combinable and the second
    fold shares the doc_id key prefix, so the heavy exploded stream is
    reduced before it ever crosses the wire."""
    _docs(spark, sf_dir).createOrReplaceTempView("documents_v")
    return spark.sql(DUP_NGRAM_SPARK)
