"""Vocabulary training + tokenization: the missing front of the
training-data pipeline — turn a text corpus into the engine's
`tokens array<int>` table with a vocab LEARNED from the corpus
(frequency-ranked word ids, the unigram baseline every BPE starts
from), then prove the encode layer reproduces the learned tokens
bit-identically.

Vocab id assignment is a global rank over (count DESC, word ASC) —
computed WITHOUT a single-partition sort: range-partition the distinct
words by the rank key, per-partition row numbers, per-partition totals
broadcast back as base offsets (the same distributed prefix sum as
pack_sequences / exact_quantiles). The vocab table is |distinct words|,
metadata-scale next to the corpus; the tokenize join is one shuffle of
(doc, pos, word) against it (broadcast when the vocab fits).

Rebuilding each document's token array is the one ordering hazard:
collect_list is NOT order-stable across shuffles, so the array is
array_sort(collect_list(struct(pos, id))) projected to ids — pinned by
the oracle's `list(id ORDER BY pos)`.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_VPARTS = 32


def train_vocab(spark: SparkSession, words: DataFrame) -> DataFrame:
    """(w) -> (w, id): 1-based frequency-ranked ids, ties broken by the
    word itself (deterministic across engines and runs)."""
    counts = words.groupBy("w").count().withColumnRenamed("count", "cnt")
    pc = (
        counts.repartitionByRange(
            _VPARTS, F.col("cnt").desc(), F.col("w").asc()
        )
        .withColumn("pid", F.spark_partition_id())
        # pin partition assignment: a lazy recompute of
        # repartitionByRange resamples boundaries under the collected
        # base offsets (same discipline as pack_sequences)
        .localCheckpoint()
    )
    from ..plans.prefix import base_offsets

    base_df = base_offsets(spark, pc)
    w = Window.partitionBy("pid").orderBy(
        F.col("cnt").desc(), F.col("w").asc()
    )
    return (
        pc.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(base_df), "pid")
        .select("w", (F.col("base") + F.col("rn")).alias("id"))
    )


def tokenize(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, tokens array<long>) under a vocab
    trained on the same corpus."""
    words = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    vocab = train_vocab(spark, words.select("w"))
    return (
        words.join(vocab, "w")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "id"))),
                lambda s: s["id"],
            ).alias("tokens")
        )
    )


# -------------------------------------------------------------- driver queries

def _digest(tok: DataFrame) -> DataFrame:
    return tok.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tok"),
        F.element_at("tokens", 1).alias("first_id"),
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("sum_id"),
        F.md5(F.to_json(F.col("tokens").cast("array<long>")))
        .alias("tok_digest"),
    )


def text_tokenize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return _digest(tokenize(spark, docs.select("doc_id", "text")))


def tokenize_encode_roundtrip_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Composition: learned tokens -> encode_table -> pgs store ->
    decode_table -> the same digest. Green only if the engine
    reproduced the LEARNED token arrays bit-identically (north-rule
    roundtrip on trained, not synthetic, tokens)."""
    from .decode_job import decode_table
    from .encode_job import encode_table

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    tok = tokenize(spark, docs.select("doc_id", "text")).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("tokens").cast("array<int>").alias("tokens"),
        F.size("tokens").alias("n_tok"),
        F.lit("tokenized").alias("source"),
    )
    out = os.path.join("/tmp", f"pgs_tok_{os.path.basename(sf_dir)}")
    shutil.rmtree(out, ignore_errors=True)
    encode_table(spark, tok, out, target_tokens=200_000, resume=False)
    dec = decode_table(
        spark, out, ["doc_id", "tokens"],
        "doc_id string, tokens array<int>",
    )
    return _digest(
        dec.select(F.col("doc_id").cast("long").alias("doc_id"), "tokens")
    )


_VOCAB_CTE = """
WITH words AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
  FROM documents
),
vocab AS (
  SELECT w,
         CAST(row_number() OVER (ORDER BY cnt DESC, w ASC) AS BIGINT)
           AS id
  FROM (SELECT w, count(*) AS cnt FROM words GROUP BY w)
),
tok AS (
  SELECT doc_id, list(id ORDER BY pos) AS tokens
  FROM words JOIN vocab USING (w)
  GROUP BY doc_id
)
"""

TEXT_TOKENIZE_ORACLE = _VOCAB_CTE + """
SELECT doc_id,
       CAST(len(tokens) AS BIGINT) AS n_tok,
       tokens[1] AS first_id,
       CAST(list_sum(tokens) AS BIGINT) AS sum_id,
       md5(to_json(tokens)) AS tok_digest
FROM tok
"""

TOKENIZE_ENCODE_ROUNDTRIP_ORACLE = TEXT_TOKENIZE_ORACLE
