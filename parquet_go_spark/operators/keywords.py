"""Keyword extraction: top-k terms per document by tf/idf ratio.

The topic-signature operator a curation pipeline runs before clustering
or mixing: which words characterize THIS document against the corpus.
Score = tf / df (term count in the doc over corpus document frequency —
the log-free tf-idf core; per-document top-k is invariant to the
monotone log anyway).

Cross-engine exactness (the repo's oracle rule): tf and df are exact
integers; the score is ONE correctly-rounded IEEE division per (doc,
term); ranking orders by (score DESC, w ASC) so rationals that collide
as doubles break ties identically in Spark and DuckDB. No double is
ever summed.

Plan: explode ONCE; tf from groupBy(doc, w); df derived from tf itself
(df(w) = number of tf rows per w — the distinct (doc, w) pairs already
exist post-aggregate), so the exploded pair stream crosses exactly one
shuffle and the df aggregate reuses tf's exchange. One row_number
window per doc on the joined result.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def extract_keywords(
    spark: SparkSession,
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, text) -> top-k (doc_id, w, tf, df, score, rank)."""
    words = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.split(text_col, " ")).alias("w"),
    )
    tf = words.groupBy("doc_id", "w").agg(
        F.count("*").cast("long").alias("tf")
    )
    # df(w) = count of tf rows per w: the tf aggregate already holds the
    # distinct (doc, w) pairs, so no second explode/distinct shuffle
    df_ = tf.groupBy("w").agg(F.count("*").cast("long").alias("df"))
    scored = tf.join(df_, "w").select(
        "doc_id", "w", "tf", "df",
        (F.col("tf").cast("double") / F.col("df").cast("double"))
        .alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("w").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# -------------------------------------------------------------- driver query

def text_keywords_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return extract_keywords(spark, docs.select("doc_id", "text"), k=5)


TEXT_KEYWORDS_ORACLE = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
  FROM words GROUP BY doc_id, w
),
df_ AS (
  SELECT w, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, w FROM words) GROUP BY w
),
scored AS (
  SELECT doc_id, w, tf, df,
         CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS score
  FROM tf JOIN df_ USING (w)
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, w ASC
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT doc_id, w, tf, df, score, rank FROM ranked WHERE rank <= 5
"""
