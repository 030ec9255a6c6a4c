"""BM25 top-k retrieval over the corpus: the query side of the
inverted index (postings.py builds the index; this ranks with it).

Score per (query q, doc d), the Robertson/Okapi shape with k1=1.2,
b=0.75:

    sum over shared terms t of
      idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

with one deliberate deviation: idf is the RATIONAL rarity ratio
(N - df + 0.5) / (df + 0.5), not its log. `ln` is the one operator in
the formula that is not correctly rounded identically across engines
(java.lang.Math.log and libm disagree in the last ulp), and this repo's
oracle discipline is bit-exactness, so the log stays out of the oracle
path (the monotone log compresses idf spread but never reorders a
single-term query; multi-term rankings shift only where a rare term's
linear weight out-votes the log's damping — the trade is documented, not
hidden). Everything else is exact: tf/df/dl/N/total_len are exact
BIGINTs, every per-term partial is a fixed tree of correctly-rounded
IEEE +,-,*,/ on exact-integer-valued doubles (the sim_lsh rank-exactness
rule), and the per-doc sum folds the partials in term order via
F.aggregate / list_reduce, so Spark and DuckDB produce bit-identical
scores and therefore identical ranks.

Plan shape at scale (N docs, Q tiny literal query set):
  1. explode -> tf groupBy(doc, w): ONE corpus shuffle (shared with
     keywords.py's shape).
  2. dl and df both derive from tf (reuse its exchange); df is then
     semi-joined to the query terms -> broadcast-tiny.
  3. candidate set = tf x query terms (broadcast hash join, map-side),
     then ONE equi-join with dl on doc_id (the only other corpus-sized
     shuffle; AQE broadcasts it at small SF).
  4. per-query top-k via row_number over (score DESC, doc_id) — the
     window partitions by qid, |Q| partitions, each bounded by the
     candidate doc count, not the corpus.

Reference tie-in: posting lists themselves ride the DELTA_BINARY_PACKED
family (postings.py); this operator is the consumer that makes those
lists worth storing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Literal query set for the driver query — terms from the synth corpus
# vocabulary. Kept in lockstep with TEXT_BM25_ORACLE's VALUES list (the
# mm-oracle contract: change one, change both).
QUERY_SET: list[tuple[str, str]] = [
    ("q1", "spark join merge"),
    ("q2", "filter scan table"),
    ("q3", "window hash sort batch"),
    ("q4", "vector customer order"),
]

TOPK = 10


def bm25_topk(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[str, str]],
    k: int = TOPK,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, text) x [(qid, query string)] -> top-k
    (qid, doc_id, rank, score) per query by rational-idf BM25."""
    qterms = spark.createDataFrame(
        sorted({(qid, w) for qid, qs in queries for w in qs.split(" ")}),
        "qid string, w string",
    )
    words = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.split(text_col, " ")).alias("w"),
    )
    # tf is the one corpus-wide shuffle and feeds FOUR consumers (dl,
    # df, totals, candidates); localCheckpoint materializes it once so
    # the corpus is exploded and aggregated exactly once, not four times
    tf = (
        words.groupBy("doc_id", "w")
        .agg(F.count("*").cast("long").alias("tf"))
        .localCheckpoint()
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    # df only for the query's terms: semi-join first so the broadcast
    # below ships |query vocabulary| rows, never the corpus vocabulary
    df_ = (
        tf.join(F.broadcast(qterms.select("w").distinct()), "w", "left_semi")
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("df"))
    )
    totals = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    cand = (
        tf.join(F.broadcast(qterms), "w")
        .join(F.broadcast(df_), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
    )
    tf_d = F.col("tf").cast("double")
    idf = (2 * (F.col("n_docs") - F.col("df")) + 1).cast("double") / (
        2 * F.col("df") + 1
    ).cast("double")
    lenr = (F.col("dl") * F.col("n_docs")).cast("double") / F.col(
        "total_len"
    ).cast("double")
    norm = tf_d + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * lenr)
    part = idf * (tf_d * F.lit(2.2)) / norm
    scores = (
        cand.select("qid", "doc_id", "w", part.alias("p"))
        .groupBy("qid", "doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("w", "p"))),
                F.lit(0.0),
                lambda acc, x: acc + x["p"],
            ).alias("score")
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "doc_id", F.col("rank").cast("int").alias("rank"),
                "score")
    )


# -------------------------------------------------------------- driver query

def text_bm25_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return bm25_topk(spark, docs.select("doc_id", "text"), QUERY_SET)


def _qterms_values() -> str:
    rows = sorted({(qid, w) for qid, qs in QUERY_SET for w in qs.split(" ")})
    return ", ".join(f"('{qid}', '{w}')" for qid, w in rows)


TEXT_BM25_ORACLE = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
  FROM words GROUP BY doc_id, w
),
dl AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS total_len
  FROM dl
),
qt (qid, w) AS (VALUES {_qterms_values()}),
df_ AS (
  SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf
  WHERE w IN (SELECT DISTINCT w FROM qt) GROUP BY w
),
part AS (
  SELECT qt.qid, tf.doc_id, tf.w,
         (CAST(2 * (tot.n_docs - df_.df) + 1 AS DOUBLE)
          / CAST(2 * df_.df + 1 AS DOUBLE))
         * (CAST(tf.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
         / (CAST(tf.tf AS DOUBLE)
            + CAST(1.2 AS DOUBLE)
              * (CAST(0.25 AS DOUBLE)
                 + CAST(0.75 AS DOUBLE)
                   * (CAST(dl.dl * tot.n_docs AS DOUBLE)
                      / CAST(tot.total_len AS DOUBLE)))) AS p
  FROM tf
  JOIN qt USING (w)
  JOIN df_ USING (w)
  JOIN dl USING (doc_id)
  CROSS JOIN tot
),
scores AS (
  SELECT qid, doc_id,
         list_reduce(list(p ORDER BY w), (a, b) -> a + b) AS score
  FROM part GROUP BY qid, doc_id
),
ranked AS (
  SELECT qid, doc_id, score,
         row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, doc_id ASC
         ) AS rank
  FROM scores
)
SELECT qid, doc_id, CAST(rank AS INT) AS rank, score
FROM ranked WHERE rank <= {TOPK}
"""
