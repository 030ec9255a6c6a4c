"""DSIR-style importance-weighted data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"):
score every raw-pool document by how target-like its hashed-feature
distribution is, keep the top-k.

Shape of the public method, adapted to this repo's oracle discipline:

  - features = hashed word buckets (B = 512, the DSIR hashed-ngram
    trick), bucket = md5-based 60-bit hash mod B — the same md5 idiom
    the curation operators share with DuckDB;
  - per-bucket importance ratio = add-1-smoothed p_target / p_raw.
    The published method scores log p_t - log p_r summed over
    features; `ln` is the one non-correctly-rounded operator across
    engines, so the oracle-checked score here is the ARITHMETIC mean
    of the per-occurrence ratios instead of the geometric (log) mean —
    same inputs, same monotone direction per bucket, log-free. Each
    ratio is ONE IEEE division of two exact BIGINT products
    ((cnt_t+1)(total_r+B)) / ((total_t+B)(cnt_r+1)), and the per-doc
    sum folds in position order (F.aggregate / list_reduce), so Spark
    and DuckDB agree bit-for-bit. (Products stay far under 2^53 at
    gate scale; at 10^12-token scale the ratios remain plain IEEE —
    ranking quality is unaffected, only the oracle needs exactness.)
  - the target set is carved from the corpus itself by the curation
    hash rule (h60 < 1/5 of the hash space) so the query is
    self-contained and deterministic at any SF.

Plan shape at scale: the bucket-ratio table is B rows (broadcast); the
target carve is a map-side filter; scoring the raw pool is one
broadcast join + ONE groupBy(doc_id) shuffle; top-k is a single
row_number window over the scored docs ordered by (mean DESC, doc_id).
No driver participation, no all-pairs anything.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

B = 512
TOPK = 50
# 2^60 // 5: target carve threshold (h60 uniform on [0, 2^60))
_TARGET_THR = (1 << 60) // 5
_SEED_T = "dsir-target"
_SEED_F = "dsir-feat"


def _h60_doc(seed: str):
    return F.expr(
        f"CAST(conv(substring(md5(concat('{seed}|', "
        f"CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )


def _bucket(col):
    return F.expr(
        f"CAST(conv(substring(md5(concat('{_SEED_F}|', {col})), 1, 15), "
        f"16, 10) AS BIGINT) % {B}"
    )


def dsir_select(
    spark: SparkSession,
    docs: DataFrame,
    k: int = TOPK,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, text) -> top-k (doc_id, dl, score, mean_ratio, rank)
    raw-pool docs by target-likeness under hashed-bucket importance
    ratios. The target set is the h60 < 2^60/5 carve of the corpus."""
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
        (_h60_doc(_SEED_T) < F.lit(_TARGET_THR)).alias("is_t"),
    )
    words = base.select(
        "doc_id", "is_t", F.posexplode(F.split("text", " ")).alias("pos", "w")
    ).select("doc_id", "is_t", "pos", _bucket("w").alias("b"))

    # ONE aggregation pass over the exploded corpus; tstats / rstats /
    # totals all derive from the resulting 2B-row bucket table (tiny —
    # localCheckpoint so its three consumers don't re-scan the corpus)
    stats = (
        words.groupBy("is_t", "b")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint()
    )
    tstats = stats.filter("is_t").select("b", F.col("cnt").alias("cnt_t"))
    rstats = stats.filter(~F.col("is_t")).select(
        "b", F.col("cnt").alias("cnt_r")
    )
    rwords = words.filter(~F.col("is_t"))
    totals = stats.groupBy().agg(
        F.sum(F.when(F.col("is_t"), F.col("cnt")).otherwise(0))
        .cast("long").alias("total_t"),
        F.sum(F.when(~F.col("is_t"), F.col("cnt")).otherwise(0))
        .cast("long").alias("total_r"),
    )
    ratios = (
        rstats.join(tstats, "b", "left")
        .na.fill({"cnt_t": 0})
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                ((F.col("cnt_t") + 1) * (F.col("total_r") + B))
                .cast("double")
                / ((F.col("total_t") + B) * (F.col("cnt_r") + 1))
                .cast("double")
            ).alias("ratio"),
        )
    )
    scored = (
        rwords.join(F.broadcast(ratios), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("dl"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("pos", "ratio"))),
                F.lit(0.0),
                lambda a, x: a + x["ratio"],
            ).alias("score"),
        )
        .select(
            "doc_id", "dl", "score",
            (F.col("score") / F.col("dl").cast("double")).alias("mean_ratio"),
        )
    )
    w = Window.orderBy(F.col("mean_ratio").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "dl", "score", "mean_ratio",
                F.col("rank").cast("int").alias("rank"))
    )


# -------------------------------------------------------------- driver query

def curate_dsir_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return dsir_select(spark, docs.select("doc_id", "text"))


CURATE_DSIR_ORACLE = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, text,
         CAST('0x' || substr(md5('{_SEED_T}|' || CAST(doc_id AS VARCHAR)),
              1, 15) AS BIGINT) < {_TARGET_THR} AS is_t
  FROM documents
),
words AS MATERIALIZED (
  SELECT doc_id, is_t,
         unnest(range(1, len(string_split(text, ' ')) + 1)) - 1 AS pos,
         CAST('0x' || substr(md5('{_SEED_F}|' ||
              unnest(string_split(text, ' '))), 1, 15) AS BIGINT)
           % {B} AS b
  FROM base
),
tstats AS (
  SELECT b, CAST(count(*) AS BIGINT) AS cnt_t FROM words
  WHERE is_t GROUP BY b
),
rstats AS (
  SELECT b, CAST(count(*) AS BIGINT) AS cnt_r FROM words
  WHERE NOT is_t GROUP BY b
),
tot AS (
  SELECT CAST(count(*) FILTER (is_t) AS BIGINT) AS total_t,
         CAST(count(*) FILTER (NOT is_t) AS BIGINT) AS total_r
  FROM words
),
ratios AS (
  SELECT rstats.b,
         CAST((coalesce(tstats.cnt_t, 0) + 1) * (tot.total_r + {B})
              AS DOUBLE)
         / CAST((tot.total_t + {B}) * (rstats.cnt_r + 1) AS DOUBLE)
           AS ratio
  FROM rstats LEFT JOIN tstats USING (b) CROSS JOIN tot
),
scored AS (
  SELECT w.doc_id,
         CAST(count(*) AS BIGINT) AS dl,
         list_reduce(list(r.ratio ORDER BY w.pos), (a, b) -> a + b)
           AS score
  FROM words w JOIN ratios r USING (b)
  WHERE NOT w.is_t
  GROUP BY w.doc_id
),
ranked AS (
  SELECT doc_id, dl, score, score / CAST(dl AS DOUBLE) AS mean_ratio,
         row_number() OVER (
           ORDER BY score / CAST(dl AS DOUBLE) DESC, doc_id ASC
         ) AS rank
  FROM scored
)
SELECT doc_id, dl, score, mean_ratio, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {TOPK}
"""
