"""In-engine trainable document classifier: a full-batch averaged-step
perceptron over hashed bag-of-words features — the fasttext-class
quality/language filter a curation pipeline trains on its own corpus
(here: English vs non-English from the `lang` column, the classic
LM-data filter task).

Why a perceptron and not logistic regression: the training loop is
ENTIRELY integer arithmetic — feature counts, weights, margins, and
updates are all BIGINTs — so R rounds of distributed training are
bit-reproducible across engines and the whole run (not just the final
scores) is oracle-checked. The DuckDB oracle replays every round as
generated chained MATERIALIZED CTEs, the bpe.py discipline. (A
logistic loss needs exp/log, the two operators that are not correctly
rounded identically across engines; its plan shape would be the same.)

Batch perceptron update (round k):
    margin(d)  = sum_b w[b] * x[d, b]          (bias as feature b = -1)
    D_k        = { d : y_d * margin(d) <= 0 }  (ties count as misses)
    w[b]      += sum_{d in D_k} y_d * x[d, b]

Plan shape: ONE explode+groupBy builds the (doc, y, bucket, count)
feature table, localCheckpoint-ed and reused by every round. Each
round = one broadcast join with the (B+1)-row weight table + one
groupBy(doc) margin shuffle + one doc-keyed join back to features for
the update aggregate; the collected update is B+1 rows — model state,
the same metadata-scale driver participation as bpe_train's argmax.
Full-batch over the corpus is the honest semantics at gate scale; at
100 TB the standard move is to train on a curate_sample carve (the
operator composes — docs is any (doc_id, text, label) frame).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

B = 256
ROUNDS = 4
_SEED = "clf-feat"


def _bucket(col: str):
    return F.expr(
        f"CAST(conv(substring(md5(concat('{_SEED}|', {col})), 1, 15), "
        f"16, 10) AS BIGINT) % {B}"
    )


def perceptron_train(
    spark: SparkSession,
    docs: DataFrame,
    rounds: int = ROUNDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "y",
) -> tuple[dict[int, int], DataFrame]:
    """docs(doc_id, text, y in {+1,-1}) -> (weights, scored frame).

    Returns the trained bucket->weight map and the per-document frame
    (doc_id, y, margin, pred) under the FINAL weights."""
    words = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(label_col).cast("int").alias("y"),
        F.explode(F.split(text_col, " ")).alias("w"),
    )
    feats = (
        words.select("doc_id", "y", _bucket("w").alias("b"))
        .groupBy("doc_id", "y", "b")
        .agg(F.count("*").cast("long").alias("x"))
        .unionByName(
            docs.select(
                F.col(id_col).cast("long").alias("doc_id"),
                F.col(label_col).cast("int").alias("y"),
                F.lit(-1).cast("long").alias("b"),
                F.lit(1).cast("long").alias("x"),
            )
        )
        .localCheckpoint()
    )
    weights: dict[int, int] = {
        r["b"]: 0 for r in feats.select("b").distinct().collect()
    }

    def _wdf():
        return spark.createDataFrame(
            list(weights.items()), "b long, w long"
        )

    def _margins():
        return (
            feats.join(F.broadcast(_wdf()), "b")
            .groupBy("doc_id", "y")
            .agg(F.sum(F.col("x") * F.col("w")).cast("long").alias("m"))
        )

    for _ in range(rounds):
        miss = _margins().filter(
            F.col("y").cast("long") * F.col("m") <= 0
        ).select("doc_id")
        upd = (
            feats.join(miss, "doc_id")
            .groupBy("b")
            .agg(F.sum(F.col("y").cast("long") * F.col("x"))
                 .cast("long").alias("d"))
            .collect()
        )
        for r in upd:
            weights[r["b"]] += int(r["d"])

    scored = _margins().select(
        "doc_id", "y", F.col("m").alias("margin"),
        F.when(F.col("m") > 0, 1).otherwise(-1).cast("int").alias("pred"),
    )
    return weights, scored


# -------------------------------------------------------------- driver query

def lang_classifier_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select(
        "doc_id", "text",
        F.when(F.col("lang") == "en", 1).otherwise(-1).alias("y"),
    )
    _, scored = perceptron_train(spark, docs)
    return scored


def _round_ctes(rounds: int) -> str:
    parts = [f"""
WITH docs AS MATERIALIZED (
  SELECT doc_id, text,
         CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y
  FROM documents
),
feats AS MATERIALIZED (
  SELECT doc_id, y,
         CAST('0x' || substr(md5('{_SEED}|' ||
              unnest(string_split(text, ' '))), 1, 15) AS BIGINT)
           % {B} AS b,
         CAST(1 AS BIGINT) AS x
  FROM docs
),
fx AS MATERIALIZED (
  SELECT doc_id, y, b, CAST(sum(x) AS BIGINT) AS x
  FROM feats GROUP BY doc_id, y, b
  UNION ALL
  SELECT doc_id, y, CAST(-1 AS BIGINT) AS b, CAST(1 AS BIGINT) AS x
  FROM docs
),
w0 AS MATERIALIZED (
  SELECT DISTINCT b, CAST(0 AS BIGINT) AS w FROM fx
)"""]
    for k in range(1, rounds + 1):
        p = k - 1
        parts.append(f""",
m{k} AS MATERIALIZED (
  SELECT f.doc_id, f.y, CAST(sum(f.x * w.w) AS BIGINT) AS m
  FROM fx f JOIN w{p} w USING (b)
  GROUP BY f.doc_id, f.y
),
u{k} AS MATERIALIZED (
  SELECT f.b, CAST(sum(f.y * f.x) AS BIGINT) AS d
  FROM fx f JOIN m{k} m ON f.doc_id = m.doc_id
  WHERE m.y * m.m <= 0
  GROUP BY f.b
),
w{k} AS MATERIALIZED (
  SELECT w.b, CAST(w.w + coalesce(u.d, 0) AS BIGINT) AS w
  FROM w{p} w LEFT JOIN u{k} u USING (b)
)""")
    return "".join(parts)


LANG_CLASSIFIER_ORACLE = _round_ctes(ROUNDS) + f""",
final AS (
  SELECT f.doc_id, f.y, CAST(sum(f.x * w.w) AS BIGINT) AS m
  FROM fx f JOIN w{ROUNDS} w USING (b)
  GROUP BY f.doc_id, f.y
)
SELECT doc_id, y, m AS margin,
       CAST(CASE WHEN m > 0 THEN 1 ELSE -1 END AS INT) AS pred
FROM final
"""
