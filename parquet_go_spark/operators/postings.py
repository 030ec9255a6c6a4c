"""Inverted index: delta-friendly posting lists over a document corpus.

The retrieval primitive a token store keeps next to the text: for every
word, the SORTED list of documents containing it. Sorted int posting
lists are THE textbook workload for DELTA_BINARY_PACKED-style
frame-of-reference coding (small positive gaps), so the composition
query feeds the built index straight through the engine's encode path —
the same codec family the reference ships for ints
(internal/encoding/encodingwrite.go DELTA_BINARY_PACKED) proving itself
on its canonical input.

Plan shape at scale (the minhash discipline — no driver participation):

  1. explode(split) -> distinct (w, doc_id): ONE shuffle; duplicate
     word-doc pairs die in the partial aggregate before crossing it.
  2. groupBy(w) -> sort_array(collect_list(doc_id)): second shuffle,
     keyed by word.

Skew is real here — stop words ("the") own posting lists as long as the
corpus. ``max_df`` is the guard: words present in more than that many
documents are dropped (the classic IR stop-word cutoff; a list that
long prunes nothing at query time anyway). The count comes from the
same aggregate, so the cap costs no extra pass. ``min_df`` symmetrically
drops hapax noise when asked.

Posting arrays ride as ``array<long>``; doc ids at 10^12-sequence scale
exceed int32 and the engine's list path keeps 64-bit elements
(chunk.py sub-frames pick FOR/delta/rANS by stats).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_postings(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
    prefilter: bool = False,
) -> DataFrame:
    """(doc_id, text) -> (w, df, postings array<long> ASC).

    ``prefilter=True`` (requires ``max_df``) runs an exact df pre-count
    and anti-joins the over-cap stop words out of the pair stream BEFORE
    the list-assembly aggregate: the stop list is broadcast-tiny, the
    pair stream shuffles twice (cheap, fixed-width rows), and the
    expensive wide-row collect_list shuffle never carries a stop word's
    corpus-length posting list. Output is IDENTICAL by construction —
    the pre-count uses the same exact df the post-filter would, so this
    is the honest 100 TB arm, not an approximation. (A further
    refinement at extreme vocabulary: an HLL-estimated pre-count with a
    safety margin — only words ESTIMATED far above the cap are
    pre-dropped, the exact cap still applies downstream.)"""
    pairs = (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.explode(F.split(text_col, " ")).alias("w"),
        )
        .distinct()
    )
    if prefilter:
        if max_df is None:
            raise ValueError("prefilter needs max_df (it exists to keep "
                             "over-cap stop words out of the shuffle)")
        over = (
            pairs.groupBy("w").agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("w")
        )
        pairs = pairs.join(F.broadcast(over), "w", "left_anti")
    out = pairs.groupBy("w").agg(
        F.count("*").cast("long").alias("df"),
        F.sort_array(F.collect_list("doc_id")).alias("postings"),
    )
    if min_df > 1:
        out = out.filter(F.col("df") >= min_df)
    if max_df is not None:
        out = out.filter(F.col("df") <= max_df)
    return out


# -------------------------------------------------------------- driver queries

def _digest(idx: DataFrame) -> DataFrame:
    return idx.select(
        "w", "df",
        F.element_at("postings", 1).alias("first_doc"),
        F.element_at("postings", -1).alias("last_doc"),
        F.aggregate(
            "postings", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("sum_doc"),
        F.md5(F.to_json("postings")).alias("post_digest"),
    )


def text_postings_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return _digest(
        build_postings(spark, docs.select("doc_id", "text"), max_df=400)
    )


def postings_encode_roundtrip_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Composition: inverted index -> encode_table -> decode -> digest.
    Green only if the engine reproduced every sorted posting list
    bit-identically; n_tok = list length, so the token-weighted planner
    packs the skewed stop-word rows exactly like long token arrays."""
    from .decode_job import decode_table
    from .encode_job import encode_table

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    idx = build_postings(
        spark, docs.select("doc_id", "text"), max_df=400
    ).select(
        F.col("w").alias("doc_id"),  # planner key columns: reuse names
        # postings stay array<long>: doc ids past 2^31 are the POINT of
        # 64-bit lists (an int cast would throw under ANSI / null-corrupt
        # without), and the engine's list path keeps 64-bit elements
        F.col("postings").alias("tokens"),
        F.col("df").cast("int").alias("n_tok"),
        F.lit("postings").alias("source"),
    )
    out = os.path.join("/tmp", f"pgs_post_{os.path.basename(sf_dir)}")
    shutil.rmtree(out, ignore_errors=True)
    encode_table(spark, idx, out, target_tokens=200_000, resume=False)
    dec = decode_table(
        spark, out, ["doc_id", "tokens", "n_tok"],
        "doc_id string, tokens array<long>, n_tok int",
    )
    return _digest(
        dec.select(
            F.col("doc_id").alias("w"),
            F.col("n_tok").cast("long").alias("df"),
            F.col("tokens").alias("postings"),
        )
    )


_PAIRS_CTE = """
WITH pairs AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents
),
idx AS (
  SELECT w, CAST(count(*) AS BIGINT) AS df,
         list(doc_id ORDER BY doc_id) AS postings
  FROM pairs GROUP BY w
  HAVING count(*) <= 400
)
"""

TEXT_POSTINGS_ORACLE = _PAIRS_CTE + """
SELECT w, df,
       postings[1] AS first_doc,
       postings[-1] AS last_doc,
       CAST(list_sum(postings) AS BIGINT) AS sum_doc,
       md5(to_json(postings)) AS post_digest
FROM idx
"""

POSTINGS_ENCODE_ROUNDTRIP_ORACLE = TEXT_POSTINGS_ORACLE
