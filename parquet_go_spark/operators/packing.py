"""Sequence packing: concatenate documents' tokens in doc order and
slice the stream into fixed-width training windows (the GPT-style
"concat and chunk" pre-training layout). Beyond the reference — a
training-data-pipeline operator over the same documents table the text
family uses (task mandate); the reference has no analog.

Token ids are derived identically in Spark and DuckDB from the document
text (whitespace words -> ascii(first char) * 1009 + length), so the
oracle checks the PACKED WINDOWS byte-for-byte via a JSON digest: any
off-by-one in the global offsets, fragment slicing, or window assembly
flips the hash.

100 TB plan (the part that matters):

* the global token offset per document is a distributed prefix sum —
  range-repartition by doc_id, per-partition running sums (window
  PARTITIONED by spark_partition_id, so no single-partition window),
  plus a per-partition total collected to the driver (one tiny row per
  partition) and broadcast back as each partition's base offset. No
  global-order window, no driver row data.
* each document then knows its window span locally and explodes into
  at most ceil(n/W)+1 (window_id, fragment) rows; fragments are sliced
  JVM-side with `slice()`.
* ONE shuffle on window_id reassembles windows; each group holds <= W
  tokens, flattened in offset order. Windows are emitted only when
  complete (== W tokens), so the ragged tail never produces a short
  row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WINDOW = 512

# identical word -> token-id derivation in both engines
_SPARK_TOKS = (
    "transform(filter(split(text, ' '), w -> w <> ''), "
    "w -> CAST(ascii(w) AS BIGINT) * 1009 + length(w))"
)


def pack_sequences(df: DataFrame, window: int = WINDOW) -> DataFrame:
    """(doc_id, toks array<bigint>) -> (seq_id, tokens, n_docs,
    first_doc, last_doc) of exactly ``window`` tokens each."""
    spark = df.sparkSession
    n_parts = max(df.rdd.getNumPartitions(), 1)
    ranged = (
        df.repartitionByRange(n_parts, "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .withColumn("n", F.size("toks"))
    )
    ranged = ranged.persist()
    try:
        # distributed prefix sum: per-partition totals are metadata-scale
        # (one row per partition) — the only thing the driver ever sees;
        # the offsets ride back as a broadcast join (a create_map literal
        # would bloat the plan past ~1k partitions)
        from ..plans.prefix import base_offsets

        base_df = base_offsets(spark, ranged, weight="n")

        from pyspark.sql import Window as W

        run = W.partitionBy("pid").orderBy("doc_id") \
            .rowsBetween(W.unboundedPreceding, 0)
        offs = (
            ranged.join(F.broadcast(base_df), "pid", "left")
            .withColumn(
                "off",
                F.coalesce(F.col("base"), F.lit(0))
                + F.sum("n").over(run) - F.col("n"),
            )
            .filter(F.col("n") > 0)
        )

        w = F.lit(window)
        frags = offs.select(
            "doc_id", "toks", "n", "off",
            F.explode(F.sequence(
                (F.col("off") / w).cast("long"),
                ((F.col("off") + F.col("n") - 1) / w).cast("long"),
            )).alias("seq_id"),
        ).select(
            "seq_id", "doc_id", "off",
            F.expr(
                f"slice(toks, greatest(seq_id * {window} - off, 0L) + 1, "
                f"least((seq_id + 1) * {window} - off, n) - "
                f"greatest(seq_id * {window} - off, 0L))"
            ).alias("frag"),
        )
        packed = frags.groupBy("seq_id").agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("off", "frag"))),
                    lambda x: x["frag"],
                )
            ).alias("tokens"),
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        ).filter(F.size("tokens") == window)
        # materialize BEFORE unpersisting: the collected base offsets are
        # only valid for the pid assignment the persisted ranged produced;
        # recomputing repartitionByRange after unpersist would resample
        # range boundaries and silently shift offsets
        packed = packed.localCheckpoint(eager=True)
    finally:
        ranged.unpersist()
    return packed


def pack_sequences_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: pack the documents table's derived token stream
    into 512-token windows; emit a digest per window so the oracle
    checks exact content + boundaries."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = docs.select("doc_id", F.expr(_SPARK_TOKS).alias("toks"))
    packed = pack_sequences(df, WINDOW)
    return packed.select(
        "seq_id", "n_docs", "first_doc", "last_doc",
        F.md5(F.to_json("tokens")).alias("tok_digest"),
    )


def pack_encode_roundtrip_query(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Composition: pack documents into 512-token windows, push the
    packed table through the ENGINE (encode_table -> pgs store ->
    decode_table), and digest the decoded windows. The oracle is the
    same DuckDB packing digest — so this row is green only if the
    engine reproduced the packed token arrays bit-identically (the
    north rule's roundtrip guarantee on derived, not synthetic,
    tokens)."""
    import os
    import shutil

    from .decode_job import decode_table
    from .encode_job import encode_table

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = docs.select("doc_id", F.expr(_SPARK_TOKS).alias("toks"))
    packed = pack_sequences(df, WINDOW).select(
        F.col("seq_id").cast("string").alias("doc_id"),
        F.col("tokens").cast("array<int>").alias("tokens"),
        F.size("tokens").alias("n_tok"),
        F.lit("packed").alias("source"),
    )
    out = os.path.join("/tmp", f"pgs_packed_{os.path.basename(sf_dir)}")
    shutil.rmtree(out, ignore_errors=True)
    encode_table(spark, packed, out, target_tokens=200_000, resume=False)
    dec = decode_table(
        spark, out, ["doc_id", "tokens", "n_tok"],
        "doc_id string, tokens array<int>, n_tok int",
    )
    return dec.select(
        F.col("doc_id").cast("long").alias("seq_id"),
        "n_tok",
        F.md5(F.to_json(F.col("tokens").cast("array<long>")))
        .alias("tok_digest"),
    )


# DuckDB token derivation matching _SPARK_TOKS, over any row source
# exposing (doc_id, text)
_DUCK_TOKS = (
    "[CAST(ascii(w) AS BIGINT) * 1009 + length(w)"
    " FOR w IN string_split(text, ' ') IF w <> '']"
)


def win_cte(toks_sql: str, window: int = WINDOW) -> str:
    """DuckDB CTE chain replicating pack_sequences over any token
    source: ``toks_sql`` must yield (doc_id, toks array<bigint>); the
    result exposes a ``win`` CTE of (seq_id, tokens, n_docs,
    first_doc, last_doc). Shared by the plain packing oracles and the
    end-to-end curation pipeline oracle."""
    return f"""
WITH toks AS ({toks_sql}),
offs AS (
  SELECT doc_id, toks, len(toks) AS n,
         CAST(SUM(len(toks)) OVER (ORDER BY doc_id) - len(toks)
              AS BIGINT) AS off
  FROM toks
  WHERE len(toks) > 0
),
stream AS (
  SELECT off + u.i - 1 AS gpos, toks[u.i] AS tok, doc_id
  FROM offs, UNNEST(generate_series(1, n)) AS u(i)
),
win AS (
  SELECT CAST(gpos // {window} AS BIGINT) AS seq_id,
         list(tok ORDER BY gpos) AS tokens,
         COUNT(DISTINCT doc_id) AS n_docs,
         MIN(doc_id) AS first_doc,
         MAX(doc_id) AS last_doc
  FROM stream
  GROUP BY 1
)
"""

_WIN_CTE = win_cte(f"SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents")

PACK_SEQUENCES_ORACLE = f"""{_WIN_CTE}
SELECT seq_id, n_docs, first_doc, last_doc,
       md5(to_json(tokens)::VARCHAR) AS tok_digest
FROM win
WHERE len(tokens) = {WINDOW}
"""

PACK_ENCODE_ROUNDTRIP_ORACLE = f"""{_WIN_CTE}
SELECT seq_id, CAST({WINDOW} AS INTEGER) AS n_tok,
       md5(to_json(tokens)::VARCHAR) AS tok_digest
FROM win
WHERE len(tokens) = {WINDOW}
"""
