"""Data-curation operators over `documents`: deterministic weighted
sampling, train/val/test split assignment, weighted source mixing
(epoch-style oversampling), and a seeded global shuffle.

Beyond the reference — training-data-pipeline operators (task mandate;
the reference is an encode/decode layer and has no analog). These are
the selection/ordering steps that sit in front of the encode engine in
a real pre-training pipeline: choose documents at per-source rates,
carve held-out splits, over/under-sample domains to a target mixture,
and lay the corpus out in a reproducible pseudo-random order.

Every decision derives from a 60-bit hash h = first 15 hex digits of
md5(seed|doc_id), computed identically in Spark SQL and DuckDB, and is
compared against INTEGER thresholds precomputed in Python (rate * 2^60
rounded once, at policy-definition time) — no floating-point rounding
can diverge between the two engines, so every query is exactly
oracle-checkable, not just statistically plausible.

100 TB plan:
* sample / split / mix are map-only. The per-source policy ships as a
  broadcast-joined table (never a giant CASE over thousands of
  sources), the hash + compare run in JVM codegen, and mix's
  oversampling explodes sequence(1, n_copies) JVM-side. Zero shuffles;
  partial output can stream straight into the encode job.
* global_shuffle is ONE range shuffle on the hash key plus the same
  distributed prefix-sum pack_sequences uses (per-partition counts →
  broadcast base offsets + an intra-partition row_number): no
  global-order window, no row data on the driver, so the assigned
  positions are exact 0..n-1 at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCALE = 1 << 60

# Driver-query policies (sources in the testdata are src0..src19).
# Rates exercise the full 0.1..1.0 range; mix weights exercise drop
# (0), plain keep (1x), fractional (0.25..0.75), and oversample (>1).
SAMPLE_RATES = {f"src{i}": (i % 10 + 1) / 10.0 for i in range(20)}
MIX_WEIGHTS = {f"src{i}": 0.25 * (i % 7) for i in range(20)}
SPLIT_FRACS = (0.90, 0.95)  # train < 0.90 <= val < 0.95 <= test

SEED_SAMPLE = "cur-sample-42"
SEED_SPLIT = "cur-split-42"
SEED_MIX = "cur-mix-42"
SEED_SHUFFLE = "cur-shuffle-42"


def _thr(rate: float) -> int:
    """Integer threshold for P(h < thr) = rate over the 60-bit hash.

    Rounded ONCE here; both engines then compare exact integers."""
    return max(0, min(_SCALE, int(round(rate * _SCALE))))


def _h60(seed: str):
    """60-bit uniform hash of doc_id as a Spark Column (JVM codegen)."""
    return F.expr(
        f"CAST(conv(substring(md5(concat('{seed}|', "
        f"CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )


def _h60_duck(seed: str) -> str:
    """The same 60-bit hash in DuckDB SQL (md5 hex is identical)."""
    return (
        f"CAST('0x' || substr(md5('{seed}|' || "
        f"CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)"
    )


# ---------------------------------------------------------------- sample

def sample_weighted(df: DataFrame, rates: dict[str, float],
                    seed: str = SEED_SAMPLE) -> DataFrame:
    """Deterministic per-source Bernoulli sampling: keep a row iff
    h60(seed, doc_id) < rate[source] * 2^60. Sources absent from
    `rates` are dropped (explicit policy, like a curation manifest).
    All input columns are preserved so the output composes with
    downstream operators (split/shuffle/pack/encode).

    Map-only: broadcast-join the tiny policy table, codegen filter."""
    spark = df.sparkSession
    rows = [(s, _thr(r)) for s, r in sorted(rates.items())]
    rdf = spark.createDataFrame(rows, "source string, thr long")
    return (
        df.join(F.broadcast(rdf), "source", "inner")
        .filter(_h60(seed) < F.col("thr"))
        .select(*df.columns)
    )


def _policy_values(rows: list[tuple]) -> str:
    def lit(v):
        return f"'{v}'" if isinstance(v, str) else str(v)

    return ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)


def sample_weighted_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sample_weighted(docs, SAMPLE_RATES).select("doc_id", "source")


SAMPLE_ORACLE = f"""
WITH r AS (
  SELECT * FROM (VALUES {_policy_values(
      [(s, _thr(v)) for s, v in sorted(SAMPLE_RATES.items())])}
  ) t(source, thr)
)
SELECT d.doc_id, d.source
FROM documents d JOIN r USING (source)
WHERE {_h60_duck(SEED_SAMPLE)} < r.thr
"""


# ----------------------------------------------------------------- split

def split_assign(df: DataFrame, fracs: tuple[float, float] = SPLIT_FRACS,
                 seed: str = SEED_SPLIT) -> DataFrame:
    """Assign every document to train/val/test by hash bucket:
    train if h < fracs[0]*2^60, val if h < fracs[1]*2^60, else test.
    Appends a `split` column (input columns preserved). Pure
    projection — zero shuffles, stable across reruns and across any
    re-partitioning of the input (the split follows doc_id, not
    physical placement)."""
    t1, t2 = _thr(fracs[0]), _thr(fracs[1])
    h = _h60(seed)
    return df.withColumn(
        "split",
        F.when(h < t1, F.lit("train"))
        .when(h < t2, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def split_assign_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return split_assign(docs).select("doc_id", "split")


SPLIT_ORACLE = f"""
SELECT doc_id,
       CASE WHEN {_h60_duck(SEED_SPLIT)} < {_thr(SPLIT_FRACS[0])}
              THEN 'train'
            WHEN {_h60_duck(SEED_SPLIT)} < {_thr(SPLIT_FRACS[1])}
              THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


# ------------------------------------------------------------------- mix

def mix_sources(df: DataFrame, weights: dict[str, float],
                seed: str = SEED_MIX) -> DataFrame:
    """Weighted source mixing with epoch-style oversampling: a document
    from a source with weight w appears floor(w) times, plus once more
    with probability frac(w) (decided by the hash — deterministic).
    Appends an `epoch` column in 1..n_copies (input columns
    preserved, one output row per copy); weight 0 (or a source absent
    from `weights`) drops the document.

    Map-only: broadcast policy join + JVM-side sequence explode."""
    spark = df.sparkSession
    rows = [
        (s, int(w), _thr(w - int(w))) for s, w in sorted(weights.items())
    ]
    rdf = spark.createDataFrame(rows, "source string, base int, thr long")
    copies = (
        F.col("base")
        + (_h60(seed) < F.col("thr")).cast("int")
    )
    return (
        df.join(F.broadcast(rdf), "source", "inner")
        .withColumn("n_copies", copies)
        .filter(F.col("n_copies") >= 1)
        .select(
            *df.columns,
            F.explode(F.sequence(
                F.lit(1).cast("bigint"),
                F.col("n_copies").cast("bigint"),
            )).alias("epoch"),
        )
    )


def mix_sources_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return mix_sources(docs, MIX_WEIGHTS).select("doc_id", "source", "epoch")


MIX_ORACLE = f"""
WITH r AS (
  SELECT * FROM (VALUES {_policy_values(
      [(s, int(w), _thr(w - int(w)))
       for s, w in sorted(MIX_WEIGHTS.items())])}
  ) t(source, base, thr)
),
c AS (
  SELECT d.doc_id, d.source,
         r.base + CASE WHEN {_h60_duck(SEED_MIX)} < r.thr
                       THEN 1 ELSE 0 END AS n_copies
  FROM documents d JOIN r USING (source)
)
SELECT doc_id, source, CAST(u.e AS BIGINT) AS epoch
FROM c, UNNEST(generate_series(1, n_copies)) AS u(e)
WHERE n_copies >= 1
"""


# --------------------------------------------------------------- shuffle

def global_shuffle(df: DataFrame, seed: str = SEED_SHUFFLE) -> DataFrame:
    """Seeded global pseudo-random permutation: every document gets an
    exact position 0..n-1 in md5(seed|doc_id) order, appended as a
    `pos` column (input columns preserved — shuffling the corpus into
    training order is exactly when the full rows must move once).
    Reproducible (same seed → same order, independent of input
    partitioning).

    Distributed exactly like pack_sequences' offset pass: range-
    partition on the hash key (range boundaries preserve the global
    order across partition ids), sort within each partition (no
    shuffle), count rows per partition (one metadata row each), and
    broadcast the running totals back as base offsets. The local rank
    comes from monotonically_increasing_id()'s low 33 bits — the
    documented record-within-partition counter — so no Window (a
    Window PARTITION BY pid would re-shuffle the whole id stream on
    pid; this shape moves the data exactly once)."""
    spark = df.sparkSession
    skey = F.md5(
        F.concat(F.lit(f"{seed}|"), F.col("doc_id").cast("string"))
    ).alias("skey")
    n_parts = max(df.rdd.getNumPartitions(), 1)
    ranged = (
        df.select(*df.columns, skey)
        .repartitionByRange(n_parts, "skey")
        .sortWithinPartitions("skey", "doc_id")
        .select(
            *df.columns,
            F.spark_partition_id().alias("pid"),
            # low 33 bits = row index within the partition, in the
            # sorted order (the projection sits above the Sort and
            # mid is nondeterministic-marked, so Catalyst cannot
            # reorder it below the Sort)
            F.expr(
                "monotonically_increasing_id() & 8589934591"
            ).alias("loc"),
        )
        .persist()
    )
    try:
        from ..plans.prefix import base_offsets

        base_df = base_offsets(spark, ranged)
        out = (
            ranged.join(F.broadcast(base_df), "pid", "left")
            .select(
                (F.coalesce(F.col("base"), F.lit(0))
                 + F.col("loc")).alias("pos"),
                *df.columns,
            )
        )
        # materialize BEFORE unpersisting: the collected base offsets
        # are only valid for the pid assignment the persisted `ranged`
        # produced; recomputing repartitionByRange after unpersist
        # would resample range boundaries and silently shift positions
        out = out.localCheckpoint(eager=True)
    finally:
        ranged.unpersist()
    return out


def global_shuffle_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return global_shuffle(docs).select("pos", "doc_id")


SHUFFLE_ORACLE = f"""
SELECT CAST(row_number() OVER (
         ORDER BY md5('{SEED_SHUFFLE}|' || CAST(doc_id AS VARCHAR)),
                  doc_id) - 1 AS BIGINT) AS pos,
       doc_id
FROM documents
"""


# -------------------------------------------------------------- pipeline

def pipeline_pack_encode_query(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline through the ENGINE:

        documents -> weighted sampling -> keep the train split ->
        seeded global shuffle -> pack into 512-token windows ->
        encode_table (pgs store) -> decode_table -> window digest

    Every stage is deterministic, so ONE DuckDB oracle replicates the
    whole chain; the row is green only if the curation decisions, the
    shuffle order, the window boundaries, AND the engine's
    encode->decode all agree bit-for-bit. This is the flagship "a
    user could run their whole pipeline here" composition."""
    import os
    import shutil

    from .decode_job import decode_table
    from .encode_job import encode_table
    from .packing import WINDOW, _SPARK_TOKS, pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = split_assign(
        sample_weighted(docs, SAMPLE_RATES)
    ).filter(F.col("split") == "train")
    ordered = global_shuffle(train)
    stream = ordered.select(
        F.col("pos").alias("doc_id"), F.expr(_SPARK_TOKS).alias("toks")
    )
    packed = pack_sequences(stream, WINDOW).select(
        F.col("seq_id").cast("string").alias("doc_id"),
        F.col("tokens").cast("array<int>").alias("tokens"),
        F.size("tokens").alias("n_tok"),
        F.lit("pipeline").alias("source"),
    )
    out = os.path.join("/tmp", f"pgs_pipeline_{os.path.basename(sf_dir)}")
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


def _pipeline_oracle() -> str:
    from .packing import WINDOW, _DUCK_TOKS, win_cte

    toks_sql = f"""
  SELECT CAST(row_number() OVER (
           ORDER BY md5('{SEED_SHUFFLE}|' || CAST(doc_id AS VARCHAR)),
                    doc_id) - 1 AS BIGINT) AS doc_id,
         {_DUCK_TOKS} AS toks
  FROM documents d
  JOIN (VALUES {_policy_values(
      [(s, _thr(v)) for s, v in sorted(SAMPLE_RATES.items())])}
  ) r(source, thr) USING (source)
  WHERE {_h60_duck(SEED_SAMPLE)} < r.thr
    AND {_h60_duck(SEED_SPLIT)} < {_thr(SPLIT_FRACS[0])}
"""
    return f"""{win_cte(toks_sql, WINDOW)}
SELECT seq_id, CAST({WINDOW} AS INTEGER) AS n_tok,
       md5(to_json(tokens)::VARCHAR) AS tok_digest
FROM win
WHERE len(tokens) = {WINDOW}
"""


PIPELINE_ORACLE = _pipeline_oracle()
