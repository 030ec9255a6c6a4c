"""Distributed BPE merge training: learn byte-pair-encoding merges
from the corpus, apply them, and roundtrip the BPE tokens through the
engine — the real tokenizer-training front of the pipeline
(tokenize.py's unigram vocab is the baseline every BPE starts from;
this is the merge loop on top).

Classic word-histogram BPE (the GPT-2 / sentencepiece shape): training
never touches the corpus after one histogram pass — each merge round
works on the DISTINCT-WORD symbol table weighted by word frequency,
which is vocabulary-scale, orders of magnitude smaller than the corpus.
Per round:

  1. adjacent symbol pairs weighted by word count -> groupBy(l, r)
     sum:  one small shuffle over the vocab table;
  2. the argmax pair (weight DESC, l ASC, r ASC) is a SINGLE row
     collected to the driver — the merge DECISION is a scalar, the
     same class of driver participation as the reference's
     dictionary-budget decision (internal/layout/dictpage.go), not a
     data collect;
  3. the merge applies to every word's symbol array as a left-greedy
     fold (F.aggregate, JVM-side; no Python in the data path), and the
     table localCheckpoints so R rounds don't stack R plans.

Greedy-left overlap semantics (the only subtle point, pinned by tests
and the oracle): a position merges iff the previous position didn't —
within a run of consecutive matches (only possible when l == r, e.g.
"aaaa" under (a,a)) every ODD-ranked match merges. The Spark fold gets
this for free (a just-merged l||r never equals l, since r is nonempty);
the SQL oracle replicates it with the gaps-and-islands parity rule.

Everything is integer/string arithmetic — no float crosses an engine
boundary — so train, encode, and the engine roundtrip are all exactly
oracle-checked. The oracle unrolls the R merge rounds as generated
chained CTEs (DuckDB replays the whole training loop in SQL).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_MERGES = 8

_PAIRS_EXPR = (
    "transform(slice(syms, 1, size(syms) - 1), "
    "(x, i) -> struct(x AS l, syms[i + 1] AS r))"
)


def _apply_merge(col, l: str, r: str):
    """Left-greedy single-rule merge over a symbol array, as a JVM
    fold: append each symbol unless the tail is `l` and the symbol is
    `r`, in which case replace the tail with l||r. F.get returns NULL
    (never an ANSI error) on the empty-array probe."""
    merged = F.lit(l + r)
    return F.aggregate(
        col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == F.lit(l)) & (x == F.lit(r)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = N_MERGES,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Learn `n_merges` BPE merges from the corpus.

    Returns (merges, wsyms): merges = (step, lhs, rhs, merged, weight)
    in training order; wsyms = (w, cnt, syms) — every distinct word's
    final symbol sequence, the lookup table bpe_apply encodes with."""
    ws = (
        docs.select(F.explode(F.split(text_col, " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
        .select("w", "cnt", F.split("w", "").alias("syms"))
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        best = (
            ws.select("cnt", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
            .select("cnt", "p.l", "p.r")
            .groupBy("l", "r")
            .agg(F.sum("cnt").cast("long").alias("wt"))
            .orderBy(F.col("wt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, wt = best[0]["l"], best[0]["r"], int(best[0]["wt"])
        merges.append((step, l, r, l + r, wt))
        ws = ws.select(
            "w", "cnt", _apply_merge(F.col("syms"), l, r).alias("syms")
        ).localCheckpoint()
    mdf = spark.createDataFrame(
        merges, "step int, lhs string, rhs string, merged string, weight long"
    )
    return mdf, ws


def bpe_apply(
    spark: SparkSession,
    docs: DataFrame,
    wsyms: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, text) x trained word table -> (doc_id, toks
    array<string>): per-doc BPE symbol sequence in document order.
    The join is an equi-join on the word — broadcast when the vocab
    fits (AQE decides), a plain hash join at 100 TB vocabularies."""
    words = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(F.split(text_col, " ")).alias("pos", "w"),
    )
    return (
        words.join(wsyms.select("w", "syms"), "w")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "syms"))),
                    lambda s: s["syms"],
                )
            ).alias("toks")
        )
    )


# -------------------------------------------------------------- driver queries

def bpe_train_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    mdf, _ = bpe_train(spark, docs.select("text"))
    return mdf


def bpe_encode_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    _, ws = bpe_train(spark, docs.select("text"))
    enc = bpe_apply(spark, docs.select("doc_id", "text"), ws)
    return enc.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_syms"),
        F.element_at("toks", 1).alias("first_sym"),
        F.md5(F.to_json("toks")).alias("toks_digest"),
    )


def bpe_encode_roundtrip_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Composition: BPE-train -> encode corpus -> frequency-ranked
    symbol ids -> engine encode_table -> decode -> digest. Green only
    if the engine reproduces the LEARNED BPE token ids bit-identically
    (the north-rule roundtrip on trained tokens, merge-aware this
    time)."""
    from .decode_job import decode_table
    from .encode_job import encode_table
    from .tokenize import train_vocab

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    _, ws = bpe_train(spark, docs.select("text"))
    enc = bpe_apply(spark, docs.select("doc_id", "text"), ws)
    occ = enc.select(
        "doc_id", F.posexplode("toks").alias("p", "w")
    )
    vocab = train_vocab(spark, occ.select("w"))
    ids = (
        occ.join(vocab, "w")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "id"))),
                lambda s: s["id"],
            ).alias("tokens")
        )
    )
    tok = ids.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("tokens").cast("array<int>").alias("tokens"),
        F.size("tokens").alias("n_tok"),
        F.lit("bpe").alias("source"),
    )
    out = os.path.join("/tmp", f"pgs_bpe_{os.path.basename(sf_dir)}")
    shutil.rmtree(out, ignore_errors=True)
    encode_table(spark, tok, out, target_tokens=200_000, resume=False)
    dec = decode_table(
        spark, out, ["doc_id", "tokens"],
        "doc_id string, tokens array<int>",
    )
    return dec.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size("tokens").cast("long").alias("n_tok"),
        F.element_at("tokens", 1).cast("long").alias("first_id"),
        F.aggregate(
            F.col("tokens").cast("array<long>"),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("sum_id"),
        F.md5(F.to_json(F.col("tokens").cast("array<long>")))
        .alias("tok_digest"),
    )


# ----------------------------------------------------------------- oracles

def _train_rounds_cte(n_merges: int) -> str:
    """Unroll the training loop as chained CTEs: ws0 is the char-split
    word histogram; each round k derives pairs{k}/best{k}/kept{k} and
    rewrites the table into ws{k}. Greedy-left = odd-parity within
    islands of consecutive match positions."""
    parts = ["""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
ws0 AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt, string_split(w, '') AS syms
  FROM words GROUP BY w
)"""]
    for k in range(1, n_merges + 1):
        p = k - 1
        parts.append(f""",
pos{k} AS MATERIALIZED (
  SELECT w, cnt, unnest(syms) AS s, generate_subscripts(syms, 1) AS i
  FROM ws{p}
),
pairs{k} AS MATERIALIZED (
  SELECT a.s AS l, b.s AS r, CAST(sum(a.cnt) AS BIGINT) AS wt
  FROM pos{k} a JOIN pos{k} b ON a.w = b.w AND b.i = a.i + 1
  GROUP BY a.s, b.s
),
best{k} AS MATERIALIZED (
  SELECT l, r, wt FROM pairs{k} ORDER BY wt DESC, l ASC, r ASC LIMIT 1
),
marks{k} AS MATERIALIZED (
  SELECT a.w, a.i
  FROM pos{k} a
  JOIN pos{k} b ON a.w = b.w AND b.i = a.i + 1
  CROSS JOIN best{k}
  WHERE a.s = best{k}.l AND b.s = best{k}.r
),
kept{k} AS MATERIALIZED (
  SELECT w, i FROM (
    SELECT w, i,
           row_number() OVER (PARTITION BY w, i - rn ORDER BY i) AS pk
    FROM (
      SELECT w, i, row_number() OVER (PARTITION BY w ORDER BY i) AS rn
      FROM marks{k}
    )
  ) WHERE pk % 2 = 1
),
ws{k} AS MATERIALIZED (
  SELECT p.w, CAST(min(p.cnt) AS BIGINT) AS cnt,
         list(
           CASE WHEN kk.i IS NOT NULL THEN b.l || b.r ELSE p.s END
           ORDER BY p.i
         ) AS syms
  FROM pos{k} p
  CROSS JOIN best{k} b
  LEFT JOIN kept{k} kk ON p.w = kk.w AND p.i = kk.i
  WHERE NOT EXISTS (
    SELECT 1 FROM kept{k} k3 WHERE k3.w = p.w AND k3.i = p.i - 1
  )
  GROUP BY p.w
)""")
    return "".join(parts)


def _train_oracle(n_merges: int) -> str:
    arms = "\n  UNION ALL\n".join(
        f"  SELECT CAST({k} AS INT) AS step, l AS lhs, r AS rhs, "
        f"l || r AS merged, wt AS weight FROM best{k}"
        for k in range(1, n_merges + 1)
    )
    return _train_rounds_cte(n_merges) + f"\nSELECT * FROM (\n{arms}\n)\n"


_ENC_CTE = """,
dwords AS MATERIALIZED (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
  FROM documents
),
enc AS MATERIALIZED (
  SELECT doc_id, flatten(list(syms ORDER BY pos)) AS toks
  FROM dwords JOIN ws{R} USING (w)
  GROUP BY doc_id
)"""

BPE_TRAIN_ORACLE = _train_oracle(N_MERGES)

BPE_ENCODE_ORACLE = (
    _train_rounds_cte(N_MERGES)
    + _ENC_CTE.format(R=N_MERGES)
    + """
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_syms,
       toks[1] AS first_sym,
       md5(to_json(toks)) AS toks_digest
FROM enc
"""
)

BPE_ENCODE_ROUNDTRIP_ORACLE = (
    _train_rounds_cte(N_MERGES)
    + _ENC_CTE.format(R=N_MERGES)
    + """,
occ AS MATERIALIZED (
  SELECT doc_id, unnest(toks) AS s,
         unnest(range(1, len(toks) + 1)) AS p
  FROM enc
),
svocab AS MATERIALIZED (
  SELECT s,
         CAST(row_number() OVER (ORDER BY cnt DESC, s ASC) AS BIGINT)
           AS id
  FROM (SELECT s, count(*) AS cnt FROM occ GROUP BY s)
),
ids AS MATERIALIZED (
  SELECT doc_id, list(id ORDER BY p) AS tokens
  FROM occ JOIN svocab USING (s)
  GROUP BY doc_id
)
SELECT doc_id,
       CAST(len(tokens) AS BIGINT) AS n_tok,
       tokens[1] AS first_id,
       CAST(list_sum(tokens) AS BIGINT) AS sum_id,
       md5(to_json(tokens)) AS tok_digest
FROM ids
"""
)
