"""Deduplication operators over the `documents` table.

Training-data pipeline components (not present in the reference — it is a
storage library; these are the large-scale operations the north rule's
10^12-sequence corpus needs before encoding):

  * exact dedup         — hash groupBy (one shuffle on the group key)
  * content-hash dedup  — sha256 projection (no shuffle)
  * n-gram Jaccard      — shingle explode + self-equi-join on shingle +
                          count fold; only pairs sharing >= 1 shingle are
                          materialized, never the n^2 cross product
  * MinHash + LSH       — 16 min-hash aggs in ONE groupBy pass, banded into
                          4 buckets; candidate pairs via equi-join on
                          (band, signature) — the classic shuffle-light
                          near-dup pipeline
  * SimHash             — 32-bit sign-sum signature, one explode + groupBy

All are pure DataFrame ops (JVM-side, codegen'd) — no Python in the hot
path. Scale notes are inline per operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _fan_out(df: DataFrame, key: str) -> DataFrame:
    """Spread a small scan across the cluster before per-row heavy work.

    A corpus stored as a handful of parquet files scans as a handful of
    input splits, so the expensive narrow stages downstream (shingle
    explode, per-word hashing) run on that many tasks while the rest of
    the cluster idles. When the scan has fewer splits than half the
    available slots, hash-repartition on `key` — the shuffled payload is
    the raw rows (smaller than their exploded derivatives), and because
    the partitioning is on the same key the downstream groupBy(key)
    reuses it instead of adding a second exchange. At production scale
    the scan already has thousands of splits and this is a no-op: no
    shuffle of corpus bytes is ever added to the big-data path."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 >= target:
        return df
    return df.repartition(target, F.col(key))


# ---------------------------------------------------------------- exact

def exact_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one hash-aggregate shuffle on text. At 100 TB you'd
    group on sha256(text) instead of the full text to shrink shuffle rows;
    both forms are a single exchange."""
    return (
        _docs(spark, sf_dir)
        .groupBy("text")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_id", "n_copies", "text")
    )


EXACT_ORACLE = """
SELECT min(doc_id) AS keep_id, count(*) AS n_copies, text
FROM documents GROUP BY text
"""


def hash_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash projection (map-only, no shuffle): the dedup key used
    at scale. sha2 is JVM-side codegen."""
    return _docs(spark, sf_dir).select(
        "doc_id", F.sha2(F.col("text"), 256).alias("content_hash")
    )


HASH_ORACLE = "SELECT doc_id, sha256(text) AS content_hash FROM documents"


# ---------------------------------------------------------------- shingles

def _shingles(df: DataFrame) -> DataFrame:
    """doc_id -> exploded distinct 3-word shingles.

    The words array is materialized once per row before the transform —
    referencing `split(text, ' ')[i]` inside the lambda would re-split the
    whole text per element (no CSE across lambda scopes), turning an
    O(words) shingle build into O(words^2) per document (measured 10x+ on
    sf0.1 documents)."""
    sh = F.expr(
        "transform(sequence(0, size(w) - 3),"
        " i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
    )
    return (
        _fan_out(df, "doc_id")
        .select("doc_id", F.split(F.col("text"), " ").alias("w"))
        .filter(F.size("w") >= 3)
        # no `size(shingles) > 0` filter: size(w) >= 3 already guarantees
        # >= 1 shingle, and the predicate isn't free — pushdown moves it
        # below the fan-out exchange, re-deriving the whole shingle array
        # single-task on the unsplit scan (measured: the entire build ran
        # inside the pre-shuffle Filter node).
        .select("doc_id", F.array_distinct(sh).alias("shingles"))
        # explode a struct array built in ONE generator expression instead
        # of `select(size(shingles), explode(shingles))`: with separate
        # column refs the optimizer collapses the (expensive) shingle
        # array build into every consumer of `shingles`, re-deriving the
        # array per OUTPUT row — measured 6.5s vs 0.95s on sf0.1. Inside
        # a single transform() the array is bound once per input row.
        .select("doc_id", F.explode(F.expr(
            "transform(shingles, x -> struct(size(shingles) AS m, x AS sh))"
        )).alias("e"))
        .select("doc_id", F.col("e.m").alias("m"), F.col("e.sh").alias("sh"))
    )


def ngram_jaccard_query(spark: SparkSession, sf_dir: str,
                        max_shingle_docs: int | None = None) -> DataFrame:
    """Exact 3-gram Jaccard over candidate pairs sharing a shingle.

    Plan: explode (narrow) -> self-equi-join on shingle (one shuffle, only
    co-occurring shingles join) -> count fold -> filter. The cross product
    never materializes; worst case is bounded by shingle co-occurrence.

    ``max_shingle_docs`` is the skew guard that makes the co-occurrence
    bound real at corpus scale: a shingle present in k documents
    contributes k^2/2 join rows, so one boilerplate shingle shared by a
    million docs is a half-trillion-row skew bomb on a single join key.
    With the cap set, shingles whose document frequency exceeds it are
    dropped before the self-join (an extra count shuffle over the
    exploded rows, then a broadcast anti-join — the hot set is tiny by
    definition). Denominators keep the FULL per-doc shingle count, so
    reported Jaccard is a lower bound for pairs that shared hot shingles,
    and pairs co-occurring ONLY on hot shingles are missed — the standard
    recall-for-boundedness trade (hot shingles carry ~no signal). Default
    None preserves exact semantics (the oracle-checked form)."""
    sh = _shingles(_docs(spark, sf_dir))
    if max_shingle_docs is not None:
        hot = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("doc_freq"))
            .filter(F.col("doc_freq") > max_shingle_docs)
            .select("sh")
        )
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.m").alias("ma"),
            F.col("b.m").alias("mb"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        pairs.withColumn(
            "jaccard",
            F.round(
                F.col("common") / (F.col("ma") + F.col("mb") - F.col("common")), 4
            ),
        )
        .filter(F.col("jaccard") >= 0.2)
        .select("doc_a", "doc_b", "common", "jaccard")
    )


NGRAM_JACCARD_ORACLE = """
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sh_list AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
  FROM ws WHERE len(w) >= 3
), sh AS (
  SELECT doc_id, len(shingles) AS m, unnest(shingles) AS sh FROM sh_list
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.m AS ma, b.m AS mb,
         count(*) AS common
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b, common,
       round(common / (ma + mb - common), 4) AS jaccard
FROM pairs WHERE round(common / (ma + mb - common), 4) >= 0.2
"""


# ---------------------------------------------------------------- minhash

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS

# Affine-permutation constants for the md5-based hash family (seeded
# numpy run, inlined so the Spark query and the DuckDB oracle share the
# exact values): h_k(v) = (a_k * v + b_k) mod MINHASH_P over the 32-bit
# base hash v. a_k < 2^29 and v < 2^32 keep a_k*v + b_k < 2^62 — no
# overflow in either engine's signed 64-bit arithmetic.
MINHASH_P = 4294967311  # smallest prime > 2^32
MINHASH_A = (100475633, 108598941, 354495317, 390702117, 513480773,
             475346821, 15189745, 81051817, 342997325, 50528141,
             335740739, 392782841, 209401147, 323255107, 26173677,
             74023219)
MINHASH_B = (4178011221, 1797420674, 3678485705, 4213390698, 2036609137,
             2390513671, 262086744, 3296416979, 2766297076, 1832727815,
             354628395, 2103724405, 210052861, 3842146275, 704486856,
             2314466333)


def minhash_signatures(df: DataFrame, hash_impl: str = "md5") -> DataFrame:
    """16 min-hashes in one groupBy pass (single shuffle).

    hash_impl='md5' (default): each shingle gets ONE 32-bit base hash
    v(s) (first md5 word, big-endian), and the k-th min-hash applies an
    affine permutation h_k(v) = (a_k*v + b_k) mod p over it — the
    standard scheme (Spark MinHashLSH / datasketch use the same family):
    one md5 per shingle row instead of 16, per-function work is a bigint
    multiply-add, the agg state is 16 longs instead of 16 hex strings,
    and functions are pairwise-independent so bands keep the s^r
    collision profile. Every value is reproducible verbatim in DuckDB
    ('0x'||substr(md5) cast), so the whole pipeline gets a SQL oracle.
    hash_impl='xxhash64': the JVM-side production hash (engine-specific
    -> no oracle)."""
    sh = _shingles(df)
    if hash_impl == "xxhash64":
        aggs = [
            F.min(F.xxhash64(F.lit(k), F.col("sh"))).alias(f"h{k}")
            for k in range(N_HASHES)
        ]
    else:
        v = F.conv(F.substring(F.md5(F.col("sh")), 1, 8), 16, 10).cast("long")
        sh = sh.select("doc_id", v.alias("v"))
        aggs = [
            F.min((F.lit(MINHASH_A[k]) * F.col("v") + F.lit(MINHASH_B[k]))
                  % F.lit(MINHASH_P)).alias(f"h{k}")
            for k in range(N_HASHES)
        ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_query(spark: SparkSession, sf_dir: str,
                      hash_impl: str = "md5",
                      max_bucket_docs: int | None = None) -> DataFrame:
    """Banded LSH candidate pairs: 4 bands x 4 rows; a pair is a candidate
    iff any band's 4 row-hashes all collide. Plan: one groupBy shuffle for
    signatures + one equi-join shuffle on (band, sig) — never all-pairs.
    With the md5 hash impl the full pipeline is oracle-checked in DuckDB;
    pytest additionally validates recall against exact Jaccard.

    ``max_bucket_docs`` is the skew guard for degenerate buckets: a
    (band, sig) bucket of k docs emits k^2/2 pairs in one join task, and
    real corpora always have one (every empty/boilerplate doc shares a
    signature). Buckets larger than the cap are dropped before the
    self-join (count shuffle + broadcast anti-join on the tiny hot set);
    pairs inside an oversized bucket are still found through any of
    their other bands that collide, so recall degrades gracefully
    instead of one task OOMing. Default None = exact oracle semantics."""
    sigs = minhash_signatures(_docs(spark, sf_dir), hash_impl)
    hash_band = (
        (lambda *cs: F.xxhash64(*cs)) if hash_impl == "xxhash64"
        else (lambda *cs: F.md5(F.concat_ws("|", *cs)))
    )
    bands = []
    for b in range(N_BANDS):
        cols = [f"h{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        bands.append(
            F.struct(F.lit(b).alias("band"),
                     hash_band(*[F.col(c) for c in cols]).alias("sig"))
        )
    exploded = sigs.select(
        "doc_id", F.explode(F.array(*bands)).alias("bs")
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    if max_bucket_docs is not None:
        hot = (
            exploded.groupBy("band", "sig")
            .agg(F.count(F.lit(1)).alias("bucket_docs"))
            .filter(F.col("bucket_docs") > max_bucket_docs)
            .select("band", "sig")
        )
        exploded = exploded.join(F.broadcast(hot), ["band", "sig"], "left_anti")
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def _minhash_sig_sql() -> str:
    """DuckDB CTEs mirroring minhash_signatures(hash_impl='md5')."""
    hash_aggs = ", ".join(
        f"min(({MINHASH_A[k]} * v + {MINHASH_B[k]}) % {MINHASH_P}) AS h{k}"
        for k in range(N_HASHES)
    )
    return f"""
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sh_list AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
  FROM ws WHERE len(w) >= 3
), sh AS (
  SELECT doc_id, unnest(shingles) AS sh FROM sh_list WHERE len(shingles) > 0
), shw AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(sh), 1, 8) AS BIGINT) AS v
  FROM sh
), sigs AS (
  SELECT doc_id, {hash_aggs} FROM shw GROUP BY doc_id
)"""


def _minhash_bands_sql() -> str:
    parts = []
    for b in range(N_BANDS):
        cols = [f"h{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        expr = " || '|' || ".join(cols)
        parts.append(
            f"SELECT doc_id, {b} AS band, md5({expr}) AS sig FROM sigs"
        )
    return " UNION ALL ".join(parts)


MINHASH_LSH_ORACLE = (
    _minhash_sig_sql()
    + f""", bands AS (
  {_minhash_bands_sql()}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
"""
)


# ---------------------------------------------------------------- simhash

SIMHASH_BITS = 32


def _md5_bit_sign_sum(i: int) -> str:
    """SQL (valid in both Spark SQL and DuckDB) for the sign-sum of bit i
    of md5(word): bit i lives in hex digit i//4, nibble bit i%4. The digit
    is recovered via instr on the hex alphabet; the bit test is pure
    modular arithmetic (no engine-specific >> or // operators)."""
    pos = 1 + i // 4
    d = 1 << (i % 4)
    digit = f"(instr('0123456789abcdef', substring(h, {pos}, 1)) - 1)"
    return (
        f"sum(CASE WHEN ({digit} % {2 * d}) >= {d} THEN 1 ELSE -1 END) AS b{i}"
    )


def simhash_query(spark: SparkSession, sf_dir: str,
                  hash_impl: str = "md5") -> DataFrame:
    """32-bit SimHash: explode words once, aggregate 32 sign-sums, fold to
    a signature. One shuffle; aggregation is map-side-combinable.

    hash_impl='md5' (default) draws the 32 bits from the first 8 hex chars
    of md5(word), bit-for-bit reproducible in DuckDB -> full SQL oracle.
    hash_impl='xxhash64' is the faster JVM-side production variant."""
    df = _fan_out(_docs(spark, sf_dir), "doc_id")
    words = df.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    if hash_impl == "xxhash64":
        words = words.withColumn("h", F.xxhash64("w"))
        aggs = [
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{i}")
            for i in range(SIMHASH_BITS)
        ]
    else:
        words = words.withColumn("h", F.md5("w"))
        aggs = [F.expr(_md5_bit_sign_sum(i)) for i in range(SIMHASH_BITS)]
    sums = words.groupBy("doc_id").agg(*aggs)
    sig = None
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sums.select("doc_id", sig.cast("long").alias("simhash"))


def _simhash_oracle() -> str:
    aggs = ", ".join(_md5_bit_sign_sum(i) for i in range(SIMHASH_BITS))
    fold = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    )
    return f"""
WITH wrds AS (
  SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h FROM documents
), sums AS (
  SELECT doc_id, {aggs} FROM wrds GROUP BY doc_id
)
SELECT doc_id, CAST({fold} AS BIGINT) AS simhash FROM sums
"""


SIMHASH_ORACLE = _simhash_oracle()


# ------------------------------------------- exact substring spans (windows)

SUBSTR_W = 8  # window length in words; spans are unions of [pos, pos+W)


def _windows(df: DataFrame, hash_impl: str = "md5") -> DataFrame:
    """doc_id -> (pos, h): hash of every W-word window at word offset pos.

    Linear explode — one output row per word position. The transform's
    array is built once per input row inside the single generator
    expression (see _shingles for the projection-collapse trap this
    layout avoids)."""
    W = SUBSTR_W
    hfn = "xxhash64" if hash_impl == "xxhash64" else "md5"
    win = F.expr(
        f"transform(sequence(0, size(w) - {W}),"
        f" i -> {hfn}(concat_ws(' ', slice(w, i + 1, {W}))))"
    )
    return (
        _fan_out(df, "doc_id")
        .select("doc_id", F.split(F.col("text"), " ").alias("w"))
        .filter(F.size("w") >= W)
        .select("doc_id", F.posexplode(win).alias("pos", "h"))
    )


def substring_spans_query(spark: SparkSession, sf_dir: str,
                          hash_impl: str = "md5") -> DataFrame:
    """Exact duplicated-substring spans (the Lee et al. 2021 "Deduplicating
    Training Data Makes Language Models Better" signal, windowed): every
    W-word window whose content occurs >= 2 times ANYWHERE in the corpus
    (cross-document or a repeat inside one document) is duplicated; per
    document the duplicated window positions are merged into maximal spans
    and reported as (dup_windows, dup_spans, dup_tokens = union size).
    A downstream cleaner drops exactly those spans; suffix-array pipelines
    compute the same set for unbounded match lengths, this is the
    fixed-W streaming form that distributes.

    Plan/scale: the window explode is LINEAR — one row per word position,
    never a pair materialization (a window shared by k docs costs k rows,
    not k^2, so no skew guard is needed, unlike the shingle self-join).
    Three shuffles total: hash count (map-side combinable), count-back
    join on the hash, and the per-doc position sort — each keyed on a
    high-cardinality column. At 10^12-sequence scale you would put a
    count-min / Bloom prefilter in front of the count join to drop the
    ~95% singleton windows before they shuffle; semantics here are the
    exact oracle-checked form.

    hash_impl='md5' (default) is reproducible in DuckDB; 'xxhash64' is
    the cheaper JVM-side production hash (engine-specific, no oracle).
    """
    from pyspark.sql import Window

    W = SUBSTR_W
    wins = _windows(_docs(spark, sf_dir), hash_impl)
    dup_h = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("h")
    )
    d = wins.join(dup_h, "h").select("doc_id", "pos")
    gap = F.col("pos") - F.lag("pos").over(
        Window.partitionBy("doc_id").orderBy("pos")
    )
    g = d.withColumn("gap", gap)
    return g.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dup_windows"),
        F.sum(
            F.when(F.col("gap").isNull() | (F.col("gap") >= W), 1).otherwise(0)
        ).alias("dup_spans"),
        F.sum(
            F.when(F.col("gap").isNull(), W)
            .otherwise(F.least(F.lit(W), F.col("gap")))
        ).cast("long").alias("dup_tokens"),
    )


SUBSTRING_SPANS_ORACLE = f"""
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), wins AS (
  SELECT doc_id, u['pos'] AS pos, u['h'] AS h FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - {SUBSTR_W - 2}), i ->
             {{'pos': i - 1,
               'h': md5(array_to_string(w[i:i + {SUBSTR_W - 1}], ' '))}})) AS u
    FROM ws WHERE len(w) >= {SUBSTR_W}
  )
), dups AS (
  SELECT h FROM wins GROUP BY h HAVING count(*) >= 2
), d AS (
  SELECT w.doc_id, w.pos FROM wins w JOIN dups USING (h)
), g AS (
  SELECT doc_id, pos,
         pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS gap
  FROM d
)
SELECT doc_id,
       count(*) AS dup_windows,
       CAST(sum(CASE WHEN gap IS NULL OR gap >= {SUBSTR_W} THEN 1 ELSE 0 END)
            AS BIGINT) AS dup_spans,
       CAST(sum(CASE WHEN gap IS NULL THEN {SUBSTR_W}
                     WHEN gap >= {SUBSTR_W} THEN {SUBSTR_W}
                     ELSE gap END) AS BIGINT) AS dup_tokens
FROM g GROUP BY doc_id
"""


def substring_scrub_query(spark: SparkSession, sf_dir: str,
                          hash_impl: str = "md5") -> DataFrame:
    """Duplicated-substring REMOVAL (the cleaning step after
    substring_spans_query, Lee et al. 2021 semantics at word-window
    granularity): for every W-word window content that occurs >= 2 times
    in the corpus, the globally first occurrence — ordered by
    (doc_id, pos) — is kept and every other occurrence's W words are
    removed. Emits the full cleaned corpus: (doc_id, clean_text,
    n_removed), docs without duplicates passing through verbatim and a
    fully-duplicated doc collapsing to ''.

    Every stage is linear: window explode (one row per word position),
    row_number per window hash to pick the keeper (one shuffle+sort on
    the hash), marked windows expanded to exactly W covered word indices
    each, a word-level anti-join, and one per-doc reassembly sort. No
    per-doc O(words x spans) membership scan and no pair
    materialization anywhere, so the worst corpus (everything
    duplicated) still costs O(total words) rows per stage."""
    W = SUBSTR_W
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    wins = _windows(docs, hash_impl)
    rk = F.row_number().over(
        Window.partitionBy("h").orderBy("doc_id", "pos")
    )
    marked = wins.withColumn("rk", rk).filter(F.col("rk") > 1)
    removed = (
        marked.select(
            "doc_id",
            F.explode(F.expr(f"sequence(pos, pos + {W - 1})")).alias("idx"),
        )
        .distinct()
    )
    words = (
        _fan_out(docs, "doc_id")
        .select("doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("idx", "w"))
    )
    kept = words.join(removed, ["doc_id", "idx"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(idx, w))),"
            " s -> s.w), ' ')"
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        docs.select("doc_id", F.size(F.split(F.col("text"), " ")).alias("n_words"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            (F.col("n_words") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long").alias("n_removed"),
        )
    )


SUBSTRING_SCRUB_ORACLE = f"""
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), wins AS (
  SELECT doc_id, u['pos'] AS pos, u['h'] AS h FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - {SUBSTR_W - 2}), i ->
             {{'pos': i - 1,
               'h': md5(array_to_string(w[i:i + {SUBSTR_W - 1}], ' '))}})) AS u
    FROM ws WHERE len(w) >= {SUBSTR_W}
  )
), marked AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rk
    FROM wins
  ) WHERE rk > 1
), removed AS (
  SELECT DISTINCT doc_id, pos + j AS idx
  FROM marked, unnest(range(0, {SUBSTR_W})) AS t(j)
), words AS (
  SELECT doc_id, u['idx'] AS idx, u['w'] AS w FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) + 1), i ->
             {{'idx': i - 1, 'w': w[i]}})) AS u
    FROM ws
  )
), kept AS (
  SELECT words.* FROM words ANTI JOIN removed USING (doc_id, idx)
), agg AS (
  SELECT doc_id, string_agg(w, ' ' ORDER BY idx) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.clean_text, '') AS clean_text,
       CAST(len(string_split(d.text, ' ')) - coalesce(a.n_kept, 0) AS BIGINT)
         AS n_removed
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


# ------------------------------------------------- near-dup clustering (CC)

CLUSTER_THR = 0.42  # same threshold as similarity.embedding_near_dup_query


def near_dup_cluster_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the embedding
    near-dup graph, labeling each vector with the minimum vec_id reachable
    through pairs with cosine >= CLUSTER_THR. This is the step a training
    pipeline runs after pair generation — keep one representative per
    component, not per pair.

    Iterative label propagation (the standard large-CC dataflow on Spark,
    e.g. GraphFrames' connectedComponents): each round joins the current
    labels across the symmetrized edge list and takes the per-vertex min
    of (own label, neighbors' labels). Rounds needed = graph diameter in
    label-halving steps (near-dup components are tiny cliques, so 2-3);
    the loop exits when a one-row aggregate reports no label changed.
    Each round is one shuffle join + one aggregate on the EDGE list (far
    smaller than the corpus); vertices never all meet on one node. The
    intermediate label table is checkpoint-truncated via localCheckpoint
    to keep lineage bounded at high iteration counts.
    """
    from .similarity import embedding_near_dup_query

    vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id")
    pairs = embedding_near_dup_query(spark, sf_dir)
    edges = pairs.selectExpr("vec_a AS src", "vec_b AS dst").unionAll(
        pairs.selectExpr("vec_b AS src", "vec_a AS dst")
    )
    labels = vec.select(F.col("vec_id"), F.col("vec_id").alias("cluster_id"))
    changed = 1
    for _ in range(20):  # with pointer jumping this covers diameter ~2^20
        nbr = (
            edges.join(labels, edges.dst == labels.vec_id, "inner")
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels.vec_id == nbr.src, "left")
            .select(
                "vec_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        # pointer jumping: label(v) <- label(label(v)). Every label is
        # itself a vec_id, so one self-join halves the remaining chain
        # length — the edge-propagation rounds alone converge in diameter
        # steps, with the jump they converge in O(log diameter), so the
        # fixed round cap cannot silently truncate a long chain.
        parent = new_labels.select(
            F.col("vec_id").alias("p_id"), F.col("cluster_id").alias("p_label")
        )
        new_labels = (
            new_labels.join(parent, new_labels.cluster_id == parent.p_id, "left")
            .select(
                "vec_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("p_label"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vec_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # a silent partial labeling is wrong-by-construction — surface it
        raise RuntimeError(
            "near_dup_cluster did not converge within the round cap"
        )
    return labels.select("vec_id", "cluster_id")


NEAR_DUP_CLUSTER_ORACLE = f"""
WITH RECURSIVE edges AS (
  SELECT a.vec_id AS src, b.vec_id AS dst
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        >= {CLUSTER_THR}
), reach(id, r) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.src, reach.r FROM reach JOIN edges e ON e.dst = reach.id
)
SELECT id AS vec_id, min(r) AS cluster_id FROM reach GROUP BY id
"""
