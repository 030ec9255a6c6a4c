"""Distinct-count sketches: HyperLogLog entirely in relational SQL.

At 100 TB, ``COUNT(DISTINCT key)`` shuffles every distinct value; the
planner questions that need cardinality (dictionary viability, join
side, bucket counts) only need an estimate. This computes a p=12
HyperLogLog (Flajolet et al. 2007, public) as PURE Spark SQL — the
hash is Spark's built-in ``xxhash64`` (JVM, codegen), register index,
rank, register max, and the raw estimate are relational expressions,
so the plan is one map-side-combinable groupBy(col, register): at most
4096 rows per column cross the shuffle regardless of input size.

Exactness contract (what makes a sketch oracle-checkable at all):
every compared column is exact integer arithmetic (register sum as
DECIMAL(38,0), zero-register count) or ONE correctly-rounded double
division of exact operands — bit-identical in Spark and DuckDB. The
oracle re-derives Spark's ``xxhash64(BIGINT)`` (XXH64 of the 8-byte LE
value, seed 42) in HUGEINT mod-2^64 CTEs, and the rank via
``length(bin(w))``, the twin of Spark's ``length(conv(w, 10, 2))``.

The bias-corrected estimate (linear counting uses ``ln``, whose last
ulp may differ between libms) lives in the Python helper
``hll_estimate``; pytest pins its accuracy against exact distincts,
the driver gate compares only the deterministic columns.

No analog in the reference (its only cardinality logic is the dict-cap
fallback, internal/layout/dictpage.go:161-195); this is the sketch a
table format's stats layer carries.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

P = 12
M = 1 << P  # 4096 registers
_MASK52 = (1 << 52) - 1

# alpha_m * m^2 * 2^53: alpha spelled as the same IEEE DOUBLE
# expression in both engines (decimal literals default to DECIMAL with
# engine-specific division rules — every operand is cast explicitly);
# m^2 * 2^53 = 2^77 is a power of two, exact as a double
_ALPHA_SQL = (
    "CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) "
    "+ CAST(1.079 AS DOUBLE) / CAST(4096.0 AS DOUBLE))"
)
_M2_POW53 = "CAST(151115727451828646838272.0 AS DOUBLE)"  # 2^77

HLL_COLS = ["l_orderkey", "l_partkey", "l_suppkey"]

# XXH64 primes (public xxHash spec)
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_SEED = 42  # Spark's xxhash64 default seed
_ACC0 = (_SEED + _P5 + 8) & ((1 << 64) - 1)


def hll_distinct_df(df: DataFrame, cols: list[str]) -> DataFrame:
    """(name, zero_registers, registers_sum DECIMAL(38,0), est_raw)
    per column. ``registers_sum`` = sum over all 4096 registers of
    2^(53 - rho) (empty register rho=0 contributes 2^53) — exact;
    ``est_raw`` = alpha * m^2 * 2^53 / registers_sum, uncorrected."""
    stack = ", ".join(f"'{c}', {c}" for c in cols)
    vals = df.selectExpr(
        f"stack({len(cols)}, {stack}) AS (name, v)"
    ).where("v IS NOT NULL")
    regs = (
        vals.selectExpr(
            "name",
            "shiftrightunsigned(xxhash64(v), 52) AS bucket",
            f"(xxhash64(v) & {_MASK52}L) AS w",
        )
        .selectExpr(
            "name", "bucket",
            "CASE WHEN w = 0 THEN 53 "
            "ELSE 53 - length(conv(w, 10, 2)) END AS rho",
        )
        .groupBy("name", "bucket")
        .agg({"rho": "max"})
        .withColumnRenamed("max(rho)", "r")
    )
    return (
        regs.selectExpr(
            "name",
            "CAST(shiftleft(1L, 53 - r) AS DECIMAL(38,0)) AS term",
        )
        .groupBy("name")
        .agg({"term": "sum", "*": "count"})
        .withColumnRenamed("sum(term)", "present_sum")
        .withColumnRenamed("count(1)", "present")
        .selectExpr(
            "name",
            f"CAST({M} - present AS BIGINT) AS zero_registers",
            f"CAST(present_sum + CAST({M} - present AS DECIMAL(38,0)) "
            f"* CAST(shiftleft(1L, 53) AS DECIMAL(38,0)) AS DECIMAL(38,0)) "
            "AS registers_sum",
        )
        .selectExpr(
            "name", "zero_registers",
            # as a string: exact in the cross-engine comparison (a
            # DECIMAL(38,0) survives Spark's collect but DuckDB's pandas
            # bridge floats it)
            "CAST(registers_sum AS STRING) AS registers_sum",
            f"(({_ALPHA_SQL}) * {_M2_POW53}) "
            "/ CAST(registers_sum AS DOUBLE) AS est_raw",
        )
    )


def hll_distinct_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketches over lineitem's key columns (driver-gate entry)."""
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return hll_distinct_df(df, HLL_COLS)


def hll_estimate(registers_sum: int, zero_registers: int) -> float:
    """Bias-corrected estimate from the exact sketch aggregates
    (driver-side; keeps ``ln`` out of the cross-engine comparison)."""
    est = (0.7213 / (1.0 + 1.079 / M)) * M * M * (1 << 53) \
        / float(registers_sum)
    if est <= 2.5 * M and zero_registers > 0:
        return M * math.log(M / zero_registers)
    return est


def _rotl_sql(z: str, r: int) -> str:
    """HUGEINT SQL for rotl64: the shifted-out high bits land in the
    low bits; the two parts share no bits, so + is |."""
    return (f"((({z}) * {1 << r}::HUGEINT) % 18446744073709551616 "
            f"+ ({z}) // {1 << (64 - r)}::HUGEINT)")


def _xor_shr_sql(z: str, r: int) -> str:
    return (f"xor(({z})::UBIGINT, (({z}) // {1 << r}::HUGEINT)::UBIGINT)"
            "::HUGEINT")


def xxh64_long_ctes(src: str, carry: str, val_expr: str,
                    prefix: str = "s") -> tuple[str, str]:
    """DuckDB CTE chain computing Spark's ``xxhash64(BIGINT)`` — XXH64
    of the 8-byte LE value, seed 42, unrolled for the one-lane length-8
    case — over ``src``. Returns (cte_sql, final_cte_name); the final
    CTE exposes ``carry`` plus the UBIGINT hash column ``h``. Shared by
    every sketch oracle that must reproduce Spark's hash exactly."""
    from .multimodal import _mulmod64_sql

    k1a = _mulmod64_sql("val", _P2)
    k1b = _rotl_sql("k1a", 31)
    k1 = _mulmod64_sql("k1b", _P1)
    acc1 = f"xor({_ACC0}::UBIGINT, k1::UBIGINT)::HUGEINT"
    acc2 = _rotl_sql("acc1", 27)
    acc3 = f"({_mulmod64_sql('acc2', _P1)} + {_P4}::HUGEINT) " \
           "% 18446744073709551616"
    acc4 = _xor_shr_sql("acc3", 33)
    acc5 = _mulmod64_sql("acc4", _P2)
    acc6 = _xor_shr_sql("acc5", 29)
    acc7 = _mulmod64_sql("acc6", _P3)
    h = _xor_shr_sql("acc7", 32)
    p = prefix
    sql = f"""{p}0 AS (SELECT {carry}, ({val_expr}) AS val FROM {src}),
{p}1 AS (SELECT {carry}, {k1a} AS k1a FROM {p}0),
{p}2 AS (SELECT {carry}, {k1b} AS k1b FROM {p}1),
{p}3 AS (SELECT {carry}, {k1} AS k1 FROM {p}2),
{p}4 AS (SELECT {carry}, {acc1} AS acc1 FROM {p}3),
{p}5 AS (SELECT {carry}, {acc2} AS acc2 FROM {p}4),
{p}6 AS (SELECT {carry}, {acc3} AS acc3 FROM {p}5),
{p}7 AS (SELECT {carry}, {acc4} AS acc4 FROM {p}6),
{p}8 AS (SELECT {carry}, {acc5} AS acc5 FROM {p}7),
{p}9 AS (SELECT {carry}, {acc6} AS acc6 FROM {p}8),
{p}10 AS (SELECT {carry}, {acc7} AS acc7 FROM {p}9),
{p}11 AS (SELECT {carry}, ({h})::UBIGINT AS h FROM {p}10)"""
    return sql, f"{p}11"


def _oracle_sql() -> str:
    # Spark's xxhash64(BIGINT) re-derived in HUGEINT CTEs (shared
    # spelling, xxh64_long_ctes)
    unions = " UNION ALL ".join(
        f"SELECT '{c}' AS name, {c}::HUGEINT AS v "
        f"FROM lineitem WHERE {c} IS NOT NULL"
        for c in HLL_COLS
    )
    hash_ctes, last = xxh64_long_ctes(
        "vals", "name", "v % 18446744073709551616"
    )
    return f"""
WITH vals AS ({unions}),
{hash_ctes},
hashed AS (SELECT name, h FROM {last}),
rank_ AS (
  SELECT name,
         (h // 4503599627370496) AS bucket,
         CASE WHEN (h % 4503599627370496::UBIGINT) = 0 THEN 53
              ELSE 53 - length(bin(h % 4503599627370496::UBIGINT))
         END AS rho
  FROM hashed
),
regmax AS (
  SELECT name, bucket, max(rho) AS r FROM rank_ GROUP BY name, bucket
),
agg AS (
  SELECT name,
         count(*) AS present,
         sum((1::HUGEINT << (53 - r))::DECIMAL(38,0)) AS present_sum
  FROM regmax GROUP BY name
)
SELECT name,
       CAST(4096 - present AS BIGINT) AS zero_registers,
       CAST(CAST(present_sum
            + (4096 - present)::DECIMAL(38,0)
              * (1::HUGEINT << 53)::DECIMAL(38,0)
            AS DECIMAL(38,0)) AS VARCHAR) AS registers_sum,
       (({_ALPHA_SQL}) * {_M2_POW53})
           / CAST(present_sum
                  + (4096 - present)::DECIMAL(38,0)
                    * (1::HUGEINT << 53)::DECIMAL(38,0) AS DOUBLE)
           AS est_raw
FROM agg
"""


HLL_DISTINCT_ORACLE = _oracle_sql()


# --------------------------------------------------- count-min sketch (CMS)

CMS_D = 4         # hash rows
CMS_W = 8192      # counters per row (power of two: bucket = low bits)
# row derivation: hash_i(v) = xxhash64(v XOR C_i) — XOR is ANSI-safe in
# Spark and exactly mirrored in the oracle; constants are splitmix64
# outputs of 1..4 (public PRNG, arbitrary distinct values)
CMS_ROW_XOR = [
    0x910A2DEC89025CC1, 0xBEEB8DA1658EEC67,
    0xF893A2EEA86BF4C6, 0x71C18690EE42C90B,
]


def _sgn(c: int) -> int:
    """64-bit constant as the signed two's-complement long Spark wants."""
    return c - (1 << 64) if c >= (1 << 63) else c


def cms_counters_df(df: DataFrame, col: str) -> DataFrame:
    """(row, bucket, cnt) counters of a d=4, w=8192 count-min sketch
    over ``col`` (Cormode & Muthukrishnan 2005, public) — pure
    relational: explode d derived hashes per value, one map-side-
    combinable groupBy. At most d*w rows survive regardless of input."""
    rows = ", ".join(
        f"{i}, (xxhash64(v ^ {_sgn(c)}L) & {CMS_W - 1}L)"
        for i, c in enumerate(CMS_ROW_XOR)
    )
    return (
        df.selectExpr(f"{col} AS v")
        .where("v IS NOT NULL")
        .selectExpr(f"stack({CMS_D}, {rows}) AS (row, bucket)")
        .groupBy("row", "bucket")
        .count()
        .withColumnRenamed("count", "cnt")
    )


def cms_estimate_df(counters: DataFrame, probes: DataFrame,
                    col: str) -> DataFrame:
    """(key, est) for each probe key: min over the d counters its hash
    rows land in. Absent counters mean a zero cell -> est 0. The
    estimate never undercounts (CMS guarantee); exact integer output."""
    rows = ", ".join(
        f"{i}, (xxhash64(k ^ {_sgn(c)}L) & {CMS_W - 1}L)"
        for i, c in enumerate(CMS_ROW_XOR)
    )
    addr = (
        probes.selectExpr(f"{col} AS k").distinct()
        .selectExpr("k", f"stack({CMS_D}, {rows}) AS (row, bucket)")
    )
    from pyspark.sql import functions as F

    return (
        addr.join(counters, ["row", "bucket"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
        .selectExpr("k AS key", "CAST(est AS BIGINT) AS est")
    )


def cms_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency estimates for a fixed probe set of part keys over
    lineitem — the heavy-hitter question ("how often does key X
    occur?") answered from d*w = 32k counters instead of a full
    count shuffle. Exact-integer output, oracle-identical."""
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    counters = cms_counters_df(df, "l_partkey")
    probes = df.selectExpr("l_partkey").where(
        f"l_partkey % 37 = 3"
    )
    return cms_estimate_df(counters, probes, "l_partkey")


def _cms_oracle_sql() -> str:
    hash_ctes, last = xxh64_long_ctes(
        "expanded", "orig, row",
        "xor(orig::UBIGINT, xc::UBIGINT)::HUGEINT", prefix="c",
    )
    phash_ctes, plast = xxh64_long_ctes(
        "pexpanded", "orig, row",
        "xor(orig::UBIGINT, xc::UBIGINT)::HUGEINT", prefix="q",
    )
    consts = ", ".join(
        f"({i}, {c}::UBIGINT)" for i, c in enumerate(CMS_ROW_XOR)
    )
    return f"""
WITH rowc(row, xc) AS (VALUES {consts}),
vals AS (
  SELECT l_partkey::UBIGINT AS orig FROM lineitem
  WHERE l_partkey IS NOT NULL
),
expanded AS (SELECT orig, row, xc FROM vals CROSS JOIN rowc),
{hash_ctes},
counters AS (
  SELECT row, (h % {CMS_W}::UBIGINT) AS bucket, count(*) AS cnt
  FROM {last} GROUP BY row, bucket
),
probes AS (
  SELECT DISTINCT l_partkey::UBIGINT AS orig FROM lineitem
  WHERE l_partkey % 37 = 3
),
pexpanded AS (SELECT orig, row, xc FROM probes CROSS JOIN rowc),
{phash_ctes},
addr AS (
  SELECT orig, row, (h % {CMS_W}::UBIGINT) AS bucket FROM {plast}
)
SELECT CAST(a.orig AS BIGINT) AS key,
       CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est
FROM addr a LEFT JOIN counters c USING (row, bucket)
GROUP BY a.orig
"""


CMS_TOPK_ORACLE = _cms_oracle_sql()


# ----------------------------------------------------- exact quantiles

# rational targets: rank = (num * (n-1)) // den is exact integer
# arithmetic in both engines (a float q*(n-1) could round differently)
QUANTILES = [(0, 1), (1, 4), (1, 2), (3, 4), (99, 100), (1, 1)]
QUANTILE_COLS = ["l_extendedprice", "l_quantity"]
_QPARTS = 32


def exact_quantiles_df(spark: SparkSession, df: DataFrame, col: str,
                       quantiles=None) -> DataFrame:
    """EXACT discrete quantiles of a numeric column, distributed: the
    value at 0-based rank ``(num*(n-1)) // den`` of the sorted column
    (lower/"disc" interpolation). The curation question ("what's the
    p99 document length?") answered without ``sort().collect()``:

      1. groupBy(value).count() — ONE shuffle, map-side combinable;
         only DISTINCT values survive it.
      2. range-partition the counts by value; cumulative ranks via a
         per-partition window plus per-partition totals broadcast back
         as base offsets (the pack_sequences distributed prefix sum —
         NO single-partition window anywhere).
      3. each distinct value owns a rank interval [cum-cnt, cum); the
         tiny target-rank list broadcast-joins against it.

    Returns (q_num, q_den, rank, value DOUBLE). Exact: every rank is
    integer arithmetic, so the oracle (row_number in DuckDB) matches
    bit-for-bit. No reference analog (its stats are min/max only,
    writer/pages.go); this is the stats-layer percentile a table
    format's planner wants."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    quantiles = quantiles or QUANTILES
    counts = (
        df.selectExpr(f"CAST({col} AS DOUBLE) AS v")
        .where("v IS NOT NULL")
        .groupBy("v").count()
        .withColumnRenamed("count", "cnt")
    )
    pc = (
        counts.repartitionByRange(_QPARTS, "v")
        .withColumn("pid", F.spark_partition_id())
        # pin the partition assignment: a lazy recompute of
        # repartitionByRange resamples its boundaries, which would
        # shift pids out from under the collected base offsets
        .localCheckpoint()
    )
    from ..plans.prefix import offsets_and_total

    base_df, n = offsets_and_total(spark, pc, weight="cnt")
    if n == 0:
        return spark.createDataFrame(
            [], "q_num int, q_den int, rank bigint, value double"
        )
    ranks = spark.createDataFrame(
        [(num, den, num * (n - 1) // den) for num, den in quantiles],
        "q_num int, q_den int, rank bigint",
    )
    w = (
        Window.partitionBy("pid").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    spans = (
        pc.withColumn("cum_in", F.sum("cnt").over(w))
        .join(F.broadcast(base_df), "pid")
        .selectExpr(
            "v", "base + cum_in - cnt AS lo", "base + cum_in AS hi"
        )
    )
    return (
        spans.join(
            F.broadcast(ranks),
            (F.col("lo") <= F.col("rank")) & (F.col("rank") < F.col("hi")),
        )
        .selectExpr("q_num", "q_den", "rank", "v AS value")
    )


def quantiles_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantiles of lineitem's price and quantity columns
    (driver-gate entry): one row per (column, quantile)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    parts = [
        exact_quantiles_df(spark, df, c).withColumn("name", F.lit(c))
        for c in QUANTILE_COLS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("name", "q_num", "q_den", "rank", "value")


def _quantiles_oracle_sql() -> str:
    qvals = ", ".join(f"({num}, {den})" for num, den in QUANTILES)
    selects = []
    for c in QUANTILE_COLS:
        selects.append(f"""
SELECT '{c}' AS name, q_num, q_den,
       (q_num * (n.c - 1)) // q_den AS rank, r.v AS value
FROM (VALUES {qvals}) qs(q_num, q_den)
CROSS JOIN (SELECT count(*) AS c FROM lineitem
            WHERE {c} IS NOT NULL) n
JOIN (SELECT CAST({c} AS DOUBLE) AS v,
             row_number() OVER (ORDER BY CAST({c} AS DOUBLE)) - 1 AS rk
      FROM lineitem WHERE {c} IS NOT NULL) r
  ON r.rk = (q_num * (n.c - 1)) // q_den""")
    return " UNION ALL ".join(selects)


QUANTILES_ORACLE = _quantiles_oracle_sql()
