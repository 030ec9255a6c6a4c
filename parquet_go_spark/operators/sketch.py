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


def _oracle_sql() -> str:
    from .multimodal import _mulmod64_sql

    # Spark's xxhash64(BIGINT) = XXH64(8-byte LE value, seed 42),
    # unrolled for the one-lane length-8 case — each stage one CTE
    unions = " UNION ALL ".join(
        f"SELECT '{c}' AS name, "
        f"({c}::HUGEINT % 18446744073709551616) AS val "
        f"FROM lineitem WHERE {c} IS NOT NULL"
        for c in HLL_COLS
    )
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
    return f"""
WITH vals AS ({unions}),
s1 AS (SELECT name, {k1a} AS k1a FROM vals),
s2 AS (SELECT name, {k1b} AS k1b FROM s1),
s3 AS (SELECT name, {k1} AS k1 FROM s2),
s4 AS (SELECT name, {acc1} AS acc1 FROM s3),
s5 AS (SELECT name, {acc2} AS acc2 FROM s4),
s6 AS (SELECT name, {acc3} AS acc3 FROM s5),
s7 AS (SELECT name, {acc4} AS acc4 FROM s6),
s8 AS (SELECT name, {acc5} AS acc5 FROM s7),
s9 AS (SELECT name, {acc6} AS acc6 FROM s8),
s10 AS (SELECT name, {acc7} AS acc7 FROM s9),
hashed AS (SELECT name, ({h})::UBIGINT AS h FROM s10),
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
