"""Bit-identity verification between source and decoded tables.

Mirrors the reference's write->read->require.Equal roundtrip guarantee
(/root/reference/reader/read_test.go:366-391; AGENTS.md:35-36) at cluster
scale: order-insensitive, shuffle-minimal.

Two strategies:
  * checksum: one aggregate of bit_xor(xxhash64(all columns)) + count per
    side — a single scan each, no join, no sort; collision probability
    ~2^-64 per table. This is the 100 TB path.
  * exceptAll both ways — exact multiset equality, heavier (shuffle both
    sides); used in tests at small scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_checksum(df: DataFrame, columns: list[str] | None = None) -> tuple[int, int]:
    cols = columns or df.columns
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*[F.col(c) for c in cols])).alias("x"),
    ).collect()[0]
    return int(row["n"]), int(row["x"] or 0)


def bit_identical_checksum(a: DataFrame, b: DataFrame, columns: list[str] | None = None) -> bool:
    cols = columns or a.columns
    return table_checksum(a.select(cols)) == table_checksum(b.select(cols))


def bit_identical_exact(a: DataFrame, b: DataFrame, columns: list[str] | None = None) -> bool:
    cols = columns or a.columns
    a2, b2 = a.select(cols), b.select(cols)
    return a2.exceptAll(b2).isEmpty() and b2.exceptAll(a2).isEmpty()
