"""Distributed prefix-sum base offsets — the shared kernel of every
global-ordering operator (pack_sequences, exact quantiles, curated
shuffle positions, vocabulary ranks): after a repartitionByRange, the
driver folds per-partition totals (ONE row per partition, metadata
scale) into cumulative base offsets that ride back as a broadcast join.

The caller MUST pin the ranged DataFrame (persist + materialize, or
localCheckpoint) BEFORE calling this and keep using that same pinned
frame afterwards: a lazy recompute of repartitionByRange resamples its
range boundaries, which silently shifts partition ids out from under
the collected offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def offsets_and_total(
    spark: SparkSession, pinned: DataFrame, weight: str | None = None
) -> tuple[DataFrame, int]:
    """Like :func:`base_offsets`, plus the grand total (= the offset one
    past the last partition) for callers that need the global count
    without a second pass (exact quantiles need n)."""
    agg = (F.count("*") if weight is None else F.sum(weight)).alias("t")
    totals = {
        r["pid"]: r["t"]
        for r in pinned.groupBy("pid").agg(agg).collect()
    }
    base, acc = [], 0
    for pid in sorted(totals):
        base.append((int(pid), acc))
        acc += int(totals[pid])
    df = spark.createDataFrame(base or [(0, 0)], "pid int, base long")
    return df, acc


def base_offsets(
    spark: SparkSession, pinned: DataFrame, weight: str | None = None
) -> DataFrame:
    """(pid int, base long): cumulative start offset of each partition
    of ``pinned`` (which must carry a ``pid`` column), in pid order —
    row counts by default, ``sum(weight)`` when a weight column is
    given. Join back with ``F.broadcast`` and add the in-partition
    running rank/sum."""
    return offsets_and_total(spark, pinned, weight)[0]
