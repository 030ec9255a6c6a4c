"""As-of join: enrich each left row with the most recent right row at
or before its timestamp, per key — the state-lookup join of event
pipelines (trades x quotes, events x latest order). The reference has
no joins at all (SURVEY §2.7); Spark has no ASOF operator; DuckDB does,
which makes this operator exactly oracle-checkable.

Spark plan (the scalable shape): tag both sides, UNION them, and run a
single `last(right_payload, ignorenulls=True)` window per key ordered
by (time, right-before-left) — one hash exchange on the key, one
in-partition sort, no range-join explosion and no per-key driver work.
A naive inequality join (`l.key = r.key AND r.t <= l.t` + argmax) would
build |matches| intermediate rows per event; the union-window is linear
in |left| + |right|. At 100 TB the skew lever is the key distribution
(hot keys -> AQE skew handling or salting by time-bucket with a
boundary fix-up pass); the window itself is a running last, one pass.

Ties: rows on the right side sharing (key, time) are ambiguous — callers
pre-deduplicate (the driver query argmax-reduces orders per
(custkey, date)); at equal timestamps the right row sorts BEFORE the
left row, so the join is inclusive (l.t >= r.t), matching DuckDB's
ASOF semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str] | str,
    left_on: str,
    right_on: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward (most-recent-at-or-before) as-of join. Returns every
    left row plus ``value_cols`` from the matched right row (null when
    no right row at or before ``left_on`` exists for the key).
    ``by`` key column(s) must be named identically on both sides
    (pre-alias otherwise); right rows must be unique per (key, time)."""
    by = [by] if isinstance(by, str) else list(by)
    lcols = left.columns
    clash = set(value_cols) & set(lcols)
    if clash:
        # both sides would alias to the same output name -> an
        # AMBIGUOUS_REFERENCE time bomb for every downstream select
        raise ValueError(f"asof_join: value_cols collide with left "
                         f"columns: {sorted(clash)} (alias one side)")
    # a NULL right timestamp sorts FIRST ascending and would be latched
    # by last(ignorenulls) as a bogus "predecessor" for every left row;
    # DuckDB ASOF / merge_asof never match on NULL — drop such rows.
    # Same for NULL by-keys: the window's partitionBy groups NULLs into
    # ONE partition (Spark grouping semantics), so a NULL-key right row
    # would latch onto every NULL-key left row while an equality join
    # never matches NULL = NULL. Left rows keep flowing (null values).
    right = right.filter(F.col(right_on).isNotNull())
    for k in by:
        right = right.filter(F.col(k).isNotNull())
    lhs = left.select(
        *by,
        F.col(left_on).alias("__t"),
        F.lit(0).alias("__is_r"),
        F.lit(None).cast(
            right.select(F.struct(*value_cols).alias("s")).schema["s"].dataType
        ).alias("__rv"),
        F.struct(*lcols).alias("__lv"),
    )
    rhs = right.select(
        *by,
        F.col(right_on).alias("__t"),
        F.lit(1).alias("__is_r"),
        F.struct(*value_cols).alias("__rv"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("__lv"),
    )
    # right-before-left at equal time => inclusive (l.t >= r.t)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), F.col("__is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = lhs.unionByName(rhs).withColumn(
        "__match", F.last("__rv", ignorenulls=True).over(w)
    )
    out = u.filter(F.col("__is_r") == 0).select(
        *[F.col(f"__lv.{c}").alias(c) for c in lcols],
        *[F.col(f"__match.{c}").alias(c) for c in value_cols],
    )
    return out


# --------------------------------------------------------------- driver query

def join_asof_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event enriched with the user's most recent order at or
    before the event time. Orders argmax-deduplicated per
    (custkey, orderdate) first — as-of is ambiguous under timestamp
    ties, and both engines must break them identically."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", F.col("user_id").alias("key"), "ts"
    )
    od = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .groupBy(F.col("o_custkey").alias("key"), "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("asof_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("asof_totalprice"),
        )
    )
    j = asof_join(
        ev, od, by="key", left_on="ts", right_on="o_orderdate",
        value_cols=["asof_orderkey", "asof_totalprice", "o_orderdate"],
    )
    return j.select(
        "event_id",
        F.col("key").alias("user_id"),
        "ts",
        "asof_orderkey",
        "asof_totalprice",
        F.col("o_orderdate").alias("asof_orderdate"),
    )


JOIN_ASOF_ORACLE = """
WITH od AS (
  SELECT o_custkey AS key, o_orderdate,
         max(o_orderkey) AS asof_orderkey,
         max_by(o_totalprice, o_orderkey) AS asof_totalprice
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, e.ts,
       o.asof_orderkey, o.asof_totalprice,
       o.o_orderdate AS asof_orderdate
FROM events e ASOF LEFT JOIN od o
  ON e.user_id = o.key AND e.ts >= o.o_orderdate
"""
