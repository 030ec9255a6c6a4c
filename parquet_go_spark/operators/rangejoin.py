"""Range (interval-containment) join: match points to the intervals
containing them WITHOUT an equi-key. Spark plans a pure inequality join
as BroadcastNestedLoopJoin / CartesianProduct — O(|points| x
|intervals|) and a non-starter at scale; DuckDB has a dedicated
IEJoin, which makes the operator exactly oracle-checkable.

The scalable plan is bucketization: quantize time into fixed buckets no
narrower than the interval length, explode each interval into the (at
most two, for interval <= bucket) buckets it overlaps, and equi-join on
the bucket id before re-filtering the exact containment predicate. Each
point lives in exactly one bucket, so a (point, interval) pair can only
meet once — no dedup pass. One shuffle per side on the bucket key,
hash join, codegen filter; the fan-out factor is
ceil(interval/bucket) + 1 copies per interval, a constant.

At 100 TB the skew lever is bucket width: too narrow multiplies the
interval copies, too wide piles unrelated rows into one bucket — set it
to the dominant interval length (ceil'd), and salt pathological hot
buckets (a flash-crowd hour) with a secondary split on the point id.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def _micros(df: DataFrame, col: str) -> Column:
    """Exact integer epoch-microseconds of a timestamp column.
    unix_micros only accepts TIMESTAMP (ltz); for TIMESTAMP_NTZ use a
    timezone-free diff from the NTZ epoch instead of casting to ltz —
    an ltz cast goes through the session zone, which is not
    order-preserving across DST transitions."""
    if isinstance(df.schema[col].dataType, TimestampNTZType):
        return F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ'1970-01-01 00:00:00', `{col}`)"
        )
    return F.unix_micros(F.col(col))


def join_point_in_interval(
    points: DataFrame,
    intervals: DataFrame,
    t_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """Inner-join points (timestamp ``t_col``) to intervals
    ``[start_col, end_col)``. Returns the combined columns; points
    covered by no interval are absent (inner semantics)."""
    # Bucket on unix_micros, not unix_timestamp: unix_timestamp TRUNCATES
    # to whole seconds, so an interval whose fractional-second end lands
    # in the first second of a bucket computed its upper bucket one too
    # low — the exact re-filter can only drop rows, so that was a missed
    # match, not a false positive. Micros keep the arithmetic exact
    # integers (the double division below is exact for |micros| < 2^53,
    # i.e. until year ~2255).
    m = int(bucket_seconds) * 1_000_000
    p = points.withColumn(
        "__pb", F.floor(_micros(points, t_col) / m)
    )
    iv = intervals.filter(
        # also guards F.sequence against hi < lo (it would generate a
        # DESCENDING bucket range for an empty/inverted interval —
        # correct after the re-filter, but a copy blowup)
        F.col(end_col) > F.col(start_col)
    ).withColumn(
        "__ib",
        F.explode(F.sequence(
            F.floor(_micros(intervals, start_col) / m),
            # end is exclusive: an interval ending exactly on a bucket
            # boundary must not be copied into the next bucket
            F.floor((_micros(intervals, end_col) - 1) / m),
        )),
    )
    return (
        p.join(iv, (F.col("__pb") == F.col("__ib"))
               & (F.col(t_col) >= F.col(start_col))
               & (F.col(t_col) < F.col(end_col)))
        .drop("__pb", "__ib")
    )


# --------------------------------------------------------------- driver query

_SESSION_MIN = 30
_BUCKET = _SESSION_MIN * 60


def join_range_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range case on the events table itself: every 'purchase'
    opens a 30-minute attribution window [ts, ts + 30min); each event
    is joined to the windows containing it (no equi key — the classic
    interval-attribution join), then folded per event (count + exact
    extremes of the covering purchase ids) so the result stays compact
    and integer-exact."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    points = ev.select("event_id", "ts")
    windows = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr(f"INTERVAL {_SESSION_MIN} MINUTES"))
        .alias("w_end"),
    )
    j = join_point_in_interval(points, windows, "ts",
                               "w_start", "w_end", _BUCKET)
    return j.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_cover"),
        F.min("purchase_id").alias("min_pid"),
        F.max("purchase_id").alias("max_pid"),
        F.sum("purchase_id").alias("sum_pid"),
    )


JOIN_RANGE_ORACLE = f"""
SELECT e.event_id,
       CAST(count(*) AS BIGINT) AS n_cover,
       min(p.event_id) AS min_pid,
       max(p.event_id) AS max_pid,
       CAST(sum(p.event_id) AS BIGINT) AS sum_pid
FROM events e
JOIN (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
  ON e.ts >= p.ts
 AND e.ts < p.ts + INTERVAL {_SESSION_MIN} MINUTE
GROUP BY e.event_id
"""
