"""Sessionization: split each user's event stream into sessions at
inactivity gaps — the standard event-pipeline primitive (and the batch
twin of Structured Streaming's session windows).

Plan: one hash exchange on the user key + an in-partition sort; the
session id is a running count of gap-breaks (lag + conditional cumsum),
both executed inside the same Window — no self-join, no explode,
linear in |events|. Session numbering is per user (user_id, session_no),
deterministic given a total order on (ts, event_id) — the event-id
tiebreak matters: ties on ts alone would make lag() nondeterministic.

At 100 TB: identical shape to the as-of join — one shuffle on the key;
hot users are the skew lever (AQE or pre-splitting by day with a
boundary merge pass).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Add a ``session_no`` column (1-based per key): a new session
    starts at the first event and whenever the gap since the previous
    event is > ``gap_seconds``."""
    from .rangejoin import _micros

    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    # gap measured in exact integer epoch-microseconds (unix_timestamp
    # truncates to whole seconds, which merged sessions whose true gap
    # was e.g. 1800.9s > 1800 — same bug class as the range-join
    # bucketing; the oracle diffs microseconds identically)
    mu = _micros(df, ts_col)
    prev = F.lag(mu).over(w)
    is_break = F.when(
        prev.isNull() | (mu - prev > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    return df.withColumn(
        "session_no",
        F.sum(is_break).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )


# --------------------------------------------------------------- driver query

_GAP_MIN = 30


def sessionize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-minute-gap sessions over events, folded to one row
    per session (exact integer aggregates; duration in whole seconds
    from timestamp arithmetic — identical in both engines)."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "user_id", "ts"
    )
    s = sessionize(ev, "user_id", "ts", _GAP_MIN * 60,
                   order_tiebreak="event_id")
    return s.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_eid"),
        F.max("event_id").alias("last_eid"),
        (F.unix_timestamp(F.max("ts"))
         - F.unix_timestamp(F.min("ts"))).alias("dur_s"),
    )


SESSIONIZE_ORACLE = f"""
WITH o AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_ts
  FROM events
),
b AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR date_diff('microsecond', prev_ts, ts)
                      > {_GAP_MIN * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS brk
  FROM o
),
s AS (
  SELECT user_id, event_id, ts,
         CAST(sum(brk) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_no
  FROM b
)
SELECT user_id, session_no,
       CAST(count(*) AS BIGINT) AS n_events,
       min(event_id) AS first_eid,
       max(event_id) AS last_eid,
       CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS dur_s
FROM s
GROUP BY user_id, session_no
"""
