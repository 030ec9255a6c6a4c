"""Event-time windowed aggregation with watermarked late-data handling
(SURVEY §2.9: N/A in the reference — a batch file library — mandated
here as the streaming-analytics surface of the engine).

``windowed_agg`` is the textbook Structured Streaming shape: a
watermark on the event-time column bounds state (windows older than
the watermark are finalized and their state dropped), tumbling or
sliding windows group rows by event time (not arrival time), and
append-mode output emits each window exactly once, when the watermark
passes its end. Rows arriving later than the watermark allows are
dropped — pinned by test, because silently double-counting late data
is the classic streaming-aggregation bug.

At 100 TB/day: state size = (#keys x #open windows), independent of
input volume; the aggregation is map-side combinable before the one
keyed shuffle; the watermark is what keeps the state store bounded —
without it every window stays open forever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    stream: DataFrame,
    ts_col: str,
    window: str,
    watermark: str,
    aggs: dict[str, Column] | None = None,
    keys: list[str] | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Watermarked event-time window aggregation (append-mode ready).

    aggs maps output column name -> aggregate Column (default: row
    count); keys adds grouping columns alongside the window; slide
    turns the tumbling window into a sliding one."""
    if aggs is None:
        aggs = {"n": F.count(F.lit(1))}
    g = [F.window(F.col(ts_col), window, slide) if slide
         else F.window(F.col(ts_col), window)]
    g += [F.col(k) for k in (keys or [])]
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*g)
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    # flatten the window struct: downstream sinks (including the pgs
    # store) see plain start/end timestamps
    rest = [c for c in out.columns if c != "window"]
    return out.select(
        F.col("window.start").alias("w_start"),
        F.col("window.end").alias("w_end"),
        *rest,
    )
