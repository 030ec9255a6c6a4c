"""Watermarked event-time window aggregation: exactly-once append
emission, late-data dropping past the watermark, and composition into
the pgs streaming sink."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from parquet_go_spark.sources.pgs_datasource import register
from parquet_go_spark.streaming.windows import windowed_agg

_SCHEMA = "ts timestamp, k string, v long"


def _write_rows(spark, path, rows):
    # determinism comes from the run-per-batch availableNow drains in
    # each test (one checkpointed run() per write), not from any
    # file-per-trigger option
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _ts(s):
    import datetime

    return datetime.datetime(2026, 1, 1, 10, 0, 0) + datetime.timedelta(
        seconds=s
    )


def test_windowed_agg_watermark_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "in")

    emitted: list = []

    def run():
        """One availableNow drain; watermark state persists in the
        checkpoint across runs, so run boundaries ARE batch boundaries
        (deterministic — file-source intra-run ordering is not)."""
        stream = spark.readStream.schema(_SCHEMA).parquet(src)
        agg = windowed_agg(
            stream, "ts", "5 minutes", "5 minutes",
            aggs={"n": F.count(F.lit(1)), "sv": F.sum("v")},
        )
        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: emitted.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # run 1: three rows in [10:00:00, 10:10:00) windows plus a row at
    # 10:30 that advances the watermark (10:30 - 5 min = 10:25) past
    # both early windows' ends
    _write_rows(spark, src, [
        (_ts(10), "a", 1), (_ts(70), "a", 2), (_ts(340), "b", 4),
        (_ts(1800), "a", 8),
    ])
    run()
    # run 2: a LATE row for the already-finalized first window — must
    # be dropped, not double-counted
    _write_rows(spark, src, [(_ts(20), "a", 100)])
    run()
    got = {
        (r["w_start"].isoformat(), r["n"], r["sv"]) for r in emitted
    }
    # finalized windows carry ONLY batch-1 rows: the late (10:00:20, 100)
    # row arrived after the watermark passed its window's end
    assert got == {
        ("2026-01-01T10:00:00", 2, 3),   # [10:00, 10:05): rows at 10,70
        ("2026-01-01T10:05:00", 1, 4),   # [10:05, 10:10): row at 340
    }, got
    # the 10:30 window is still open (watermark hasn't passed its end):
    # append mode must not have emitted it
    assert all(n != 1 or sv != 8 for _, n, sv in got)


def test_windowed_agg_composes_into_pgs_sink(spark, tmp_path):
    register(spark)
    src = str(tmp_path / "in")
    store = str(tmp_path / "win_store")
    shutil.rmtree(store, ignore_errors=True)

    def run():
        stream = spark.readStream.schema(_SCHEMA).parquet(src)
        agg = windowed_agg(
            stream, "ts", "5 minutes", "1 minute", keys=["k"],
            aggs={"n": F.count(F.lit(1)), "sv": F.sum("v")},
        )
        q = (
            agg.writeStream.outputMode("append").format("pgs")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start(store)
        )
        q.awaitTermination(180)

    _write_rows(spark, src, [
        (_ts(10), "a", 1), (_ts(70), "b", 2), (_ts(340), "a", 4),
        (_ts(2000), "a", 0),  # watermark driver
    ])
    run()
    _write_rows(spark, src, [(_ts(3000), "b", 0)])  # emit closed wins
    run()
    back = spark.read.format("pgs").load(store)
    rows = {(r["k"], r["w_start"].isoformat(), r["n"], r["sv"])
            for r in back.collect()}
    # finalized per-key windows (watermark 10:32:20 after run 1 closes
    # the two early windows; run 2's 10:50 row pushes it to 10:49,
    # closing the 10:30 window as well — only 10:50's own stays open)
    assert rows == {
        ("a", "2026-01-01T10:00:00", 1, 1),
        ("b", "2026-01-01T10:00:00", 1, 2),
        ("a", "2026-01-01T10:05:00", 1, 4),
        ("a", "2026-01-01T10:30:00", 1, 0),
    }, rows
    assert {"w_start", "w_end", "k", "n", "sv"} <= set(back.columns)
