"""Bucketized range join: semantics vs a brute-force reference on
random intervals (boundary inclusivity, bucket-straddling intervals,
empty/zero-length intervals) and the no-nested-loop plan pin."""

from __future__ import annotations

import datetime

import numpy as np
import pytest

from pyspark.sql import functions as F

from parquet_go_spark.operators.rangejoin import join_point_in_interval

_EPOCH = datetime.datetime(2026, 1, 1)


def _t(s: int) -> datetime.datetime:
    return _EPOCH + datetime.timedelta(seconds=int(s))


@pytest.mark.parametrize("seed,bucket", [(0, 600), (1, 600), (2, 37)])
def test_rangejoin_matches_bruteforce(spark, seed, bucket):
    rng = np.random.default_rng(seed)
    pts = [(i, _t(rng.integers(0, 50_000))) for i in range(300)]
    ivs = []
    for j in range(80):
        s = int(rng.integers(0, 50_000))
        # lengths from zero (matches nothing) up to one bucket
        ivs.append((j, _t(s), _t(s + int(rng.integers(0, bucket + 1)))))
    p = spark.createDataFrame(pts, "pid int, t timestamp")
    iv = spark.createDataFrame(ivs, "iid int, s timestamp, e timestamp")
    got = {
        (r["pid"], r["iid"])
        for r in join_point_in_interval(p, iv, "t", "s", "e",
                                        bucket).collect()
    }
    want = {
        (pid, iid)
        for pid, t in pts
        for iid, s, e in ivs
        if s <= t < e
    }
    assert got == want


def test_rangejoin_boundaries(spark):
    p = spark.createDataFrame(
        [(0, _t(0)), (1, _t(599)), (2, _t(600)), (3, _t(1199))],
        "pid int, t timestamp",
    )
    iv = spark.createDataFrame(
        [(0, _t(0), _t(600)),      # ends on a bucket boundary
         (1, _t(600), _t(600)),    # zero-length: matches nothing
         (2, _t(599), _t(601))],   # straddles the boundary
        "iid int, s timestamp, e timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in join_point_in_interval(p, iv, "t", "s", "e", 600).collect()
    }
    assert got == {(0, 0), (1, 0), (1, 2), (2, 2)}


def test_rangejoin_subsecond_boundary(spark):
    """An interval whose fractional-second end lands inside the first
    second of a bucket must still reach points in that bucket: with
    unix_timestamp (whole-second) bucketing, floor((trunc(e)-1)/b)
    computed the upper bucket one too low and the match was silently
    dropped (the exact re-filter can only remove rows)."""
    us = datetime.timedelta(microseconds=1)
    b = 10  # seconds
    p = spark.createDataFrame(
        [
            (0, _t(20) + 200_000 * us),   # in bucket 2, t < e
            (1, _t(20) + 500_000 * us),   # == e: excluded (exclusive)
            (2, _t(19)),                  # in bucket 1
        ],
        "pid int, t timestamp",
    )
    iv = spark.createDataFrame(
        # e = 20.5s: trunc(e) = 20 is the first second of bucket 2
        [(0, _t(5) + 300_000 * us, _t(20) + 500_000 * us)],
        "iid int, s timestamp, e timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in join_point_in_interval(p, iv, "t", "s", "e", b).collect()
    }
    assert got == {(0, 0), (2, 0)}

    # same semantics on TIMESTAMP_NTZ columns (the parquet tables' type;
    # unix_micros rejects it — the operator must route through the
    # timezone-free epoch diff)
    p_ntz = p.select("pid", F.col("t").cast("timestamp_ntz").alias("t"))
    iv_ntz = iv.select(
        "iid",
        F.col("s").cast("timestamp_ntz").alias("s"),
        F.col("e").cast("timestamp_ntz").alias("e"),
    )
    got_ntz = {
        (r["pid"], r["iid"])
        for r in join_point_in_interval(
            p_ntz, iv_ntz, "t", "s", "e", b
        ).collect()
    }
    assert got_ntz == {(0, 0), (2, 0)}


def test_rangejoin_plan_no_nested_loop(spark):
    p = spark.createDataFrame([(0, _t(0))], "pid int, t timestamp")
    iv = spark.createDataFrame(
        [(0, _t(0), _t(600))], "iid int, s timestamp, e timestamp"
    )
    df = join_point_in_interval(p, iv, "t", "s", "e", 600)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Join" in plan
