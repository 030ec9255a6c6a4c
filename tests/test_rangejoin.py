"""Bucketized range join: semantics vs a brute-force reference on
random intervals (boundary inclusivity, bucket-straddling intervals,
empty/zero-length intervals) and the no-nested-loop plan pin."""

from __future__ import annotations

import datetime

import numpy as np
import pytest

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
