"""Gap-based sessionization: break semantics, tie determinism, and the
single-exchange plan (the final per-session agg must reuse the window's
partitioning)."""

from __future__ import annotations

import datetime

from parquet_go_spark.operators.sessions import sessionize


def _t(s):
    return datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=s)


def test_sessionize_gap_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, 10, _t(0)), (1, 11, _t(100)),        # gap 100 <= 120: s1
            (1, 12, _t(100 + 121)),                  # gap 121 > 120: s2
            (1, 13, _t(100 + 121 + 120)),            # gap == 120: stays
            (2, 20, _t(0)),                          # other key: s1
        ],
        "k int, eid int, ts timestamp",
    )
    got = {
        (r["k"], r["eid"]): r["session_no"]
        for r in sessionize(df, "k", "ts", 120,
                            order_tiebreak="eid").collect()
    }
    assert got == {(1, 10): 1, (1, 11): 1, (1, 12): 2, (1, 13): 2,
                   (2, 20): 1}


def test_sessionize_subsecond_gap(spark):
    """Gaps are exact microseconds: 120.5s > 120 must break even though
    whole-second truncation reads it as 120 (the unix_timestamp bug),
    and 120.0s exactly must NOT break; TIMESTAMP_NTZ works too."""
    us = datetime.timedelta(microseconds=1)
    df = spark.createDataFrame(
        [
            (1, 10, _t(0)),
            (1, 11, _t(120) + 500_000 * us),   # 120.5s > 120: break
            (1, 12, _t(240) + 500_000 * us),   # exactly 120s: stays
        ],
        "k int, eid int, ts timestamp",
    )
    for cast_ntz in (False, True):
        d = df
        if cast_ntz:
            d = df.selectExpr("k", "eid",
                              "CAST(ts AS TIMESTAMP_NTZ) AS ts")
        got = {
            r["eid"]: r["session_no"]
            for r in sessionize(d, "k", "ts", 120,
                                order_tiebreak="eid").collect()
        }
        assert got == {10: 1, 11: 2, 12: 2}, cast_ntz


def test_sessionize_tie_determinism(spark):
    # equal timestamps: the tiebreak column orders them, so the break
    # assignment is stable across shuffles/retries
    rows = [(1, i, _t(0)) for i in range(50)]
    df = spark.createDataFrame(rows, "k int, eid int, ts timestamp")
    out = sessionize(df, "k", "ts", 60, order_tiebreak="eid")
    assert {r["session_no"] for r in out.collect()} == {1}


def test_sessionize_plan_single_exchange(spark):
    from parquet_go_spark.operators.sessions import sessionize_query

    df = sessionize_query(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
