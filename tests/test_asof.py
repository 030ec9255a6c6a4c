"""As-of join: semantics vs pandas.merge_asof on randomized data, tie
rules, null (no-predecessor) handling, and the single-exchange plan."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from parquet_go_spark.operators.asof import asof_join


def _frames(seed: int, n_left=400, n_right=150, n_keys=12):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_left),
        "t": rng.integers(0, 10_000, n_left),
        "eid": np.arange(n_left),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_right),
        "t": rng.integers(0, 10_000, n_right),
        "v": rng.integers(0, 1_000_000, n_right),
    })
    # unique per (key, time): as-of is ambiguous under ties
    right = right.drop_duplicates(["k", "t"]).reset_index(drop=True)
    return left, right


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_asof_matches_pandas_merge_asof(spark, seed):
    left, right = _frames(seed)
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right.rename(columns={"t": "rt"})),
            by="k", left_on="t", right_on="rt", value_cols=["v", "rt"],
        )
        .toPandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("t").reset_index(drop=True),
        right.sort_values("t").reset_index(drop=True),
        on="t", by="k", direction="backward", suffixes=("", "_r"),
    ).sort_values("eid").reset_index(drop=True)
    assert list(got["eid"]) == list(want["eid"])
    g = got["v"].astype("float64").fillna(-1)
    w = want["v"].astype("float64").fillna(-1)
    assert (g.values == w.values).all()


def test_asof_inclusive_and_null(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 99, "b"), (2, 5, "c")], "k int, t int, eid string"
    )
    right = spark.createDataFrame(
        [(1, 100, 7), (2, 6, 9)], "k int, rt int, v int"
    )
    rows = {
        r["eid"]: r["v"]
        for r in asof_join(left, right, "k", "t", "rt", ["v"]).collect()
    }
    assert rows == {"a": 7, "b": None, "c": None}  # inclusive at t == rt


def test_asof_null_right_time_never_matches(spark):
    """A NULL right timestamp sorts first ascending and used to be
    latched by last(ignorenulls) as a bogus predecessor for EVERY left
    row; DuckDB ASOF and merge_asof never match on NULL."""
    left = spark.createDataFrame([(1, 5, "a")], "k int, t int, eid string")
    right = spark.createDataFrame([(1, None, 9)], "k int, rt int, v int")
    rows = {
        r["eid"]: r["v"]
        for r in asof_join(left, right, "k", "t", "rt", ["v"]).collect()
    }
    assert rows == {"a": None}


def test_asof_null_by_key_never_matches(spark):
    """Spark's window partitionBy groups NULL keys together; an
    equality-keyed ASOF (DuckDB / merge_asof) never matches NULL=NULL —
    the left row must flow through with NULL values."""
    left = spark.createDataFrame([(None, 5, "a")],
                                 "k string, t int, eid string")
    right = spark.createDataFrame([(None, 4, 9)],
                                  "k string, rt int, v int")
    rows = {
        r["eid"]: r["v"]
        for r in asof_join(left, right, "k", "t", "rt", ["v"]).collect()
    }
    assert rows == {"a": None}


def test_asof_value_col_collision_refused(spark):
    import pytest

    left = spark.createDataFrame([(1, 5, 1.0)], "k int, t int, v double")
    right = spark.createDataFrame([(1, 4, 9)], "k int, rt int, v int")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "k", "t", "rt", ["v"])


def test_asof_plan_single_exchange(spark):
    left, right = _frames(0)
    df = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right.rename(columns={"t": "rt"})),
        by="k", left_on="t", right_on="rt", value_cols=["v"],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "Window" in plan
