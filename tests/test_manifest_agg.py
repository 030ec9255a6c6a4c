"""Manifest-only aggregates (Iceberg aggregate-pushdown analog):
count/null_count/min/max answered from chunk metadata with ZERO blob
reads — and a hard refusal whenever the manifest would only be an
approximation (deletes, evolution, truncated string bounds)."""

from __future__ import annotations

import math
import shutil

import pytest
from pyspark.sql import functions as F

from parquet_go_spark.operators.deletes import delete_values, delete_where
from parquet_go_spark.operators.evolve import add_column
from parquet_go_spark.sources.pgs_datasource import (
    manifest_aggregates,
    register,
)


def _write(spark, path, df, parts=3):
    register(spark)
    shutil.rmtree(path, ignore_errors=True)
    df.repartition(parts).write.format("pgs").mode("overwrite").save(path)


def _spark_aggs(df, col):
    r = df.agg(
        F.count(F.lit(1)).alias("cnt"),
        (F.count(F.lit(1)) - F.count(col)).alias("nulls"),
        F.min(col).alias("lo"),
        F.max(col).alias("hi"),
    ).collect()[0]
    return r["cnt"], r["nulls"], r["lo"], r["hi"]


def test_matches_scan_with_nulls(spark, tmp_out):
    df = spark.range(0, 500).selectExpr(
        "id AS k",
        "CASE WHEN id % 7 = 0 THEN NULL ELSE CAST(id * 0.25 - 31 AS DOUBLE)"
        " END AS v",
        "CASE WHEN id % 11 = 0 THEN NULL ELSE concat('s-', id % 40)"
        " END AS name",
    )
    _write(spark, tmp_out, df)
    for c in ["k", "v", "name"]:
        (a,) = manifest_aggregates(tmp_out, [c])
        cnt, nulls, lo, hi = _spark_aggs(df, c)
        assert (a["count"], a["nulls"], a["min"], a["max"]) == (
            cnt, nulls, lo, hi), c


def test_nan_pins_max(spark, tmp_out):
    df = spark.range(0, 100).selectExpr(
        "id AS k",
        "CASE WHEN id = 57 THEN CAST('NaN' AS DOUBLE)"
        " WHEN id = 3 THEN CAST('-Infinity' AS DOUBLE)"
        " ELSE CAST(id AS DOUBLE) END AS v",
    )
    _write(spark, tmp_out, df)
    (a,) = manifest_aggregates(tmp_out, ["v"])
    # engine total order: NaN greatest (Spark max() agrees)
    assert math.isnan(a["max"])
    assert a["min"] == float("-inf")
    got = spark.read.format("pgs").load(tmp_out).agg(
        F.min("v"), F.max("v")).collect()[0]
    assert got[0] == a["min"] and math.isnan(got[1])


def test_empty_string_is_an_attained_bound(spark, tmp_out):
    # "" doubles as the missing-stats sentinel in the manifest; for
    # string columns it is a legal attained min and must NOT refuse
    df = spark.range(0, 40).selectExpr(
        "id AS k",
        "CASE WHEN id % 10 = 0 THEN '' ELSE concat('w-', id) END AS s",
    )
    _write(spark, tmp_out, df)
    (a,) = manifest_aggregates(tmp_out, ["s"])
    assert a["min"] == "" and a["max"] == "w-9" and a["count"] == 40


def test_all_null_column(spark, tmp_out):
    df = spark.range(0, 50).selectExpr(
        "id AS k", "CAST(NULL AS DOUBLE) AS v"
    )
    _write(spark, tmp_out, df)
    (a,) = manifest_aggregates(tmp_out, ["v"])
    assert a == {"col": "v", "count": 50, "nulls": 50,
                 "min": None, "max": None}


def test_refuses_truncated_string_bounds(spark, tmp_out):
    # > 64-byte strings: vmax is a rounded-up bound, not an attained
    # value — exact max is undecidable from the manifest
    df = spark.range(0, 80).selectExpr(
        "id AS k", "concat('p-', repeat('x', 100), id) AS name"
    )
    _write(spark, tmp_out, df)
    with pytest.raises(ValueError, match="truncated or unmarked"):
        manifest_aggregates(tmp_out, ["name"])
    # counts for OTHER columns still fine
    (a,) = manifest_aggregates(tmp_out, ["k"])
    assert a["count"] == 80 and a["max"] == 79


def test_refuses_deletes_and_evolution(spark, tmp_out):
    df = spark.range(0, 120).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v"
    )
    _write(spark, tmp_out, df)
    assert manifest_aggregates(tmp_out, ["k"])[0]["count"] == 120
    delete_where(spark, tmp_out, "k < 10")
    with pytest.raises(ValueError, match="tombstones"):
        manifest_aggregates(tmp_out, ["k"])

    _write(spark, tmp_out, df)  # fresh store
    keys = spark.createDataFrame([(5,)], "k long")
    delete_values(spark, tmp_out, keys, ["k"])
    with pytest.raises(ValueError, match="equality"):
        manifest_aggregates(tmp_out, ["k"])

    _write(spark, tmp_out, df)
    add_column(tmp_out, "w", "double", 1.5)
    with pytest.raises(ValueError, match="evolution"):
        manifest_aggregates(tmp_out, ["k"])


def test_temporal_bounds(spark, tmp_out):
    df = spark.range(0, 90).selectExpr(
        "id AS k",
        "to_date(concat('2026-01-', 1 + id % 28)) AS d",
        "timestamp_ntz'2026-03-01 00:00:00' "
        "+ make_interval(0,0,0,0,0,0,id*3.25) AS t",
    )
    _write(spark, tmp_out, df)
    for c in ["d", "t"]:
        (a,) = manifest_aggregates(tmp_out, [c])
        cnt, nulls, lo, hi = _spark_aggs(df, c)
        assert (a["count"], a["min"], a["max"]) == (cnt, lo, hi), c


def test_refuses_unsupported_bound_types(spark, tmp_out):
    df = spark.range(0, 30).selectExpr(
        "id AS k",
        "CAST(id AS DECIMAL(10,2)) AS dec",
        "timestamp'2026-01-01 00:00:00' "
        "+ make_interval(0,0,0,0,0,0,id) AS tl",
    )
    _write(spark, tmp_out, df)
    with pytest.raises(ValueError, match="unsupported type"):
        manifest_aggregates(tmp_out, ["dec"])
    with pytest.raises(ValueError, match="session timezone"):
        manifest_aggregates(tmp_out, ["tl"])
    with pytest.raises(ValueError, match="no column"):
        manifest_aggregates(tmp_out, ["zzz"])
