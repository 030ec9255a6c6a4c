"""Task-side row masking of pushed filters (pgs reader, pushdown
opt-in): definitely-false rows never cross the Python->JVM boundary,
and Spark's exact re-filter still sees every row it could keep —
including the NaN/null cases where Spark's semantics differ from
IEEE/arrow."""

from __future__ import annotations

import math
import shutil

import pytest

from parquet_go_spark.sources.pgs_datasource import register


@pytest.fixture()
def store(spark, tmp_out):
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    rows = [
        (0, "alpha", 1.0), (1, "beta", float("nan")), (2, None, 5.5),
        (3, "alps", None), (4, "beta", -0.0), (5, "gamma", 9.25),
    ]
    df = spark.createDataFrame(rows, "k long, s string, x double")
    df.repartition(2).write.format("pgs").mode("overwrite").save(tmp_out)
    return tmp_out


def _read(spark, path):
    return (spark.read.format("pgs").option("pushdown", "true")
            .load(path))


@pytest.mark.parametrize("cond,want_ks", [
    ("k >= 4", {4, 5}),
    ("s = 'beta'", {1, 4}),
    ("s LIKE 'al%'", {0, 3}),
    ("x > 2.0", {1, 2, 5}),          # Spark: NaN > 2.0 is TRUE
    ("x = CAST('NaN' AS DOUBLE)", {1}),  # Spark: NaN = NaN is TRUE
    ("x = 0.0", {4}),                # -0.0 == 0.0
    ("x IS NULL", {3}),
    ("s IS NOT NULL AND k < 2", {0, 1}),
    ("k IN (1, 3, 9)", {1, 3}),
])
def test_filtered_reads_exact(spark, store, cond, want_ks):
    got = {r["k"] for r in _read(spark, store).filter(cond).collect()}
    assert got == want_ks, cond


def test_rows_masked_before_the_boundary(spark, store):
    """Drive the reader directly: with a pushed EqualTo only the
    matching rows come out of read() — the mask ran task-side, not in
    the JVM re-filter."""
    from pyspark.sql.datasource import EqualTo
    from pyspark.sql.types import StructType

    from parquet_go_spark.sources.pgs_datasource import (
        PGSPruningReader, _meta,
    )

    schema = StructType.fromJson(_meta(store)["schema_json"])
    rdr = PGSPruningReader(store, schema, {})
    rdr.pushFilters([EqualTo(("k",), 3)])
    out = [
        row
        for p in rdr.partitions()
        for b in rdr.read(p)
        for row in b.to_pylist()
    ]
    assert [r["k"] for r in out] == [3]


def test_unsupported_value_types_keep_rows(spark, store):
    """A filter the mask can't evaluate must keep everything (Spark
    still filters exactly); exercised via the direct reader with a
    value arrow can't compare against strings."""
    from pyspark.sql.datasource import EqualTo
    from pyspark.sql.types import StructType

    from parquet_go_spark.sources.pgs_datasource import (
        PGSPruningReader, _meta,
    )

    schema = StructType.fromJson(_meta(store)["schema_json"])
    rdr = PGSPruningReader(store, schema, {})
    rdr.pushFilters([EqualTo(("s",), 12345)])  # int vs string column
    out = [
        row
        for p in rdr.partitions()
        for b in rdr.read(p)
        for row in b.to_pylist()
    ]
    assert len(out) == 6  # nothing dropped


def test_nan_rows_survive_the_mask(spark, store):
    """The mask may not drop the NaN row under >, >=, =, IN (Spark's
    total order keeps it); checked at the boundary, not just at the
    final result."""
    from pyspark.sql.datasource import GreaterThan
    from pyspark.sql.types import StructType

    from parquet_go_spark.sources.pgs_datasource import (
        PGSPruningReader, _meta,
    )

    schema = StructType.fromJson(_meta(store)["schema_json"])
    rdr = PGSPruningReader(store, schema, {})
    rdr.pushFilters([GreaterThan(("x",), 100.0)])
    out = [
        row
        for p in rdr.partitions()
        for b in rdr.read(p)
        for row in b.to_pylist()
    ]
    assert any(r["x"] is not None and math.isnan(r["x"]) for r in out)
    # and nothing else (1.0, 5.5, -0.0, 9.25 are definitely-false;
    # the null-x row fails every comparison)
    assert len(out) == 1
