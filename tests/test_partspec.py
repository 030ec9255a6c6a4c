"""Hidden partitioning (operators/partspec.py): spec parsing, the
Spark-vs-Python transform twins (bucket hash per source type, truncate
negatives, temporal integer math), metadata-only pruning losslessness,
and actual pruning effectiveness."""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime

from pyspark.sql import functions as F

from parquet_go_spark.operators.partspec import (
    Transform,
    _py_value,
    _spark_value,
    encode_partitioned,
    hidden_candidates,
    parse_spec,
)


def test_parse_spec():
    ts = parse_spec("bucket(4, user_id), day(ts), truncate(10, k), identity(s)")
    assert [(t.kind, t.col, t.arg) for t in ts] == [
        ("bucket", "user_id", 4),
        ("day", "ts", None),
        ("truncate", "k", 10),
        ("identity", "s", None),
    ]


def _twin_check(spark, df, t: Transform, values):
    got = {
        r["v"]: r["pv"]
        for r in df.select(
            F.col(t.col).alias("v"), _spark_value(t).alias("pv")
        ).collect()
    }
    for v in values:
        assert got[v] == _py_value(t, v), (t, v, got[v], _py_value(t, v))


def test_transform_twins_match_spark(spark):
    longs = [0, 1, 7, -3, 123456789012]
    df = spark.createDataFrame([(v,) for v in longs], "x long")
    _twin_check(spark, df, Transform("bucket", "x", 8, "bigint"), longs)
    _twin_check(spark, df, Transform("truncate", "x", 10, "bigint"), longs)

    ints = [0, 5, -17, 2147483647]
    dfi = spark.createDataFrame([(v,) for v in ints], "x int")
    # int32 goes through Spark's 4-byte hashInt path, not the long path
    _twin_check(spark, dfi, Transform("bucket", "x", 8, "int"), ints)

    strs = ["", "a", "hello world", "abcdefghij_tail"]
    dfs = spark.createDataFrame([(v,) for v in strs], "x string")
    _twin_check(spark, dfs, Transform("bucket", "x", 8, "string"), strs)
    _twin_check(spark, dfs, Transform("truncate", "x", 4, "string"), strs)

    stamps = [
        datetime(1970, 1, 1, 0, 0, 0),
        datetime(2024, 1, 15, 13, 45, 30, 123456),
        datetime(1999, 12, 31, 23, 59, 59),
    ]
    dft = spark.createDataFrame(
        [(v,) for v in stamps], "x timestamp_ntz"
    )
    for kind in ("day", "hour", "year", "month"):
        _twin_check(
            spark, dft, Transform(kind, "x", None, "timestamp_ntz"), stamps
        )


def test_bucket_twin_non_power_of_two(spark):
    """Regression (round-2 advice, high): the numpy xxhash64 twins return
    UNSIGNED u64 while Spark's xxhash64 is a SIGNED long; pmod disagrees
    between the two views for every non-power-of-two N whenever the top
    hash bit is set. Pin N=3/5/10 across all three type branches."""
    longs = [0, 1, 7, -3, 42, 123456789012, -987654321]
    df = spark.createDataFrame([(v,) for v in longs], "x long")
    ints = [0, 5, 7, -17, 2147483647, -2147483648]
    dfi = spark.createDataFrame([(v,) for v in ints], "x int")
    strs = ["", "a", "hello world", "abcdefghij_tail", "7"]
    dfs = spark.createDataFrame([(v,) for v in strs], "x string")
    for n in (3, 5, 10):
        _twin_check(spark, df, Transform("bucket", "x", n, "bigint"), longs)
        _twin_check(spark, dfi, Transform("bucket", "x", n, "int"), ints)
        _twin_check(spark, dfs, Transform("bucket", "x", n, "string"), strs)


def test_null_partition_values_route_and_prune(spark):
    """Iceberg transforms map NULL source values to NULL partition
    values: rows with nulls must still be routed (null-safe join),
    survive the roundtrip, and be pruned away by eq/range predicates
    (NULL matches no predicate)."""
    import tempfile

    rows = [(i, None if i % 5 == 0 else i % 7, f"s{i % 3}" if i % 4 else None)
            for i in range(60)]
    df = spark.createDataFrame(rows, "k long, uid long, src string")
    tmp = tempfile.mkdtemp()
    try:
        store = encode_partitioned(
            spark, df, tmp, "bucket(5, uid), identity(src)"
        )
        meta = store.meta()
        # null tuples recorded in meta
        assert any(
            v[0] is None or v[1] is None
            for v in meta["partition_values"].values()
        )
        from parquet_go_spark.operators.pruned import (
            _decode_parts,
            _schema_of,
        )

        schema, atypes = _schema_of(df, df.columns)
        all_parts = sorted(int(p) for p in meta["partition_values"])
        dec = _decode_parts(spark, store, all_parts, df.columns,
                            schema, atypes)
        # no rows dropped by the partition routing
        assert dec.count() == 60
        assert dec.exceptAll(df).count() == 0
        assert df.exceptAll(dec).count() == 0

        # eq predicate never selects the NULL partitions
        cand = hidden_candidates(store, {"uid": ("eq", 3)})
        nulls = {int(p) for p, v in meta["partition_values"].items()
                 if v[0] is None}
        assert not (set(cand) & nulls)
        # range over identity(src) must not raise on None tuples
        cr = hidden_candidates(store, {"src": ("range", "s0", "s1")})
        snulls = {int(p) for p, v in meta["partition_values"].items()
                  if v[1] is None}
        assert not (set(cr) & snulls)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_partition_cardinality_guard(spark):
    """identity() on a high-NDV column must refuse, not OOM the driver."""
    import pytest

    df = spark.range(0, 500).select(F.col("id").alias("k"))
    tmp = tempfile.mkdtemp()
    try:
        with pytest.raises(ValueError, match="distinct partition tuples"):
            encode_partitioned(spark, df, tmp, "identity(k)",
                               max_partitions=100)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_truncate_negative_ints_iceberg_rule(spark):
    # Iceberg: truncate(10, -1) = -10 (floor, not toward zero)
    t = Transform("truncate", "x", 10, "bigint")
    assert _py_value(t, -1) == -10
    assert _py_value(t, -10) == -10
    assert _py_value(t, 9) == 0


def _mk_store(spark, tmp):
    rows = [
        (i, datetime(2024, 1, 1 + (i % 20), (i * 7) % 24, 0, 0), i % 11)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp_ntz, uid long")
    return df, encode_partitioned(
        spark, df, tmp, "day(ts), bucket(4, uid)"
    )


def test_hidden_candidates_lossless_and_pruning(spark):
    tmp = tempfile.mkdtemp()
    try:
        df, store = _mk_store(spark, tmp)
        meta = store.meta()
        n_parts = meta["num_parts"]
        assert n_parts > 8  # multiple days x buckets

        lo = datetime(2024, 1, 5)
        hi = datetime(2024, 1, 7, 23, 59, 59)
        cand = hidden_candidates(
            store, {"ts": ("range", lo, hi), "uid": ("eq", 3)}
        )
        # prunes: 3 days x 1 bucket out of 20 days x 4 buckets
        assert 0 < len(cand) <= 3
        # lossless: decode survivors + exact filter == plain filter
        from parquet_go_spark.operators.pruned import (
            _decode_parts,
            _schema_of,
        )

        schema, atypes = _schema_of(df, df.columns)
        dec = _decode_parts(
            spark, store, cand, df.columns, schema, atypes
        ).filter(
            F.expr(
                "ts >= TIMESTAMP_NTZ'2024-01-05 00:00:00' AND "
                "ts <= TIMESTAMP_NTZ'2024-01-07 23:59:59' AND uid = 3"
            )
        )
        exp = df.filter(
            F.expr(
                "ts >= TIMESTAMP_NTZ'2024-01-05 00:00:00' AND "
                "ts <= TIMESTAMP_NTZ'2024-01-07 23:59:59' AND uid = 3"
            )
        )
        assert dec.exceptAll(exp).count() == 0
        assert exp.exceptAll(dec).count() == 0
        assert exp.count() > 0

        # IN probe on the bucket column
        cin = hidden_candidates(store, {"uid": ("in", [3, 7])})
        assert set(cin) <= set(int(p) for p in
                               map(int, meta["partition_values"]))
        assert len(cin) < n_parts
        # range on a bucket transform constrains nothing (not monotone)
        call = hidden_candidates(store, {"uid": ("range", 0, 1)})
        assert len(call) == n_parts
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
