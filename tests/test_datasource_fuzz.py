"""Random-schema roundtrips through the native Spark source: the
Spark-level twin of tests/test_schema_fuzz.py. Each seed builds a
random top-level schema over Spark's type surface (including nested
struct/array/map and decimals), writes a random DataFrame through
``format("pgs")``, reads it back, and requires exact row equality.

This exercises what the arrow-level fuzz cannot: Spark-schema ->
arrow-schema conversion, the writer's per-task encode, schema
self-description in store meta, read-side batch assembly and
nullability relaxation — across schemas nobody hand-picked.

Comparison is via sorted ``to_json(struct(*))`` rows because Spark
refuses set operations over map-typed columns.
"""

from __future__ import annotations

import datetime
import decimal
import random

import pytest

from pyspark.sql import types as T

from parquet_go_spark.sources.pgs_datasource import register

_MAX_DEPTH = 2


def _rand_decimal(rng: random.Random) -> T.DecimalType:
    prec = rng.randrange(1, 39)
    return T.DecimalType(prec, rng.randrange(0, prec + 1))


def _rand_leaf(rng: random.Random) -> T.DataType:
    return rng.choice([
        T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
        T.FloatType(), T.DoubleType(), T.BooleanType(), T.StringType(),
        T.BinaryType(), T.DateType(), T.TimestampType(),
        T.TimestampNTZType(),
        _rand_decimal(rng),
    ])


def _rand_type(rng: random.Random, depth: int = 0) -> T.DataType:
    if depth >= _MAX_DEPTH or rng.random() < 0.5:
        return _rand_leaf(rng)
    kind = rng.randrange(3)
    if kind == 0:
        return T.ArrayType(_rand_type(rng, depth + 1))
    if kind == 1:
        return T.StructType([
            T.StructField(f"f{i}", _rand_type(rng, depth + 1))
            for i in range(rng.randrange(1, 4))
        ])
    return T.MapType(
        rng.choice([T.StringType(), T.LongType()]),
        _rand_type(rng, depth + 1),
    )


_INT_BOUNDS = {
    T.ByteType: (-128, 127),
    T.ShortType: (-(1 << 15), (1 << 15) - 1),
    T.IntegerType: (-(1 << 31), (1 << 31) - 1),
    T.LongType: (-(1 << 63), (1 << 63) - 1),
}


def _rand_value(rng: random.Random, t: T.DataType):
    if isinstance(t, tuple(_INT_BOUNDS)):
        lo, hi = _INT_BOUNDS[type(t)]
        r = rng.random()
        if r < 0.1:
            return rng.choice([lo, hi, 0])
        if r < 0.6:
            return rng.randrange(0, 17)
        return rng.randrange(lo, hi + 1)
    if isinstance(t, (T.FloatType, T.DoubleType)):
        # NaN would break JSON-equality; bit-exact NaN is pinned elsewhere
        if rng.random() < 0.3:
            return rng.choice([0.0, -1.5, float("inf"), float("-inf")])
        v = rng.uniform(-1e6, 1e6)
        return v
    if isinstance(t, T.BooleanType):
        return rng.random() < 0.5
    if isinstance(t, T.StringType):
        return "".join(rng.choice("abz日 \t:9") for _ in range(rng.randrange(8)))
    if isinstance(t, T.BinaryType):
        return rng.randbytes(rng.randrange(8))
    if isinstance(t, T.DateType):
        return datetime.date(1970, 1, 1) + datetime.timedelta(
            days=rng.randrange(-3000, 40000))
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        return datetime.datetime(2010, 6, 1) + datetime.timedelta(
            seconds=rng.randrange(-10**8, 10**8),
            microseconds=rng.randrange(10**6))
    if isinstance(t, T.DecimalType):
        digits = rng.randrange(0, 10 ** t.precision)
        if rng.random() < 0.5:
            digits = -digits
        return decimal.Decimal(digits).scaleb(-t.scale)
    if isinstance(t, T.ArrayType):
        return [
            None if rng.random() < 0.12 else _rand_value(rng, t.elementType)
            for _ in range(rng.randrange(5))
        ]
    if isinstance(t, T.StructType):
        return tuple(
            None if rng.random() < 0.12 else _rand_value(rng, f.dataType)
            for f in t.fields
        )
    if isinstance(t, T.MapType):
        out = {}
        for _ in range(rng.randrange(4)):
            k = _rand_value(rng, t.keyType)
            out[k] = (None if rng.random() < 0.12
                      else _rand_value(rng, t.valueType))
        return out
    raise NotImplementedError(str(t))


def _json_rows(df) -> list[str]:
    return sorted(
        r.j for r in df.selectExpr("to_json(struct(*)) AS j").collect()
    )


@pytest.mark.parametrize("seed", range(4))
def test_datasource_random_schema_roundtrip(spark, tmp_path, seed):
    register(spark)
    rng = random.Random(seed)
    schema = T.StructType([
        T.StructField(f"c{i}", _rand_type(rng))
        for i in range(rng.randrange(2, 5))
    ])
    n = rng.randrange(40, 160)
    rows = [
        tuple(
            None if rng.random() < 0.15 else _rand_value(rng, f.dataType)
            for f in schema.fields
        )
        for _ in range(n)
    ]
    df = spark.createDataFrame(rows, schema).repartition(3)
    path = str(tmp_path / "store")
    w = df.write.format("pgs").mode("overwrite")
    if rng.random() < 0.5:
        w = w.option("page_rows", "16")
    w.save(path)
    got = spark.read.format("pgs").load(path)
    assert [f.name for f in got.schema.fields] == \
        [f.name for f in schema.fields], f"seed {seed}: column names"
    exp_rows = _json_rows(df)
    got_rows = _json_rows(got)
    assert got_rows == exp_rows, (
        f"seed {seed}: roundtrip mismatch over {schema.simpleString()}"
    )

    # random pushed filters on leaf columns: stats / page-index / bloom
    # pruning must stay lossless whatever the column type (Spark
    # re-evaluates exactly; only wrongly-dropped partitions could show)
    from pyspark.sql import functions as F

    leafs = [
        (f.name, f.dataType) for f in schema.fields
        if not isinstance(f.dataType,
                          (T.ArrayType, T.MapType, T.StructType))
    ]
    data = {name: [r[i] for r in rows if r[i] is not None]
            for i, (name, _) in enumerate(
                (f.name, f.dataType) for f in schema.fields)
            if name in {n for n, _ in leafs}}
    for _ in range(3):
        if not leafs:
            break
        name, dt = rng.choice(leafs)
        vals = data.get(name) or []
        kind = rng.randrange(5)
        if kind == 0 or not vals:
            pred = F.col(name).isNotNull()
        elif kind == 1:
            pred = F.col(name) == F.lit(rng.choice(vals))
        elif kind == 2:
            pred = F.col(name) >= F.lit(rng.choice(vals))
        elif kind == 3:
            pred = F.col(name) < F.lit(rng.choice(vals))
        else:
            pred = F.col(name).isin(
                [rng.choice(vals) for _ in range(rng.randrange(1, 4))])
        assert _json_rows(got.filter(pred)) == _json_rows(df.filter(pred)), (
            f"seed {seed}: filtered read mismatch on {name} "
            f"({dt.simpleString()}) pred kind {kind}"
        )

    # virtual row-address columns: filters on _pgs_part / _pgs_pos prune
    # partitions and pages; a filtered read must equal the client-side
    # filter of the unfiltered with_pos read (self-consistency — the
    # addresses are store-assigned, so the store itself is the oracle)
    wp = spark.read.format("pgs").option("with_pos", "true").load(path)
    base = _json_rows(wp)
    import json as _json

    parts = sorted({_json.loads(r)["_pgs_part"] for r in base})
    pivot_part = rng.choice(parts)
    pivot_pos = rng.randrange(0, max(1, n // 3))
    for pred_sql, keepfn in [
        (f"_pgs_part = {pivot_part}",
         lambda r: r["_pgs_part"] == pivot_part),
        (f"_pgs_pos >= {pivot_pos}",
         lambda r: r["_pgs_pos"] >= pivot_pos),
        (f"_pgs_part >= {pivot_part} AND _pgs_pos < {pivot_pos}",
         lambda r: r["_pgs_part"] >= pivot_part
         and r["_pgs_pos"] < pivot_pos),
    ]:
        exp = sorted(r for r in base if keepfn(_json.loads(r)))
        assert _json_rows(wp.filter(pred_sql)) == exp, (
            f"seed {seed}: virtual-column filter mismatch [{pred_sql}]"
        )
