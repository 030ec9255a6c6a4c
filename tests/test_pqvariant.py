"""VARIANT through REAL parquet files (r3 verdict #4).

Layouts per the public VariantShredding.md spec (reference
marshal/variant_reconstruct.go:14-417 reads the same shapes):
unshredded group {metadata, value} and the recursive shredded
typed_value group. External referee: Spark's JVM variant reader
(to_json + variant_get) on engine-written bytes, and the engine
decoding Spark-written shredded files.
"""

import json
import os

import pyarrow as pa
import pytest

from parquet_go_spark import pqinterop, pqwriter
from parquet_go_spark import variant as V

ROWS = [
    {"a": 1, "s": "x", "extra": [1, 2, 3], "nest": {"b": 7, "keep": "y"}},
    {"a": "wrong-type", "s": "z", "nest": {"b": 8}},
    "plain-string",
    {"s": "only-s"},
    {"a": 5, "nest": "not-an-object"},
    {},
    [1, "two", None],
]
FIELDS = {"a": "int", "s": "string", "nest.b": "int"}


def _encode_rows(rows):
    metas, vals = [], []
    for r in rows:
        m, v = V.encode_variant(r)
        metas.append(m)
        vals.append(v)
    return metas, vals


def _canon(o):
    if isinstance(o, dict):
        return {k: _canon(o[k]) for k in sorted(o)}
    if isinstance(o, list):
        return [_canon(x) for x in o]
    return o


def test_spec_shred_merge_roundtrip_no_spark():
    metas, vals = _encode_rows(ROWS)
    srows = V.shred_spec_rows(metas, vals, FIELDS)
    arr = pa.array(srows, V.spec_struct_type(FIELDS))
    merged = V.merge_spec_rows(arr.to_pylist(), FIELDS)
    assert merged == ROWS
    # mismatched type lands in the per-FIELD residual (spec), not the
    # top residual
    r1 = arr[1].as_py()
    assert r1["typed_value"]["a"]["typed_value"] is None
    assert r1["typed_value"]["a"]["value"] is not None
    # fully-shredded object: top residual is null
    r3 = arr[3].as_py()
    assert r3["value"] is None and r3["typed_value"] is not None
    # non-object row: typed_value group is null
    r2 = arr[2].as_py()
    assert r2["typed_value"] is None and r2["value"] is not None


def test_engine_writes_variant_spark_reads(spark, tmp_path):
    metas, vals = _encode_rows(ROWS)
    want = [json.dumps(_canon(r), separators=(",", ":")) for r in ROWS]

    # unshredded group {metadata, value}
    t1 = pa.table({
        "id": pa.array(range(len(ROWS)), pa.int64()),
        "v": pa.array(
            [{"metadata": m, "value": v} for m, v in zip(metas, vals)],
            pa.struct([pa.field("metadata", pa.binary(), False),
                       pa.field("value", pa.binary(), False)])),
    })
    p1 = str(tmp_path / "unshred.parquet")
    pqwriter.write_table(t1, p1, logical_types={"v": "variant"})
    df1 = spark.read.parquet(p1)
    assert df1.schema["v"].dataType.typeName() == "variant"
    got = [r["j"] for r in df1.selectExpr("id", "to_json(v) AS j")
           .orderBy("id").collect()]
    assert got == want

    # shredded typed_value layout
    t2 = pa.table({
        "id": pa.array(range(len(ROWS)), pa.int64()),
        "v": pa.array(V.shred_spec_rows(metas, vals, FIELDS),
                      V.spec_struct_type(FIELDS)),
    })
    p2 = str(tmp_path / "shred.parquet")
    pqwriter.write_table(t2, p2, logical_types={"v": "variant"})
    df2 = spark.read.parquet(p2)
    got2 = [r["j"] for r in df2.selectExpr("id", "to_json(v) AS j")
            .orderBy("id").collect()]
    assert got2 == want
    picks = df2.selectExpr(
        "id", "try_variant_get(v, '$.a', 'long') AS a",
        "try_variant_get(v, '$.nest.b', 'long') AS b") \
        .orderBy("id").collect()
    for r, src in zip(picks, ROWS):
        sa = src.get("a") if isinstance(src, dict) else None
        sa = sa if isinstance(sa, int) else None
        assert r["a"] == sa
        nb = (src.get("nest", {}).get("b")
              if isinstance(src, dict) and isinstance(src.get("nest"), dict)
              else None)
        assert r["b"] == nb


def test_spark_writes_shredded_engine_reads(spark, tmp_path):
    import glob

    p = str(tmp_path / "sparkvar")
    spark.sql(
        "SELECT id, parse_json(concat('{\"a\":', id, ',\"s\":\"x', id,"
        " '\",\"nest\":{\"b\":', id*2, '}}')) AS v FROM range(30)"
    ).write.parquet(p)
    got = {}
    for f in glob.glob(os.path.join(p, "*.parquet")):
        tb = pqinterop.decode_table(f)
        vf = tb.schema.field("v")
        assert vf.metadata[b"pgs_logical"] == b"variant"
        tree = V.spec_tree_from_type(vf.type.field("typed_value").type)
        for i, vr in zip(tb.column("id").to_pylist(),
                         tb.column("v").to_pylist()):
            got[i] = V.merge_spec_row(
                vr["metadata"], vr.get("value"), vr.get("typed_value"),
                tree)
    assert got == {i: {"a": i, "s": f"x{i}", "nest": {"b": 2 * i}}
                   for i in range(30)}


ARR_ROWS = [
    {"toks": [1, 2, 300000], "s": "a"},
    {"toks": [5, "bad", 7], "s": "b"},       # mixed: per-ELEMENT residual
    {"toks": "not-an-array"},                 # field residual
    {"s": "only"},
    {"toks": []},
]
ARR_FIELDS = {"toks": "array<int>", "s": "string"}


def test_spec_array_shred_merge_no_spark():
    metas, vals = _encode_rows(ARR_ROWS)
    st = V.spec_struct_type(ARR_FIELDS)
    arr = pa.array(V.shred_spec_rows(metas, vals, ARR_FIELDS), st)
    r0 = arr[0].as_py()
    assert [e["typed_value"]
            for e in r0["typed_value"]["toks"]["typed_value"]] == \
        [1, 2, 300000]
    tl = arr[1].as_py()["typed_value"]["toks"]["typed_value"]
    assert tl[1]["typed_value"] is None and tl[1]["value"] is not None
    assert arr[2].as_py()["typed_value"]["toks"]["value"] is not None
    assert V.merge_spec_rows(arr.to_pylist(), ARR_FIELDS) == ARR_ROWS


def test_array_shredded_variant_spark_both_ways(spark, tmp_path):
    """Token arrays (the north-rule payload) as shredded variant
    fields, through REAL parquet, both directions — Spark's JVM
    variant reader referees engine bytes incl. element-level
    variant_get; the engine merges Spark's auto-shredded arrays."""
    import glob

    metas, vals = _encode_rows(ARR_ROWS)
    t = pa.table({
        "id": pa.array(range(len(ARR_ROWS)), pa.int64()),
        "v": pa.array(V.shred_spec_rows(metas, vals, ARR_FIELDS),
                      V.spec_struct_type(ARR_FIELDS)),
    })
    p = str(tmp_path / "arrshred.parquet")
    pqwriter.write_table(t, p, logical_types={"v": "variant"})
    df = spark.read.parquet(p)
    assert df.schema["v"].dataType.typeName() == "variant"
    got = [r["j"] for r in df.selectExpr("id", "to_json(v) AS j")
           .orderBy("id").collect()]
    assert got == [json.dumps(_canon(r), separators=(",", ":"))
                   for r in ARR_ROWS]
    first = df.selectExpr(
        "try_variant_get(v, '$.toks[2]', 'long') AS e").collect()[0]["e"]
    assert first == 300000

    p2 = str(tmp_path / "sparr")
    spark.sql(
        "SELECT id, parse_json(concat('{\"toks\":[', id, ',', id*7,"
        " '],\"s\":\"y\"}')) AS v FROM range(8)").write.parquet(p2)
    got2 = {}
    for f in glob.glob(os.path.join(p2, "*.parquet")):
        tb = pqinterop.decode_table(f)
        tree = V.spec_tree_from_type(
            tb.schema.field("v").type.field("typed_value").type)
        for i, vr in zip(tb.column("id").to_pylist(),
                         tb.column("v").to_pylist()):
            got2[i] = V.merge_spec_row(vr["metadata"], vr.get("value"),
                                       vr.get("typed_value"), tree)
    assert got2 == {i: {"toks": [i, i * 7], "s": "y"} for i in range(8)}
