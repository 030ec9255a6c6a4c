"""Variant binary format: encode/decode identity, spec edge cases,
shredding + reconstruction semantics, fuzz, and the two-way
cross-implementation pin against Spark's JVM variant
(parse_json / variant_get)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_go_spark import variant as V


def _rt(v):
    meta, val = V.encode_variant(v)
    return V.decode_value(val, V.decode_metadata(meta))


PRIMS = [
    None, True, False, 0, 1, -1, 127, -128, 128, -129, 32767, -32768,
    32768, 2**31 - 1, -(2**31), 2**31, 2**63 - 1, -(2**63),
    0.0, -0.0, 1.5, -2.25e300, float("inf"), float("-inf"),
    "", "a", "x" * 63, "y" * 64, "z" * 70000, "héllo ünïcode",
    b"", b"\x00\xff" * 10,
]


@pytest.mark.parametrize("v", PRIMS, ids=[repr(p)[:24] for p in PRIMS])
def test_primitive_roundtrip(v):
    assert _rt(v) == v


def test_nan_roundtrip():
    import math

    out = _rt(float("nan"))
    assert isinstance(out, float) and math.isnan(out)


def test_int_width_minimization():
    # minimal widths, like Spark's writer (canonical form)
    assert V.encode_value(5)[0] >> 2 == 3          # int8
    assert V.encode_value(300)[0] >> 2 == 4        # int16
    assert V.encode_value(70000)[0] >> 2 == 5      # int32
    assert V.encode_value(2**40)[0] >> 2 == 6      # int64
    with pytest.raises(ValueError, match="range"):
        V.encode_value(2**63)


def test_nested_roundtrip():
    v = {
        "name": "doc-1",
        "n": 42,
        "score": 0.75,
        "ok": True,
        "tags": ["a", "b", {"deep": [1, 2, None]}],
        "meta": {"lang": "en", "empty_obj": {}, "empty_arr": []},
    }
    assert _rt(v) == v


def test_large_object_and_array():
    # > 255 elements flips is_large; > 255 payload bytes widens offsets
    obj = {f"k{i:04d}": i for i in range(300)}
    assert _rt(obj) == obj
    arr = list(range(1000)) + ["s" * 300]
    assert _rt(arr) == arr


def test_metadata_sorted_detection():
    m = V.encode_metadata(["a", "b", "c"])
    assert V.decode_metadata(m).sorted is True
    m = V.encode_metadata(["b", "a"])
    md = V.decode_metadata(m)
    assert md.sorted is False and md.dictionary == ["b", "a"]
    assert V.decode_metadata(V.encode_metadata([])).dictionary == []
    # wide dictionaries pick wider offsets
    big = [f"name-{i}-{'x' * 40}" for i in range(2000)]
    assert V.decode_metadata(V.encode_metadata(big)).dictionary == big


def test_object_requires_field_ids():
    with pytest.raises(ValueError, match="field_ids"):
        V.encode_value({"a": 1})
    with pytest.raises(ValueError, match="missing from metadata"):
        V.encode_value({"a": 1}, {"b": 0})


@pytest.mark.parametrize("mutate", [
    lambda b: b[:1],                      # truncated body
    lambda b: b[:1] + b"\xff" * 2,        # offsets past end
    lambda b: bytes([0xFC]) + b[1:],      # unknown primitive id 63
])
def test_malformed_value_raises(mutate):
    meta, val = V.encode_variant({"a": [1, "x"], "b": 2.5})
    md = V.decode_metadata(meta)
    with pytest.raises(ValueError):
        V.decode_value(mutate(val), md)


def test_malformed_metadata_raises():
    with pytest.raises(ValueError, match="version"):
        V.decode_metadata(b"\x02\x00\x00")
    with pytest.raises(ValueError):
        V.decode_metadata(b"\x01\x05")  # size but no offsets
    # field id past the dictionary
    meta, val = V.encode_variant({"a": 1})
    with pytest.raises(ValueError, match="dictionary"):
        V.decode_value(val, V.decode_metadata(V.encode_metadata([])))


def test_decode_budget_bounds_overlapping_offsets():
    # array whose elements all share offset 0 — decodes quadratically
    # without the budget; must raise, not hang (variant_decode.go:42-51)
    inner = V.encode_value(["x"] * 40)
    n = 255
    out = bytearray([0x03 | (0 << 2), n])  # array, offset size 1... but
    # offsets must fit in 1 byte; build with shared zero offsets
    for _ in range(n):
        out.append(0)
    out.append(min(len(inner), 255))
    out += inner
    with pytest.raises(ValueError):
        # nested shared-offset arrays exceed the op budget or bounds
        blob = bytes(out)
        for _ in range(3):
            arr = V._encode_array([blob] * 200)
            blob = arr
        V.decode_value(blob, V.VariantMetadata([]))


# --------------------------------------------------------------- shredding

def _mk(rows):
    pairs = [V.encode_variant(r) if r is not None else (None, None)
             for r in rows]
    return [m for m, _ in pairs], [v for _, v in pairs]


FIELDS = {"lang": "string", "n": "int"}


def test_shred_and_reconstruct_semantics():
    rows = [
        {"lang": "en", "n": 3, "extra": [1, 2]},   # both shred
        {"lang": "fr"},                             # n absent
        {"lang": 7, "n": "not-int"},                # both type-mismatch
        {"n": 2**40, "other": {"k": "v"}},          # int64-wide typed
        "bare string",                              # non-object row
        12345,                                      # non-object row
        {},                                         # empty object
        None,                                       # SQL-null row
        {"lang": "de", "n": -5},                    # fully shredded
    ]
    metas, vals = _mk(rows)
    sh = V.shred_rows(metas, vals, FIELDS)
    assert sh["typed_lang"] == ["en", "fr", None, None, None, None, None,
                                None, "de"]
    assert sh["typed_n"] == [3, None, None, 2**40, None, None, None,
                             None, -5]
    # mismatched fields stayed in the residual
    res2 = V.decode_value(sh["value"][2], V.decode_metadata(metas[2]))
    assert res2 == {"lang": 7, "n": "not-int"}
    # fully-shredded object leaves an EMPTY residual object, not null
    res8 = V.decode_value(sh["value"][8], V.decode_metadata(metas[8]))
    assert res8 == {}
    # non-object rows pass through verbatim
    assert sh["value"][4] == vals[4] and sh["value"][5] == vals[5]
    assert sh["value"][7] is None

    m2, v2 = V.reconstruct_rows(sh["metadata"], sh["value"],
                                {f: sh[f"typed_{f}"] for f in FIELDS})
    for i, r in enumerate(rows):
        if r is None:
            assert v2[i] is None
            continue
        assert V.decode_value(v2[i], V.decode_metadata(m2[i])) == r


def test_shred_rejects_unknown_kind():
    with pytest.raises(ValueError, match="shred kind"):
        V.shred_rows([], [], {"x": "decimal"})


def test_bool_not_shredded_as_int():
    metas, vals = _mk([{"n": True}])
    sh = V.shred_rows(metas, vals, {"n": "int"})
    assert sh["typed_n"] == [None]
    assert V.decode_value(sh["value"][0],
                          V.decode_metadata(metas[0])) == {"n": True}


# ------------------------------------------------------------------- fuzz

_scalar = st.one_of(
    st.none(), st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False),
    st.text(max_size=80),
    st.binary(max_size=40),
)
_value = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=8),
        st.dictionaries(st.text(min_size=1, max_size=12), children,
                        max_size=6),
    ),
    max_leaves=25,
)


@settings(max_examples=150, deadline=None)
@given(_value)
def test_fuzz_roundtrip(v):
    def norm(x):  # tuples decode as lists
        if isinstance(x, tuple):
            return [norm(e) for e in x]
        if isinstance(x, list):
            return [norm(e) for e in x]
        if isinstance(x, dict):
            return {k: norm(e) for k, e in x.items()}
        return x

    assert _rt(v) == norm(v)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=60))
def test_fuzz_malformed_never_crashes(data):
    try:
        V.decode_value(data, V.VariantMetadata(["a", "b"]))
    except ValueError:
        pass  # rejection is the contract; anything else propagates


# ---------------------------------------------------- Spark cross-checks

def test_spark_parse_json_decodes_here(spark):
    """Spark's JVM variant writer -> our decoder (one direction of the
    cross-implementation pin)."""
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.parse_json(F.lit(
            '{"lang": "en", "n": 42, "pi": 3.5, "big": 2.5e308, '
            '"ok": true, "tags": ["a", "b"], "nested": {"deep": null}}'
        )).alias("v")
    )
    row = df.select("v").toArrow().column("v")[0].as_py()
    got = V.decode_value(row["value"], V.decode_metadata(row["metadata"]))
    # Spark encodes exact JSON decimals as variant DECIMAL, which (like
    # the reference's formatDecimal) renders as the exact string; values
    # outside decimal range land as DOUBLE
    assert got == {"lang": "en", "n": 42, "pi": "3.5", "big": 2.5e308,
                   "ok": True, "tags": ["a", "b"],
                   "nested": {"deep": None}}


def test_spark_variant_get_reads_ours(spark):
    """Our encoder -> Spark's JVM variant reader (the other direction)."""
    import pyarrow as pa
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType, StructField, StructType, VariantType,
    )

    meta, val = V.encode_variant(
        {"lang": "de", "n": 7, "arr": [1, {"k": "v"}], "f": 2.5}
    )
    tbl = pa.table({"v": pa.array(
        [{"value": val, "metadata": meta}],
        pa.struct([pa.field("value", pa.binary(), nullable=False),
                   pa.field("metadata", pa.binary(), nullable=False)]),
    )})
    df = spark.createDataFrame(
        tbl, StructType([StructField("v", VariantType())])
    )
    out = df.select(
        F.variant_get("v", "$.lang", "string").alias("lang"),
        F.variant_get("v", "$.n", "int").alias("n"),
        F.variant_get("v", "$.arr[1].k", "string").alias("k"),
        F.variant_get("v", "$.f", "double").alias("f"),
    ).collect()[0]
    assert (out.lang, out.n, out.k, out.f) == ("de", 7, "v", 2.5)


def test_variant_shredded_query_e2e(spark):
    """The driver query end-to-end at sf0.001: shred -> typed codec
    stack -> reconstruct -> JVM variant_get, with the shred decision
    (was_typed) matching the injected type-mismatch pattern."""
    from parquet_go_spark.operators.roundtrip import variant_shredded_query

    out = variant_shredded_query(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 500
    for r in out:
        assert r.was_typed == (r.doc_id % 7 != 0)
        assert isinstance(r.lang, str) and r.n_chars is not None
        assert isinstance(r.source, str)


def test_typed_shred_columns_ride_typed_codecs():
    """The 100 TB point of shredding: a typed column extracted from the
    variant compresses with the typed codec menu, far below the opaque
    binary pair it came from."""
    import pyarrow as pa

    from parquet_go_spark import chunk

    rows = [{"lang": ["en", "de", "fr"][i % 3], "n": i % 1000}
            for i in range(20_000)]
    pairs = [V.encode_variant(r) for r in rows]
    metas = [m for m, _ in pairs]
    vals = [v for _, v in pairs]
    sh = V.shred_rows(metas, vals, {"lang": "string", "n": "int"})

    opaque, _ = chunk.encode_chunk(
        pa.array(vals, pa.binary()), codec="auto", compression="zstd")
    blob_lang, st_lang = chunk.encode_chunk(
        pa.array(sh["typed_lang"], pa.utf8()), codec="auto",
        compression="zstd")
    blob_n, st_n = chunk.encode_chunk(
        pa.array(sh["typed_n"], pa.int64()), codec="auto",
        compression="zstd")
    blob_res, _ = chunk.encode_chunk(
        pa.array(sh["value"], pa.binary()), codec="auto",
        compression="zstd")
    # typed columns picked real typed codecs, not byte-array fallbacks
    assert st_lang["codec"] in ("dict", "dict_rans", "dict_bss", "rle",
                                "fsst")
    assert st_n["codec"] in ("for_bitpack", "delta_binary_packed", "rans",
                             "dict_rans", "dict", "byte_stream_split")
    shredded_total = len(blob_lang) + len(blob_n) + len(blob_res)
    assert shredded_total < 0.7 * len(opaque)


def test_shred_moves_raw_slices_not_reencodes():
    """Raw-slice design pin: a non-shredded nested field's value bytes
    survive shred -> reconstruct byte-identically (only the top-level
    object directory is rebuilt; nothing else is decoded), and the
    original metadata passes through verbatim."""
    v = {"lang": "en", "n": 5,
         "blob": {"deep": [1, "two", {"x": 3.5}], "b": b"\x00\x01"}}
    meta, val = V.encode_variant(v)
    blob_slice = None
    ids, slices = V._split_object(val)
    d = V.decode_metadata(meta).dictionary
    for fid, sl in zip(ids, slices):
        if d[fid] == "blob":
            blob_slice = sl
    assert blob_slice is not None

    sh = V.shred_rows([meta], [val], {"lang": "string", "n": "int"})
    rids, rslices = V._split_object(sh["value"][0])
    assert [d[i] for i in rids] == ["blob"]
    assert rslices[0] == blob_slice  # moved, never re-encoded

    m2, v2 = V.reconstruct_rows(sh["metadata"], sh["value"],
                                {"lang": sh["typed_lang"],
                                 "n": sh["typed_n"]})
    assert m2[0] == meta  # metadata verbatim
    oids, oslices = V._split_object(v2[0])
    assert oslices[[d[i] for i in oids].index("blob")] == blob_slice
    assert V.decode_value(v2[0], V.decode_metadata(m2[0])) == v


def test_spark_cross_check_wide_object(spark):
    """Interop pin for header bit layouts the small cases can't see:
    an object whose payload needs offset_size=2 while id_size=1, both
    directions vs the JVM."""
    import json

    import pyarrow as pa
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType, StructField, StructType, VariantType,
    )

    obj = {"a": "x" * 300, "b": 1, "z": "tail"}
    # Spark -> us
    df = spark.range(1).select(
        F.parse_json(F.lit(json.dumps(obj))).alias("v")
    )
    row = df.select("v").toArrow().column("v")[0].as_py()
    got = V.decode_value(row["value"], V.decode_metadata(row["metadata"]))
    assert got == obj
    # us -> Spark
    meta, val = V.encode_variant(obj)
    tbl = pa.table({"v": pa.array(
        [{"value": val, "metadata": meta}],
        pa.struct([pa.field("value", pa.binary(), nullable=False),
                   pa.field("metadata", pa.binary(), nullable=False)]),
    )})
    sdf = spark.createDataFrame(
        tbl, StructType([StructField("v", VariantType())])
    )
    out = sdf.select(
        F.variant_get("v", "$.a", "string").alias("a"),
        F.variant_get("v", "$.b", "int").alias("b"),
        F.variant_get("v", "$.z", "string").alias("z"),
    ).collect()[0]
    assert (out.a, out.b, out.z) == (obj["a"], obj["b"], obj["z"])


def test_spark_cross_check_wide_metadata(spark):
    """Interop pin for metadata offset_size=2 (>255 bytes of field
    names), both directions vs the JVM."""
    import json

    import pyarrow as pa
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType, StructField, StructType, VariantType,
    )

    obj = {f"field_name_{i:03d}": i for i in range(40)}  # >255 name bytes
    df = spark.range(1).select(
        F.parse_json(F.lit(json.dumps(obj))).alias("v")
    )
    row = df.select("v").toArrow().column("v")[0].as_py()
    md = V.decode_metadata(row["metadata"])
    assert V.decode_value(row["value"], md) == obj
    meta, val = V.encode_variant(obj)
    tbl = pa.table({"v": pa.array(
        [{"value": val, "metadata": meta}],
        pa.struct([pa.field("value", pa.binary(), nullable=False),
                   pa.field("metadata", pa.binary(), nullable=False)]),
    )})
    sdf = spark.createDataFrame(
        tbl, StructType([StructField("v", VariantType())])
    )
    out = sdf.select(
        *[F.variant_get("v", f"$.field_name_{i:03d}", "int").alias(f"c{i}")
          for i in range(0, 40, 7)]
    ).collect()[0]
    assert list(out) == list(range(0, 40, 7))


def test_empty_object_and_array_carry_trailing_offset(spark):
    """Spec compliance: empty containers still emit num_elements + one
    offset; the JVM must read them back."""
    import pyarrow as pa
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType, VariantType

    assert V.encode_value([]) == bytes([0x03, 0x00, 0x00])
    meta, val = V.encode_variant({"e": {}, "a": []})
    tbl = pa.table({"v": pa.array(
        [{"value": val, "metadata": meta}],
        pa.struct([pa.field("value", pa.binary(), nullable=False),
                   pa.field("metadata", pa.binary(), nullable=False)]),
    )})
    sdf = spark.createDataFrame(
        tbl, StructType([StructField("v", VariantType())])
    )
    s = sdf.select(F.to_json("v").alias("j")).collect()[0].j
    assert s == '{"a":[],"e":{}}'


def test_shred_array_int_vectorized():
    """array<int> shredding: mixed int widths take the numpy path; any
    non-int element keeps the whole array residual (all-or-nothing)."""
    rows = [
        {"toks": [1, 2, 3]},                              # int8s
        {"toks": [5, 300, 70000, 2**40, -7]},             # mixed widths
        {"toks": []},                                     # empty
        {"toks": [1, "x", 3]},                            # mixed type
        {"toks": [1, [2], 3]},                            # nested
        {"toks": [1, None, 3]},                           # null element
        {"toks": "not an array"},
        {"toks": [True, 2]},                              # bool is not int
        {"other": 1},
    ]
    metas, vals = _mk(rows)
    sh = V.shred_rows(metas, vals, {"toks": "array<int>"})
    assert sh["typed_toks"][:3] == [[1, 2, 3],
                                    [5, 300, 70000, 2**40, -7], []]
    assert sh["typed_toks"][3:] == [None] * 6
    # mismatching arrays kept their exact bytes in the residual
    d = V.decode_metadata(metas[3]).dictionary
    ids, slices = V._split_object(sh["value"][3])
    orig_ids, orig_slices = V._split_object(vals[3])
    assert slices == orig_slices and ids == orig_ids
    m2, v2 = V.reconstruct_rows(sh["metadata"], sh["value"],
                                {"toks": sh["typed_toks"]})
    for i, r in enumerate(rows):
        assert V.decode_value(v2[i], V.decode_metadata(m2[i])) == r


def test_shred_array_other_kinds():
    rows = [
        {"xs": [1.5, -2.0], "ss": ["a", "b" * 80], "bs": [True, False]},
        {"xs": [1.5, 2], "ss": ["a", 1], "bs": [True, 0]},  # all mismatch
    ]
    metas, vals = _mk(rows)
    sh = V.shred_rows(metas, vals, {"xs": "array<double>",
                                    "ss": "array<string>",
                                    "bs": "array<bool>"})
    assert sh["typed_xs"] == [[1.5, -2.0], None]
    assert sh["typed_ss"] == [["a", "b" * 80], None]
    assert sh["typed_bs"] == [[True, False], None]
    m2, v2 = V.reconstruct_rows(sh["metadata"], sh["value"],
                                {f: sh[f"typed_{f}"]
                                 for f in ("xs", "ss", "bs")})
    for i, r in enumerate(rows):
        assert V.decode_value(v2[i], V.decode_metadata(m2[i])) == r


def test_shred_array_spark_cross_check(spark):
    """Spark-encoded int arrays shred on our side; our reconstruction
    reads back element-wise through the JVM."""
    import pyarrow as pa
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType, VariantType

    df = spark.range(1).select(F.parse_json(F.lit(
        '{"toks": [5, 300, 70000, 1099511627776], "lang": "en"}'
    )).alias("v"))
    row = df.select("v").toArrow().column("v")[0].as_py()
    sh = V.shred_rows([row["metadata"]], [row["value"]],
                      {"toks": "array<int>"})
    assert sh["typed_toks"] == [[5, 300, 70000, 2**40]]
    m2, v2 = V.reconstruct_rows(sh["metadata"], sh["value"],
                                {"toks": sh["typed_toks"]})
    tbl = pa.table({"v": pa.array(
        [{"value": v2[0], "metadata": m2[0]}],
        pa.struct([pa.field("value", pa.binary(), nullable=False),
                   pa.field("metadata", pa.binary(), nullable=False)]),
    )})
    sdf = spark.createDataFrame(
        tbl, StructType([StructField("v", VariantType())])
    )
    out = sdf.select(
        F.variant_get("v", "$.toks[3]", "long").alias("t3"),
        F.variant_get("v", "$.lang", "string").alias("lang"),
    ).collect()[0]
    assert (out.t3, out.lang) == (2**40, "en")


def test_shred_nested_paths():
    """Dotted shred paths (the spec's recursive object shredding):
    inner fields extract into typed columns, sibling bytes move
    verbatim, reconstruction restores the full tree."""
    rows = [
        {"meta": {"lang": "en", "w": 1.5}, "n": 3},
        {"meta": {"lang": 7, "w": 2.5}, "n": 4},       # inner mismatch
        {"meta": "not an object", "n": 5},
        {"meta": {"w": 3.5}, "n": 6},                   # inner absent
        {"n": 7},                                       # head absent
        {"meta": {"lang": "de"}},                       # inner fully shred
        None,
    ]
    metas, vals = _mk(rows)
    fields = {"meta.lang": "string", "n": "int"}
    sh = V.shred_rows(metas, vals, fields)
    assert sh["typed_meta.lang"] == ["en", None, None, None, None, "de",
                                     None]
    assert sh["typed_n"] == [3, 4, 5, 6, 7, None, None]
    # sibling 'w' inside meta kept its exact bytes
    d = V.decode_metadata(metas[0]).dictionary
    ids, slices = V._split_object(sh["value"][0])
    meta_sl = slices[[d[i] for i in ids].index("meta")]
    iids, islices = V._split_object(meta_sl)
    oids, oslices = V._split_object(V._split_object(vals[0])[1][
        [d[i] for i in V._split_object(vals[0])[0]].index("meta")])
    assert islices == [oslices[[d[i] for i in oids].index("w")]]
    m2, v2 = V.reconstruct_rows(sh["metadata"], sh["value"],
                                {f: sh[f"typed_{f}"] for f in fields})
    for i, r in enumerate(rows):
        if r is None:
            assert v2[i] is None
            continue
        assert V.decode_value(v2[i], V.decode_metadata(m2[i])) == r


def test_shred_path_validation():
    with pytest.raises(ValueError, match="leaf"):
        V.shred_rows([], [], {"a": "int", "a.b": "int"})
    with pytest.raises(ValueError, match="prefix"):
        V.shred_rows([], [], {"a.b": "int", "a": "string"})
