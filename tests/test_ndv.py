"""Per-chunk HLL NDV registers (ndv.py) + manifest_ndv merge path.

The contract under test: manifest-merged registers are bit-identical to
one HyperLogLog over the whole table — the same exact-arithmetic shape
operators/sketch.hll_distinct_df computes relationally (whose DuckDB
oracle pins the hash itself), so parity here chains three independent
computations together.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_spark import ndv


def _vals_int(n=20000):
    import random

    rng = random.Random(7)
    return [rng.randrange(-500, 5000) if i % 11 else None
            for i in range(n)]


def _vals_str(n=20000):
    return [f"doc-{i % 731}" if i % 13 else None for i in range(n)]


def _fold_of(arr):
    return ndv.fold(ndv.registers_of(arr))


def _spark_hll(spark, data, schema, col):
    from parquet_go_spark.operators.sketch import hll_distinct_df

    df = spark.createDataFrame([(v,) for v in data], schema)
    return hll_distinct_df(df, [col]).collect()[0]


@pytest.mark.parametrize("schema,atype,maker", [
    ("k long", pa.int64(), _vals_int),
    ("k int", pa.int32(), _vals_int),
    ("k string", pa.string(), _vals_str),
])
def test_registers_match_spark_sql_hll(spark, schema, atype, maker):
    data = maker()
    r = _spark_hll(spark, data, schema, "k")
    f = _fold_of(pa.array(data, atype))
    assert f["zero_registers"] == r["zero_registers"]
    assert str(f["registers_sum"]) == r["registers_sum"]
    assert f["est_raw"] == r["est_raw"]  # bit-exact double


def test_estimate_accuracy():
    data = _vals_int(50000)
    exact = len({v for v in data if v is not None})
    est = _fold_of(pa.array(data, pa.int64()))["est"]
    assert abs(est - exact) / exact < 0.05  # p=12 -> ~1.6% std error


def test_merge_equals_whole():
    data = _vals_int()
    whole = ndv.registers_of(pa.array(data, pa.int64()))
    blobs = [ndv.build(pa.array(data[i::5], pa.int64())) for i in range(5)]
    assert (ndv.merge(blobs) == whole).all()


def test_blob_roundtrip_and_guards():
    regs = ndv.registers_of(pa.array([1, 2, 3], pa.int64()))
    blob = ndv.to_blob(regs)
    assert (ndv.from_blob(blob) == regs).all()
    with pytest.raises(ValueError, match="not an NDV"):
        ndv.from_blob(b"XXXX" + blob[4:])
    with pytest.raises(ValueError, match="precision"):
        ndv.from_blob(blob[:4] + bytes([9]) + blob[5:])


def test_committed_blob_still_decodes():
    """Decode-side durability pin (golden-frame discipline for the NDV
    blob format): these COMMITTED bytes — build() of int64 0..99 plus a
    null and a duplicate 7 — must keep decoding to the same registers.
    The encoder may change (zlib level, future sparse layout behind a
    new magic); decoding existing stores may not. Regenerate only on an
    intentional format bump, stated in the commit."""
    import base64

    blob = base64.b64decode(
        "TkRWMQx4nM1W2xaEIAhUuvz/J7dnH2pBZAeFah66mDHMYFgpHyzFB2R+hQft"
        "IKvzlWhQYCwpv29HjOor/lkxYidxGQVvmUcYftLeRiJQ0aWH2ZFvwkvpdWYz"
        "n5lkoYLBVc20zWibzffO51Z19AumbGuHpkDduzyfds/khOYVgrBdSxWIq364"
        "CXWB+OOrrfcfJgoiS9Bwqa3eUinGKgwTtw8tnLzvGRI0pRpbgYxi0QZPuM3I"
        "Klqj7J7lerFdxyD8tzaOjvU6UiLvSjY2vXgqfoCpvxShfWnV+FE/DHIc1FKa"
        "/IPb7bt2x6je54hD5QBFrwDR"
    )
    regs = ndv.from_blob(blob)
    f = ndv.fold(regs)
    assert f["zero_registers"] == 3997
    assert f["registers_sum"] == 36271428448888553472
    fresh = ndv.registers_of(
        pa.array(list(range(100)) + [None, 7], pa.int64())
    )
    assert (regs == fresh).all()


def test_u32_path_matches_scalar_xxh64():
    """The 4-byte hashInt twin must equal XXH64 of the 4 LE bytes
    (zero-extension is Spark's input & 0xFFFFFFFF) — fuzzed against the
    scalar reference implementation, no Spark needed."""
    import struct

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from parquet_go_spark.bloom import _xxh64_scalar
    from parquet_go_spark.ndv import _SEED, _xxh64_u32

    @given(st.lists(st.integers(-(2**31), 2**31 - 1),
                    min_size=1, max_size=64))
    @settings(max_examples=200, deadline=None)
    def inner(vals):
        got = _xxh64_u32(np.array(vals, np.int32), seed=_SEED)
        want = [_xxh64_scalar(struct.pack("<i", v), seed=_SEED)
                for v in vals]
        assert got.tolist() == want

    inner()


def test_float_refused():
    with pytest.raises(TypeError, match="unsupported"):
        ndv.registers_of(pa.array([1.0, 2.0], pa.float64()))


def _write_store(spark, path, df, cols):
    from parquet_go_spark.sources.pgs_datasource import register

    register(spark)
    (df.repartition(3).write.format("pgs").mode("overwrite")
       .option("ndv_cols", ",".join(cols)).save(path))


def test_manifest_ndv_end_to_end(spark, tmp_out):
    from parquet_go_spark.operators.sketch import hll_distinct_df
    from parquet_go_spark.sources.pgs_datasource import manifest_ndv

    data = _vals_int(6000)
    df = spark.createDataFrame([(v,) for v in data], "k long")
    _write_store(spark, tmp_out, df, ["k"])
    got = manifest_ndv(tmp_out, ["k"])[0]
    ref = hll_distinct_df(df, ["k"]).collect()[0]
    assert got["zero_registers"] == ref["zero_registers"]
    assert str(got["registers_sum"]) == ref["registers_sum"]
    assert got["est_raw"] == ref["est_raw"]

    # append through the source: layout check forces the same ndv_cols,
    # and the merged registers still equal the whole-table sketch
    more = spark.createDataFrame([(v,) for v in _vals_int(3000)[::-1]],
                                 "k long")
    (more.repartition(2).write.format("pgs").mode("append")
         .option("ndv_cols", "k").save(tmp_out))
    got2 = manifest_ndv(tmp_out, ["k"])[0]
    ref2 = hll_distinct_df(df.unionAll(more), ["k"]).collect()[0]
    assert str(got2["registers_sum"]) == ref2["registers_sum"]
    assert got2["est_raw"] == ref2["est_raw"]


def test_manifest_ndv_refusals(spark, tmp_out):
    from parquet_go_spark.operators.deletes import delete_where
    from parquet_go_spark.sources.pgs_datasource import manifest_ndv, register

    df = spark.createDataFrame([(i,) for i in range(100)], "k long")
    _write_store(spark, tmp_out, df, ["k"])

    with pytest.raises(ValueError, match="missing|no column|NDV"):
        manifest_ndv(tmp_out, ["nope"])

    delete_where(spark, tmp_out, "k < 10")
    with pytest.raises(ValueError, match="tombstones"):
        manifest_ndv(tmp_out, ["k"])


def test_manifest_ndv_refuses_unsketched_store(spark, tmp_out):
    from parquet_go_spark.sources.pgs_datasource import manifest_ndv, register

    register(spark)
    df = spark.createDataFrame([(i,) for i in range(100)], "k long")
    df.write.format("pgs").mode("overwrite").save(tmp_out)
    with pytest.raises(ValueError, match="NDV"):
        manifest_ndv(tmp_out, ["k"])


def test_append_without_ndv_option_refused(spark, tmp_out):
    df = spark.createDataFrame([(i,) for i in range(50)], "k long")
    _write_store(spark, tmp_out, df, ["k"])
    with pytest.raises(Exception, match="layout"):
        df.write.format("pgs").mode("append").save(tmp_out)


def test_compaction_recomputes_ndv(spark, tmp_out, tmp_path):
    from parquet_go_spark.operators.compact import compact_store
    from parquet_go_spark.operators.deletes import delete_where
    from parquet_go_spark.operators.sketch import hll_distinct_df
    from parquet_go_spark.sources.pgs_datasource import manifest_ndv

    data = _vals_int(4000)
    df = spark.createDataFrame([(v,) for v in data], "k long")
    _write_store(spark, tmp_out, df, ["k"])
    # delete some rows, then compact: registers must recompute over the
    # SURVIVORS (the refusal above exists precisely because HLL cannot
    # subtract)
    delete_where(spark, tmp_out, "k < 0")
    dst = str(tmp_path / "compacted")
    compact_store(spark, tmp_out, dst, target_raw=1 << 30)
    got = manifest_ndv(dst, ["k"])[0]
    ref = hll_distinct_df(df.filter("k >= 0 or k is null"),
                          ["k"]).collect()[0]
    assert str(got["registers_sum"]) == ref["registers_sum"]
    assert got["est_raw"] == ref["est_raw"]


def test_stream_sink_ndv(spark, tmp_out):
    """NDV registers through the streaming sink: every micro-batch's
    chunks carry sketches and manifest_ndv honors the committed-batch
    watermark, equal to the whole-table relational HLL."""
    import shutil

    from parquet_go_spark.operators.sketch import hll_distinct_df
    from parquet_go_spark.sources.pgs_datasource import manifest_ndv, register

    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    ckpt, src = tmp_out + "-ckpt", tmp_out + "-in"
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(src, ignore_errors=True)
    data = _vals_int(2000)
    df = spark.createDataFrame([(v,) for v in data], "k long")
    df.coalesce(2).write.mode("append").parquet(src)
    (
        spark.readStream.schema("k long").parquet(src)
        .writeStream.format("pgs")
        .option("checkpointLocation", ckpt)
        .option("ndv_cols", "k")
        .trigger(availableNow=True)
        .start(tmp_out).awaitTermination(120)
    )
    got = manifest_ndv(tmp_out, ["k"])[0]
    ref = hll_distinct_df(df, ["k"]).collect()[0]
    assert str(got["registers_sum"]) == ref["registers_sum"]
    assert got["est_raw"] == ref["est_raw"]


def test_writer_rejects_float_ndv_col(spark, tmp_out):
    from parquet_go_spark.sources.pgs_datasource import register

    register(spark)
    df = spark.createDataFrame([(1.5,)], "x double")
    with pytest.raises(Exception, match="ndv_cols"):
        (df.write.format("pgs").mode("overwrite")
           .option("ndv_cols", "x").save(tmp_out))
