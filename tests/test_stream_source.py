"""readStream.format("pgs"): a store's commits consumed as
micro-batches — the source twin of the streaming sink, and the
continuous twin of option("since_commit", k)."""

from __future__ import annotations

import shutil

import pytest

from parquet_go_spark.sources.pgs_datasource import register


def _write(spark, path, lo, hi, mode):
    df = spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id % 5 AS INT) AS grp", "concat('r-', id) AS name"
    )
    df.repartition(2).write.format("pgs").mode(mode).save(path)
    return df


def _drain(spark, path, ckpt, **opts):
    """Run the stream with availableNow and collect every micro-batch's
    rows (foreachBatch runs driver-side)."""
    got: list = []
    reader = spark.readStream.format("pgs")
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load(path)
        .writeStream.foreachBatch(
            lambda df, bid: got.extend(df.collect())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return got


def test_stream_source_batch_store_incremental(spark, tmp_out, tmp_path):
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    _write(spark, tmp_out, 0, 100, "overwrite")
    _write(spark, tmp_out, 100, 200, "append")
    ckpt = str(tmp_path / "ck")

    got = _drain(spark, tmp_out, ckpt)
    assert sorted(r["k"] for r in got) == list(range(200))

    # nothing new -> empty drain from the same checkpoint
    assert _drain(spark, tmp_out, ckpt) == []

    # a new commit -> exactly its rows
    _write(spark, tmp_out, 200, 260, "append")
    got3 = _drain(spark, tmp_out, ckpt)
    assert sorted(r["k"] for r in got3) == list(range(200, 260))


def test_stream_source_applies_deletes_and_start_commit(
    spark, tmp_out, tmp_path
):
    from parquet_go_spark.operators.deletes import delete_where

    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    _write(spark, tmp_out, 0, 100, "overwrite")
    _write(spark, tmp_out, 100, 200, "append")
    # takedown BEFORE consumption: the rows must never be emitted
    delete_where(spark, tmp_out, "k % 10 = 3")
    got = _drain(spark, tmp_out, str(tmp_path / "ck1"),
                 start_commit="1")
    ks = sorted(r["k"] for r in got)
    assert ks == [k for k in range(100, 200) if k % 10 != 3]


def test_stream_source_from_stream_written_store(spark, tmp_out, tmp_path):
    """Sink and source compose: a store written by the streaming sink
    reads back incrementally by micro-batch watermark."""
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    src = str(tmp_path / "in")
    df = spark.range(0, 120).selectExpr("id AS k", "concat('s', id) AS s")
    df.write.parquet(src)
    q = (
        spark.readStream.schema("k long, s string").parquet(src)
        .writeStream.format("pgs")
        .option("checkpointLocation", str(tmp_path / "ck_sink"))
        .trigger(availableNow=True)
        .start(tmp_out)
    )
    q.awaitTermination(180)
    got = _drain(spark, tmp_out, str(tmp_path / "ck_src"))
    assert sorted(r["k"] for r in got) == list(range(120))


def test_stream_source_refusals(spark, tmp_out, tmp_path):
    from parquet_go_spark.operators.pruned import encode_generic

    register(spark)
    op_store = str(tmp_path / "op")
    df = spark.range(0, 40).selectExpr("id AS k", "id * 2 AS v")
    encode_generic(spark, df, op_store, key_col="k", clustering="range",
                   num_parts=2)
    with pytest.raises(Exception, match="no commit bookkeeping"):
        (
            spark.readStream.format("pgs").load(op_store)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True).start().awaitTermination(60)
        )
    shutil.rmtree(tmp_out, ignore_errors=True)
    _write(spark, tmp_out, 0, 50, "overwrite")
    with pytest.raises(Exception, match="does not apply to streaming"):
        (
            spark.readStream.format("pgs")
            .option("since_commit", "1").load(tmp_out)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True).start().awaitTermination(60)
        )


def test_stream_source_expired_offset_raises(spark, tmp_out):
    """A checkpointed cursor that predates the retained history must
    fail loudly (the data it would window is no longer addressable),
    while a cursor at/after the expiry base still drains exactly."""
    import shutil

    from parquet_go_spark.sources.pgs_datasource import (
        PGSStreamSourceReader, expire_snapshots, register,
    )

    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    for lo, mode in ((0, "overwrite"), (100, "append"), (200, "append")):
        spark.range(lo, lo + 100).selectExpr("id AS k") \
            .repartition(2).write.format("pgs").mode(mode).save(tmp_out)
    expire_snapshots(tmp_out, keep_last=1)  # base = 2
    schema = spark.read.format("pgs").load(tmp_out).schema
    r = PGSStreamSourceReader(tmp_out, schema, {})
    assert r.latestOffset() == {"commit": 3}
    # a RESUMING cursor inside the expired range is unrecoverable
    with pytest.raises(ValueError, match="expired"):
        r._pid_window(1, 3)
    # a FRESH consumer (offset 0) still full-syncs: expiry is metadata
    assert r._pid_window(0, 3)[0] == 0
    full = sum(
        b.num_rows
        for p in r.partitions({"commit": 0}, {"commit": 3})
        if p.value is not None
        for b in r.read(p)
    )
    assert full == 300
    parts = r.partitions({"commit": 2}, {"commit": 3})
    rows = sum(
        b.num_rows
        for p in parts if p.value is not None
        for b in r.read(p)
    )
    assert rows == 100  # exactly the third commit
