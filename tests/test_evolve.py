"""Schema evolution: add / rename / drop without rewriting data,
presence-based resolution, pruning through aliases, and materialization
via compaction.

The reference's schema is fixed at write time (schema/schemahandler.go
builds it once per file); this is the Iceberg schema-evolution analog
over the PGS store."""

from __future__ import annotations

import os
import shutil

import pytest

from parquet_go_spark.operators.compact import compact_store
from parquet_go_spark.operators.deletes import delete_where
from parquet_go_spark.operators.evolve import (
    add_column,
    drop_column,
    rename_column,
)
from parquet_go_spark.sources.pgs_datasource import (
    EqualTo,
    GreaterThanOrEqual,
    LessThanOrEqual,
    PGSPruningReader,
    _meta,
    register,
)


def _mkstore(spark, path, n=200, parts=2, ranged=False, **write_opts):
    register(spark)
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(0, n).selectExpr(
        "id AS k", "concat('r-', id) AS name",
        "CAST(id * 10 AS INT) AS n_chars",
    )
    src = df.repartitionByRange(parts, "k") if ranged \
        else df.repartition(parts)
    w = src.write.format("pgs").mode("overwrite")
    for kk, v in write_opts.items():
        w = w.option(kk, v)
    w.save(path)
    return df


def _same(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_add_column_default_and_append(spark, tmp_out):
    df = _mkstore(spark, tmp_out)
    add_column(tmp_out, "quality", "double", default=0.5)
    back = spark.read.format("pgs").load(tmp_out)
    assert back.columns == ["k", "name", "n_chars", "quality"]
    assert back.filter("quality = 0.5").count() == 200
    # appends must carry the evolved schema; new rows keep their values
    extra = spark.range(200, 250).selectExpr(
        "id AS k", "concat('r-', id) AS name",
        "CAST(id * 10 AS INT) AS n_chars", "CAST(id AS DOUBLE) AS quality",
    )
    extra.repartition(1).write.format("pgs").mode("append").save(tmp_out)
    back = spark.read.format("pgs").load(tmp_out)
    assert back.count() == 250
    # lossless filter across the old(default)/new(real) boundary
    assert back.filter("quality = 0.5").count() == 200
    assert back.filter("quality >= 240").count() == 10
    # an append missing the added column is rejected
    with pytest.raises(Exception, match="does not match"):
        df.limit(1).write.format("pgs").mode("append").save(tmp_out)


def test_add_column_null_default(spark, tmp_out):
    _mkstore(spark, tmp_out)
    add_column(tmp_out, "label", "string")
    back = spark.read.format("pgs").load(tmp_out)
    assert back.filter("label IS NULL").count() == 200
    assert back.filter("label IS NOT NULL").count() == 0


def test_rename_resolves_per_partition(spark, tmp_out):
    df = _mkstore(spark, tmp_out)
    rename_column(tmp_out, "n_chars", "size_chars")
    extra = spark.range(200, 260).selectExpr(
        "id AS k", "concat('r-', id) AS name",
        "CAST(id * 10 AS INT) AS size_chars",
    )
    extra.repartition(1).write.format("pgs").mode("append").save(tmp_out)
    back = spark.read.format("pgs").load(tmp_out)
    assert back.columns == ["k", "name", "size_chars"]
    exp = df.withColumnRenamed("n_chars", "size_chars").unionAll(extra)
    assert _same(back, exp)
    # chained rename keeps the full alias history
    rename_column(tmp_out, "size_chars", "width")
    back = spark.read.format("pgs").load(tmp_out)
    assert back.filter("width = 420").count() == 1
    assert back.filter("width = 2550").count() == 1  # new-era partition


def test_rename_keeps_stats_and_page_pruning(spark, tmp_out):
    """Stats (and page-index) pruning must consult the alias chain — a
    renamed range column keeps pruning old partitions."""
    df = _mkstore(spark, tmp_out, n=1000, parts=8, ranged=True,
                  page_rows="32")
    rename_column(tmp_out, "k", "key")
    back = spark.read.format("pgs").load(tmp_out)
    r = PGSPruningReader(tmp_out, back.schema, {})
    r.pushFilters([GreaterThanOrEqual(("key",), 100),
                   LessThanOrEqual(("key",), 150)])
    parts = r.partitions()
    assert 1 <= len(parts) < 8
    # page keep lists resolved through the alias too
    assert any(p.value[2] is not None for p in parts)
    got = back.filter("key BETWEEN 100 AND 150")
    assert _same(got, df.filter("k BETWEEN 100 AND 150")
                 .withColumnRenamed("k", "key"))


def test_rename_keeps_bloom_pruning(spark, tmp_out):
    _mkstore(spark, tmp_out, n=1000, parts=16, bloom_cols="k")
    rename_column(tmp_out, "k", "key")
    assert _meta(tmp_out)["bloom_cols"] == ["key"]
    back = spark.read.format("pgs").load(tmp_out)
    r = PGSPruningReader(tmp_out, back.schema, {})
    r.pushFilters([EqualTo(("key",), 777)])
    assert len(r.partitions()) < 16  # blooms fire through the alias
    assert back.filter("key = 777").count() == 1


def test_drop_and_readd_protection(spark, tmp_out):
    _mkstore(spark, tmp_out)
    drop_column(tmp_out, "name")
    back = spark.read.format("pgs").load(tmp_out)
    assert back.columns == ["k", "n_chars"]
    # the old chunks are still on disk: re-adding the name must refuse
    # (presence-based resolution would resurrect stale data otherwise)
    with pytest.raises(ValueError, match="already exist"):
        add_column(tmp_out, "name", "string")


def test_compact_materializes_evolution(spark, tmp_out, tmp_path):
    df = _mkstore(spark, tmp_out, n=300, parts=3)
    add_column(tmp_out, "quality", "double", default=0.25)
    rename_column(tmp_out, "n_chars", "width")
    drop_column(tmp_out, "name")
    delete_where(spark, tmp_out, "k >= 290")
    dst = str(tmp_path / "evo_dst")
    compact_store(spark, tmp_out, dst)
    m = _meta(dst)
    for key in ("added_columns", "column_renames", "retired_columns",
                "deletes"):
        assert not m.get(key), key
    back = spark.read.format("pgs").load(dst)
    exp = (
        df.filter("k < 290")
        .selectExpr("k", "n_chars AS width", "CAST(0.25 AS DOUBLE) AS quality")
    )
    assert _same(back, exp)
    # retired chunks are physically gone: the names are free again
    add_column(dst, "name", "string", default="x")
    assert spark.read.format("pgs").load(dst).filter(
        "name = 'x'").count() == 290


def test_evolution_guards(spark, tmp_out):
    _mkstore(spark, tmp_out)
    with pytest.raises(ValueError, match="taken or reserved"):
        add_column(tmp_out, "k", "int")
    with pytest.raises(ValueError, match="taken or reserved"):
        add_column(tmp_out, "_pgs_pos", "long")
    with pytest.raises(ValueError, match="taken or reserved"):
        add_column(tmp_out, "part_id", "int")
    with pytest.raises(ValueError, match="no column"):
        rename_column(tmp_out, "missing", "m2")
    with pytest.raises(ValueError, match="taken or reserved"):
        rename_column(tmp_out, "k", "name")
    with pytest.raises(ValueError, match="no column"):
        drop_column(tmp_out, "missing")
    with pytest.raises(ValueError, match="JSON scalar"):
        add_column(tmp_out, "bad", "array<int>", default=[1, 2])


def test_guard_column_key_and_key_col(spark, tmp_out):
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    df = spark.range(50).selectExpr("id AS k", "concat('r-', id) AS name")
    key = "00112233445566778899aabbccddeeff"
    (
        df.repartition(1).write.format("pgs").mode("overwrite")
        .option("column_keys_json", '{"name": "%s"}' % key)
        .save(tmp_out)
    )
    with pytest.raises(ValueError, match="per-column key"):
        rename_column(tmp_out, "name", "name2")
    with pytest.raises(ValueError, match="per-column key"):
        drop_column(tmp_out, "name")


def test_added_only_projection_reads_all_rows(spark, tmp_out):
    """Projecting ONLY an added column must still return every
    pre-evolution row (at the default) — the row count comes from the
    manifest, not from the matched chunks."""
    _mkstore(spark, tmp_out, n=150, parts=2)
    add_column(tmp_out, "quality", "double", default=0.5)
    only = (
        spark.read.format("pgs").option("columns", "quality").load(tmp_out)
    )
    assert only.count() == 150
    assert only.filter("quality = 0.5").count() == 150
    # and through the virtual row-address columns
    wp = (
        spark.read.format("pgs").option("columns", "quality")
        .option("with_pos", "true").load(tmp_out)
    )
    assert wp.count() == 150
    assert wp.selectExpr("max(_pgs_pos)").collect()[0][0] > 0


def test_compact_survives_all_columns_retired(spark, tmp_out, tmp_path):
    """A partition whose every physical chunk was dropped still
    contributes its rows (added-column defaults at full length)."""
    df = _mkstore(spark, tmp_out, n=120, parts=2)
    add_column(tmp_out, "w", "double", default=2.5)
    drop_column(tmp_out, "name")
    drop_column(tmp_out, "n_chars")
    drop_column(tmp_out, "k")
    back = spark.read.format("pgs").load(tmp_out)
    assert back.columns == ["w"] and back.count() == 120
    dst = str(tmp_path / "retired_dst")
    compact_store(spark, tmp_out, dst)
    cb = spark.read.format("pgs").load(dst)
    assert cb.count() == 120
    assert cb.filter("w = 2.5").count() == 120


def test_add_column_invalid_default_refused(spark, tmp_out):
    _mkstore(spark, tmp_out)
    with pytest.raises(ValueError, match="not castable"):
        add_column(tmp_out, "quality", "double", default="high")
    # the refusal left no metadata behind
    back = spark.read.format("pgs").load(tmp_out)
    assert "quality" not in back.columns


def test_evolution_refused_on_stream_stores(spark, tmp_out, tmp_path):
    """The sink re-records its schema every commit, which would silently
    revert a metadata-only evolution — refuse loudly instead."""
    register(spark)
    src = str(tmp_path / "stream_in")
    spark.range(20).selectExpr("id AS k").write.parquet(src)
    q = (
        spark.readStream.schema("k long").parquet(src)
        .writeStream.format("pgs")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start(tmp_out)
    )
    q.awaitTermination(120)
    with pytest.raises(ValueError, match="stream-written"):
        add_column(tmp_out, "x", "int")
    with pytest.raises(ValueError, match="stream-written"):
        rename_column(tmp_out, "k", "kk")


def test_legacy_store_without_schema_refused(spark, tmp_out):
    import json

    _mkstore(spark, tmp_out)
    mp = os.path.join(tmp_out, "_store_meta.json")
    meta = json.load(open(mp))
    del meta["schema_json"]
    json.dump(meta, open(mp, "w"))
    with pytest.raises(ValueError, match="records no schema"):
        add_column(tmp_out, "x", "int")
