"""Row-level deletes: positional tombstones, merge-on-read application,
materialization through compaction, and the commit/cleanup protocol.

The reference has no delete surface (a parquet-go file is immutable);
this is the Iceberg positional-delete analog over the PGS store — the
takedown primitive a mutable 100 TB training store needs."""

from __future__ import annotations

import os
import shutil

import pytest

from parquet_go_spark.operators.compact import compact_store
from parquet_go_spark.operators.deletes import (
    delete_matching,
    delete_stats,
    delete_where,
    upsert_by_key,
)
from parquet_go_spark.sources.pgs_datasource import (
    _meta,
    register,
    sweep_store,
)


def _mkstore(spark, path, n=600, parts=3, **write_opts):
    register(spark)
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(0, n).selectExpr(
        "id AS k", "CAST(id % 5 AS INT) AS grp", "concat('r-', id) AS name"
    )
    w = df.repartition(parts).write.format("pgs").mode("overwrite")
    for k, v in write_opts.items():
        w = w.option(k, v)
    w.save(path)
    return df


def _same(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_delete_merge_on_read(spark, tmp_out):
    df = _mkstore(spark, tmp_out)
    res = delete_where(spark, tmp_out, "grp = 2 OR k < 7")
    assert res["deleted_rows"] == df.filter("grp = 2 OR k < 7").count()
    back = spark.read.format("pgs").load(tmp_out)
    assert _same(back, df.filter("NOT (grp = 2 OR k < 7)"))
    # stats surface agrees
    st = delete_stats(tmp_out)
    assert st["tombstone_dirs"] == 1
    assert st["deleted_rows"] == res["deleted_rows"]


def test_delete_idempotent_and_cumulative(spark, tmp_out):
    df = _mkstore(spark, tmp_out)
    delete_where(spark, tmp_out, "grp = 2")
    # re-running the same condition sees only live rows -> no-op
    res2 = delete_where(spark, tmp_out, "grp = 2")
    assert res2 == {"deleted_rows": 0, "name": None}
    assert len(_meta(tmp_out)["deletes"]) == 1
    # a second, overlapping delete tombstones only the still-live matches
    res3 = delete_where(spark, tmp_out, "k % 2 = 0")
    assert res3["deleted_rows"] == df.filter(
        "grp != 2 AND k % 2 = 0").count()
    back = spark.read.format("pgs").load(tmp_out)
    assert _same(back, df.filter("grp != 2 AND k % 2 = 1"))


def test_delete_with_paged_store_and_pushed_filter(spark, tmp_out):
    """Tombstone positions are absolute; a page-granular keep list must
    still address (and drop) the right rows."""
    df = _mkstore(spark, tmp_out, n=1000, parts=2, page_rows="64")
    delete_where(spark, tmp_out, "k BETWEEN 100 AND 140")
    got = (
        spark.read.format("pgs").load(tmp_out)
        .filter("k >= 90 AND k <= 160")
    )
    exp = df.filter(
        "NOT (k BETWEEN 100 AND 140) AND k >= 90 AND k <= 160"
    )
    assert _same(got, exp)


def test_with_pos_row_addresses_are_stable(spark, tmp_out):
    """Surviving rows keep their ORIGINAL positions after a delete — the
    property that makes later deletes and compaction address the right
    rows."""
    _mkstore(spark, tmp_out, n=100, parts=1)
    wp = spark.read.format("pgs").option("with_pos", "true").load(tmp_out)
    before = {r.k: (r._pgs_part, r._pgs_pos) for r in wp.collect()}
    delete_where(spark, tmp_out, "k < 50")
    wp2 = spark.read.format("pgs").option("with_pos", "true").load(tmp_out)
    after = {r.k: (r._pgs_part, r._pgs_pos) for r in wp2.collect()}
    assert set(after) == {k for k in before if k >= 50}
    assert all(after[k] == before[k] for k in after)


def test_virtual_only_projection_and_part_pruning(spark, tmp_out):
    _mkstore(spark, tmp_out, n=200, parts=4)
    wp = spark.read.format("pgs").option("with_pos", "true").load(tmp_out)
    # virtual-only projection never touches blob bytes (count from
    # manifest rows)
    assert wp.select("_pgs_part").count() == 200
    # filtering on _pgs_part prunes to one partition and returns its rows
    one = wp.filter("_pgs_part = 2")
    assert one.count() > 0
    assert one.select("_pgs_part").distinct().collect()[0][0] == 2


def test_delete_on_encrypted_store(spark, tmp_out):
    key = "00112233445566778899aabbccddeeff"
    df = _mkstore(spark, tmp_out, key_hex=key)
    res = delete_where(spark, tmp_out, "grp = 0",
                       read_options={"key_hex": key})
    assert res["deleted_rows"] == df.filter("grp = 0").count()
    back = spark.read.format("pgs").option("key_hex", key).load(tmp_out)
    assert _same(back, df.filter("grp != 0"))


def test_append_after_delete(spark, tmp_out):
    """Appended partitions get fresh ids past the committed range, so
    existing tombstones never address them; old deletes stay applied."""
    df = _mkstore(spark, tmp_out, n=300, parts=2)
    delete_where(spark, tmp_out, "k < 100")
    extra = spark.range(1000, 1100).selectExpr(
        "id AS k", "CAST(id % 5 AS INT) AS grp", "concat('r-', id) AS name"
    )
    extra.repartition(1).write.format("pgs").mode("append").save(tmp_out)
    back = spark.read.format("pgs").load(tmp_out)
    assert _same(back, df.filter("k >= 100").unionAll(extra))


def test_compact_fully_deleted_partition(spark, tmp_out, tmp_path):
    """Tombstoning every row of a partition must not break compaction:
    the partition simply does not exist in the destination."""
    df = _mkstore(spark, tmp_out, n=600, parts=3)
    # partitions hold interleaved keys (repartition is hash-ish); delete
    # by a full-partition-covering predicate instead: everything
    delete_where(spark, tmp_out, "k < 200")      # a chunk of the space
    delete_where(spark, tmp_out, "k >= 200")     # and the rest: all rows
    dst = str(tmp_path / "empty_dst")
    summ = compact_store(spark, tmp_out, dst)
    assert summ["deletes_applied"] == 600
    back = spark.read.format("pgs").load(dst)
    assert back.count() == 0
    assert back.columns == ["k", "grp", "name"]  # schema preserved


def test_compact_materializes_deletes(spark, tmp_out, tmp_path):
    df = _mkstore(spark, tmp_out, n=500, parts=4)
    delete_where(spark, tmp_out, "grp = 1")
    dst = str(tmp_path / "compacted")
    summ = compact_store(spark, tmp_out, dst)
    assert summ["deletes_applied"] == df.filter("grp = 1").count()
    back = spark.read.format("pgs").load(dst)
    assert _same(back, df.filter("grp != 1"))
    # destination is delete-free: no metadata, no tombstone dirs
    assert not _meta(dst).get("deletes")
    assert not os.path.isdir(os.path.join(dst, "deletes"))


def test_overwrite_clears_tombstones(spark, tmp_out):
    df = _mkstore(spark, tmp_out)
    delete_where(spark, tmp_out, "grp = 2")
    df.limit(10).repartition(1).write.format("pgs").mode(
        "overwrite").save(tmp_out)
    assert not _meta(tmp_out).get("deletes")
    assert not os.path.isdir(os.path.join(tmp_out, "deletes"))
    assert spark.read.format("pgs").load(tmp_out).count() == 10


def test_sweep_collects_uncommitted_tombstones(spark, tmp_out):
    _mkstore(spark, tmp_out)
    delete_where(spark, tmp_out, "k = 1")
    committed = _meta(tmp_out)["deletes"][0]["name"]
    os.makedirs(os.path.join(tmp_out, "deletes", "_tmp-0000feed"))
    os.makedirs(os.path.join(tmp_out, "deletes", "del-0000feed"))
    removed = sweep_store(tmp_out)
    assert "deletes/_tmp-0000feed" in removed
    assert "deletes/del-0000feed" in removed
    assert f"deletes/{committed}" not in removed
    assert os.path.isdir(os.path.join(tmp_out, "deletes", committed))


def test_reserved_pgs_prefix_rejected(spark, tmp_out):
    register(spark)
    df = spark.range(5).selectExpr("id AS k", "id AS _pgs_pos")
    with pytest.raises(Exception, match="_pgs_"):
        df.write.format("pgs").mode("overwrite").save(tmp_out)


def test_delete_applies_to_snapshot_reads(spark, tmp_out):
    """Takedown semantics: a deleted row is gone from every as_of
    snapshot too (deliberately NOT Iceberg's frozen-snapshot rule)."""
    df = _mkstore(spark, tmp_out, n=200, parts=2)
    extra = spark.range(500, 550).selectExpr(
        "id AS k", "CAST(id % 5 AS INT) AS grp", "concat('r-', id) AS name"
    )
    extra.repartition(1).write.format("pgs").mode("append").save(tmp_out)
    delete_where(spark, tmp_out, "k < 20")
    snap1 = (
        spark.read.format("pgs").option("as_of_commit", "1").load(tmp_out)
    )
    assert _same(snap1, df.filter("k >= 20"))


def test_describe_store(spark, tmp_out):
    from parquet_go_spark.operators.evolve import add_column
    from parquet_go_spark.sources.pgs_datasource import describe_store

    df = _mkstore(spark, tmp_out, n=300, parts=3)
    delete_where(spark, tmp_out, "grp = 0")
    add_column(tmp_out, "w", "double", 1.0)
    d = describe_store(tmp_out)
    assert d["parts"] == 3 and d["rows"] == 300
    assert d["deleted_rows"] == df.filter("grp = 0").count()
    assert d["live_rows"] == 300 - d["deleted_rows"]
    assert d["added_columns"] == ["w"]
    assert "k bigint" in d["columns"] and "w double" in d["columns"]
    assert d["compression_ratio"] > 1
    assert sum(d["codecs"].values()) == 9  # 3 parts x 3 stored columns


def test_pos_filter_page_skip(spark, tmp_out):
    """A _pgs_pos range filter skips pages by row position — the
    SkipRows-over-OffsetIndex analog through the native source."""
    from parquet_go_spark.sources.pgs_datasource import (
        GreaterThanOrEqual,
        LessThan,
        PGSPruningReader,
    )

    _mkstore(spark, tmp_out, n=1024, parts=1, page_rows="64")
    wp = spark.read.format("pgs").option("with_pos", "true").load(tmp_out)
    r = PGSPruningReader(tmp_out, wp.schema, {"with_pos": "true"})
    r.pushFilters([GreaterThanOrEqual(("_pgs_pos",), 128),
                   LessThan(("_pgs_pos",), 256)])
    parts = r.partitions()
    assert len(parts) == 1
    keep = parts[0].value[2]
    assert keep == (2, 3)  # exactly pages [128,192) and [192,256)
    got = wp.filter("_pgs_pos >= 128 AND _pgs_pos < 256")
    assert got.count() == 128
    assert sorted(x._pgs_pos for x in got.collect()) == list(range(128, 256))


def test_delete_matching_semi_join(spark, tmp_out):
    df = _mkstore(spark, tmp_out)
    keys = spark.range(0, 600, 3).selectExpr("id AS k")  # every 3rd key
    res = delete_matching(spark, tmp_out, keys, "k")
    assert res["deleted_rows"] == 200
    back = spark.read.format("pgs").load(tmp_out)
    assert _same(back, df.filter("k % 3 != 0"))
    # keys absent from the store are simply no-ops
    res2 = delete_matching(
        spark, tmp_out, spark.range(10**6, 10**6 + 5).selectExpr("id AS k"),
        "k",
    )
    assert res2["deleted_rows"] == 0


def test_delete_matching_range_pruned(spark, tmp_out):
    """The key batch's [min, max] becomes a pushed range filter, so a
    range-clustered store decodes only the partitions that can match
    (lossless: out-of-range rows cannot join)."""
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    df = spark.range(0, 2000).selectExpr("id AS k", "concat('r-', id) AS v")
    (
        df.repartitionByRange(8, "k").write.format("pgs")
        .mode("overwrite").save(tmp_out)
    )
    keys = spark.createDataFrame([(500,), (510,), (777,)], "k long")
    res = delete_matching(spark, tmp_out, keys, "k")
    assert res["deleted_rows"] == 3
    # tombstones land only in partitions covering [500, 777]
    st = delete_stats(tmp_out)["entries"][0]
    assert st["hi"] - st["lo"] <= 2  # at most the 2-3 covering parts
    back = spark.read.format("pgs").load(tmp_out)
    assert _same(back, df.filter("k NOT IN (500, 510, 777)"))
    # null-bound / empty batches stay safe (no filter, no crash)
    res2 = delete_matching(
        spark, tmp_out, spark.createDataFrame([], "k long"), "k"
    )
    assert res2["deleted_rows"] == 0


def test_upsert_by_key(spark, tmp_out):
    df = _mkstore(spark, tmp_out)
    up = spark.range(550, 650).selectExpr(
        "id AS k", "CAST(9 AS INT) AS grp", "concat('new-', id) AS name"
    )  # 550-599 replace, 600-649 insert
    res = upsert_by_key(spark, tmp_out, up, "k")
    assert res["deleted_rows"] == 50
    back = spark.read.format("pgs").load(tmp_out)
    assert _same(back, df.filter("k < 550").unionAll(up))
    # re-running the same upsert converges to the same content
    upsert_by_key(spark, tmp_out, up, "k")
    back = spark.read.format("pgs").load(tmp_out)
    assert _same(back, df.filter("k < 550").unionAll(up))


def test_compact_tombstones(spark, tmp_out):
    """N delete ops merge into one tombstone dir; reads unchanged,
    superseded dirs removed, re-run is a no-op."""
    from parquet_go_spark.operators.deletes import compact_tombstones

    df = _mkstore(spark, tmp_out)
    delete_where(spark, tmp_out, "grp = 1")
    delete_where(spark, tmp_out, "k BETWEEN 300 AND 340")
    delete_where(spark, tmp_out, "k % 11 = 0")
    total = delete_stats(tmp_out)["deleted_rows"]
    assert delete_stats(tmp_out)["tombstone_dirs"] == 3
    res = compact_tombstones(spark, tmp_out)
    assert res["merged_dirs"] == 3
    assert res["deleted_rows"] == total  # disjoint live-row tombstones
    st = delete_stats(tmp_out)
    assert st["tombstone_dirs"] == 1 and st["deleted_rows"] == total
    # superseded dirs stay on disk (an in-flight reader that planned
    # against the old meta must still finish) until a sweep collects them
    assert len(os.listdir(os.path.join(tmp_out, "deletes"))) == 4
    removed = sweep_store(tmp_out)
    assert sorted(r.split("/")[1] for r in removed
                  if r.startswith("deletes/")) == sorted(res["superseded"])
    assert len(os.listdir(os.path.join(tmp_out, "deletes"))) == 1
    back = spark.read.format("pgs").load(tmp_out)
    exp = df.filter(
        "NOT (grp = 1) AND NOT (k BETWEEN 300 AND 340) AND NOT (k % 11 = 0)"
    )
    assert _same(back, exp)
    assert compact_tombstones(spark, tmp_out)["merged_dirs"] == 0


def test_upsert_inherits_store_layout(spark, tmp_out):
    """An upsert on a bloomed/paged store works without re-declaring
    the layout options (the append arm inherits non-secret knobs)."""
    df = _mkstore(spark, tmp_out, bloom_cols="k", page_rows="64")
    up = spark.range(100, 120).selectExpr(
        "id AS k", "CAST(1 AS INT) AS grp", "concat('u-', id) AS name"
    )
    res = upsert_by_key(spark, tmp_out, up, "k")
    assert res["deleted_rows"] == 20
    back = spark.read.format("pgs").load(tmp_out)
    assert _same(back, _fresh(spark).filter(
        "k < 100 OR k >= 120").unionAll(up))


def _fresh(spark):
    return spark.range(0, 600).selectExpr(
        "id AS k", "CAST(id % 5 AS INT) AS grp", "concat('r-', id) AS name"
    )


def test_delete_on_stream_store(spark, tmp_out, tmp_path):
    """The streaming sink's stores take deletes like any other (part ids
    are stable across batch replay, so positions stay valid)."""
    register(spark)
    src = str(tmp_path / "stream_src")
    df = spark.range(0, 120).selectExpr(
        "id AS k", "CAST(id % 5 AS INT) AS grp", "concat('r-', id) AS name"
    )
    df.write.parquet(src)
    stream = (
        spark.readStream.schema("k long, grp int, name string").parquet(src)
    )
    q = (
        stream.repartition(2).writeStream.format("pgs")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start(tmp_out)
    )
    q.awaitTermination(120)
    delete_where(spark, tmp_out, "grp = 4")
    back = spark.read.format("pgs").load(tmp_out)
    assert _same(back, df.filter("grp != 4"))


def test_streaming_upsert_cdc_apply(spark, tmp_out, tmp_path):
    """A stream of keyed corrections upserts into the store per
    micro-batch; replaying the stream from scratch converges to the
    same content (convergent at-least-once)."""
    from parquet_go_spark.streaming.upsert import upsert_stream

    df = _mkstore(spark, tmp_out, n=400, parts=2)
    src = str(tmp_path / "cdc_src")
    changes = spark.range(350, 450).selectExpr(
        "id AS k", "CAST(8 AS INT) AS grp", "concat('cdc-', id) AS name"
    )  # 350-399 replace, 400-449 insert
    changes.write.parquet(src)

    def run(ck):
        q = upsert_stream(
            spark.readStream.schema("k long, grp int, name string")
            .parquet(src),
            tmp_out, "k", str(tmp_path / ck),
        )
        q.awaitTermination(120)

    run("ck1")
    back = spark.read.format("pgs").load(tmp_out)
    exp = df.filter("k < 350").unionAll(changes)
    assert _same(back, exp)
    # full replay (fresh checkpoint) converges to identical content
    run("ck2")
    back = spark.read.format("pgs").load(tmp_out)
    assert _same(back, exp)


def test_update_where_basic(spark, tmp_out):
    from parquet_go_spark.operators.deletes import update_where

    df = _mkstore(spark, tmp_out)
    res = update_where(
        spark, tmp_out, "grp = 2",
        {"name": "concat(name, '+')", "grp": "grp + 10"},
    )
    assert res["updated_rows"] == df.filter("grp = 2").count()
    back = spark.read.format("pgs").load(tmp_out)
    exp = df.selectExpr(
        "k",
        "CASE WHEN grp = 2 THEN CAST(grp + 10 AS INT) ELSE grp END AS grp",
        "CASE WHEN grp = 2 THEN concat(name, '+') ELSE name END AS name",
    ).select("k", "grp", "name")
    assert _same(back, exp)
    # updated rows stay addressable: a second update over them works
    update_where(spark, tmp_out, "grp = 12", {"grp": "grp - 12"})
    back2 = spark.read.format("pgs").load(tmp_out)
    assert back2.filter("grp = 12").count() == 0
    assert back2.filter("grp = 0").count() == df.filter(
        "grp IN (0, 2)").count()


def test_update_where_noop_and_validation(spark, tmp_out):
    from parquet_go_spark.operators.deletes import update_where

    df = _mkstore(spark, tmp_out)
    assert update_where(spark, tmp_out, "k < 0", {"grp": "0"}) == {
        "updated_rows": 0, "name": None,
    }
    with pytest.raises(ValueError, match="no column"):
        update_where(spark, tmp_out, "k < 5", {"missing": "1"})
    assert _same(spark.read.format("pgs").load(tmp_out), df)


def test_update_where_append_failure_compensates(spark, tmp_out,
                                                 monkeypatch):
    """If the append arm fails after the tombstone commit, the entry is
    rolled back and the store reads exactly as before."""
    from parquet_go_spark.operators import deletes as dmod

    df = _mkstore(spark, tmp_out)

    def boom(updated, path, wo):
        raise RuntimeError("injected append failure")

    monkeypatch.setattr(dmod, "_append", boom)
    with pytest.raises(RuntimeError, match="injected"):
        dmod.update_where(spark, tmp_out, "grp = 1", {"grp": "99"})
    assert not (_meta(tmp_out).get("deletes") or [])
    assert _same(spark.read.format("pgs").load(tmp_out), df)
    # the orphaned tombstone dir is sweep food, not a reader hazard
    sweep_store(tmp_out)
    assert _same(spark.read.format("pgs").load(tmp_out), df)


def test_update_where_inherits_shredded_layout(spark, tmp_out):
    """The append arm of an update on a shredded-variant store inherits
    the recorded shred layout (the layout guard would refuse a bare
    append), and reconstruction round-trips through the rewrite."""
    from pyspark.sql import functions as F

    from parquet_go_spark.operators.deletes import update_where

    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    df = spark.range(0, 60).selectExpr(
        "id AS k",
        """parse_json(concat('{"lang": "l', id % 3, '", "n": ', id, '}'))
           AS v""",
        "concat('s', id) AS s",
    )
    (
        df.repartition(2).write.format("pgs").mode("overwrite")
        .option("shred_variant", "v:lang=string,n=int")
        .save(tmp_out)
    )
    update_where(spark, tmp_out, "k % 4 = 1", {"s": "concat(s, '!')"})
    back = spark.read.format("pgs").load(tmp_out).select(
        "k",
        F.variant_get("v", "$.lang", "string").alias("lang"),
        F.variant_get("v", "$.n", "int").alias("n"),
        "s",
    )
    exp = df.selectExpr(
        "k",
        "CASE WHEN k % 3 = 0 THEN 'l0' WHEN k % 3 = 1 THEN 'l1' "
        "ELSE 'l2' END AS lang",
        "CAST(k AS INT) AS n",
        "CASE WHEN k % 4 = 1 THEN concat(s, '!') ELSE s END AS s",
    )
    assert _same(back, exp)
    assert _meta(tmp_out)["shredded"] == {"v": {"lang": "string",
                                                "n": "int"}}
