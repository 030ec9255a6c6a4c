"""Change-feed streaming reads (option("change_feed")): the streaming
twin of operators.changes.read_changes — micro-batches carry insert
rows plus address-only delete events, and a mirror applying them in
commit order converges to the current read."""

from __future__ import annotations

import shutil

import pytest

from parquet_go_spark.operators.deletes import (
    compact_tombstones,
    delete_values,
    delete_where,
)
from parquet_go_spark.sources.pgs_datasource import CHANGE_COL, register


def _write(spark, path, lo, hi, mode):
    df = spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id % 5 AS INT) AS grp", "concat('r-', id) AS name"
    )
    df.repartition(2).write.format("pgs").mode(mode).save(path)


def _drain(spark, path, ckpt):
    """availableNow drain; returns [(batch_id, row), ...] in arrival
    order."""
    got: list = []
    q = (
        spark.readStream.format("pgs").option("change_feed", "true")
        .load(path)
        .writeStream.foreachBatch(
            lambda df, bid: got.extend((bid, r) for r in df.collect())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return got


def _apply(mirror: dict, events: list) -> dict:
    """Replay contract: batches in order; within a batch, inserts of
    commit k before deletes tagged at=k; unknown delete addresses are
    no-ops."""
    from itertools import groupby

    for _, batch in groupby(events, key=lambda t: t[0]):
        rows = [r for _, r in batch]
        for c in sorted({r["_pgs_commit"] for r in rows}):
            for r in rows:
                if r["_pgs_commit"] == c and r[CHANGE_COL] == "insert":
                    mirror[(r["_pgs_part"], r["_pgs_pos"])] = (
                        r["k"], r["grp"], r["name"]
                    )
            for r in rows:
                if r["_pgs_commit"] == c and r[CHANGE_COL] == "delete":
                    mirror.pop((r["_pgs_part"], r["_pgs_pos"]), None)
    return mirror


def _current(spark, path) -> set:
    return {
        (r["k"], r["grp"], r["name"])
        for r in spark.read.format("pgs").load(path).collect()
    }


def test_change_feed_mirror_converges(spark, tmp_out, tmp_path):
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    _write(spark, tmp_out, 0, 100, "overwrite")     # snap 1
    _write(spark, tmp_out, 100, 200, "append")      # snap 2
    delete_where(spark, tmp_out, "grp = 3")         # at=2
    _write(spark, tmp_out, 200, 260, "append")      # snap 3

    ev = _drain(spark, tmp_out, str(tmp_path / "ck"))
    rows = [r for _, r in ev]
    dels = [r for r in rows if r[CHANGE_COL] == "delete"]
    # pre-stream takedowns are already materialized in the insert side:
    # no delete events, and no tombstoned (pre-takedown) grp=3 row is
    # emitted — grp=3 rows appended AFTER the takedown legitimately live
    assert not dels
    assert all(
        r["grp"] != 3 for r in rows if r["_pgs_commit"] <= 2
    )
    mirror = _apply({}, ev)
    assert set(mirror.values()) == _current(spark, tmp_out)

    # incremental: a takedown between drains arrives as delete events
    delete_where(spark, tmp_out, "k % 10 = 7")      # at=3
    ev2 = _drain(spark, tmp_out, str(tmp_path / "ck"))
    rows2 = [r for _, r in ev2]
    assert rows2 and all(r[CHANGE_COL] == "delete" for r in rows2)
    assert all(
        r["k"] is None and r["grp"] is None and r["name"] is None
        for r in rows2
    ), "delete events must not replay content (takedown semantics)"
    assert all(r["_pgs_commit"] == 3 for r in rows2)
    _apply(mirror, ev2)
    assert set(mirror.values()) == _current(spark, tmp_out)

    # mixed window: append + takedown + append since the last drain
    _write(spark, tmp_out, 300, 340, "append")      # snap 4
    delete_where(spark, tmp_out, "k >= 330")        # at=4
    _write(spark, tmp_out, 400, 420, "append")      # snap 5
    ev3 = _drain(spark, tmp_out, str(tmp_path / "ck"))
    kinds = {r[CHANGE_COL] for _, r in ev3}
    assert kinds == {"insert", "delete"}
    _apply(mirror, ev3)
    assert set(mirror.values()) == _current(spark, tmp_out)

    # quiet store -> empty drain
    assert _drain(spark, tmp_out, str(tmp_path / "ck")) == []


def test_change_feed_compaction_reemits_idempotently(
    spark, tmp_out, tmp_path
):
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    _write(spark, tmp_out, 0, 120, "overwrite")
    _write(spark, tmp_out, 120, 200, "append")
    ckpt = str(tmp_path / "ck")
    mirror = _apply({}, _drain(spark, tmp_out, ckpt))

    delete_where(spark, tmp_out, "grp = 1")
    delete_where(spark, tmp_out, "k % 7 = 0")
    _apply(mirror, _drain(spark, tmp_out, ckpt))
    assert set(mirror.values()) == _current(spark, tmp_out)

    # merging fully-consumed dirs must NOT re-emit them (the merged
    # entry carries max(seq), already under the cursor); a fresh delete
    # after the merge still arrives
    compact_tombstones(spark, tmp_out)
    delete_where(spark, tmp_out, "k >= 190")
    ev = _drain(spark, tmp_out, ckpt)
    assert ev and all(r[CHANGE_COL] == "delete" for _, r in ev)
    assert all(r["_pgs_pos"] is not None for _, r in ev)
    # only the fresh takedown's addresses: the consumed merge is silent
    # (grp=1 alone tombstoned 40 rows; k>=190 at most 10)
    assert len(ev) <= 10, "consumed merge re-emitted"
    _apply(mirror, ev)
    assert set(mirror.values()) == _current(spark, tmp_out)

    # a merge spanning an UNCONSUMED entry re-emits the merged
    # addresses (at-least-once) — idempotent for the mirror
    delete_where(spark, tmp_out, "grp = 4")       # not yet consumed
    compact_tombstones(spark, tmp_out)
    ev2 = _drain(spark, tmp_out, ckpt)
    assert ev2 and all(r[CHANGE_COL] == "delete" for _, r in ev2)
    # re-emission: more addresses than the grp=4 rows alone
    _apply(mirror, ev2)
    assert set(mirror.values()) == _current(spark, tmp_out)


def test_change_feed_eq_delete_fails_the_batch(spark, tmp_out, tmp_path):
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    _write(spark, tmp_out, 0, 80, "overwrite")
    ckpt = str(tmp_path / "ck")
    _drain(spark, tmp_out, ckpt)
    delete_values(
        spark, tmp_out, spark.range(5).selectExpr("id AS k"), "k"
    )
    with pytest.raises(Exception, match="equality-delete"):
        _drain(spark, tmp_out, ckpt)


def test_change_feed_refusals(spark, tmp_out, tmp_path):
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    _write(spark, tmp_out, 0, 40, "overwrite")
    # batch reads have read_changes; the option is streaming-only
    with pytest.raises(Exception, match="streaming option"):
        spark.read.format("pgs").option("change_feed", "true") \
            .load(tmp_out).collect()
    # stream-written stores are append-only: plain stream IS the feed
    src = str(tmp_path / "in")
    spark.range(0, 30).selectExpr("id AS k").write.parquet(src)
    sink = str(tmp_path / "sink_store")
    q = (
        spark.readStream.schema("k long").parquet(src)
        .writeStream.format("pgs")
        .option("checkpointLocation", str(tmp_path / "ck_sink"))
        .trigger(availableNow=True)
        .start(sink)
    )
    q.awaitTermination(180)
    with pytest.raises(Exception, match="append-only"):
        (
            spark.readStream.format("pgs")
            .option("change_feed", "true").load(sink)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True).start().awaitTermination(60)
        )
