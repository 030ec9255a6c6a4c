"""Changelog reads (Iceberg CDC analog): the replay contract — a mirror
synced at snapshot s plus read_changes(s, now) equals the current read —
and the window-validation rules (equality-delete windows, pre-lineage
entries, expired cursors, stream stores)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from parquet_go_spark.operators.changes import read_changes
from parquet_go_spark.operators.deletes import (
    delete_matching,
    delete_values,
    delete_where,
    upsert_by_key,
)
from parquet_go_spark.sources.pgs_datasource import (
    _meta,
    _write_meta,
    expire_snapshots,
    register,
    rollback_to_commit,
)


def _write(spark, df, path, mode):
    df.repartition(2).write.format("pgs").mode(mode).save(path)


def _rows(spark, n, lo=0):
    return spark.range(lo, lo + n).selectExpr(
        "id AS k", "CAST(id % 7 AS INT) AS grp", "concat('r-', id) AS name"
    )


def _build(spark, path):
    """write -> append -> delete -> append -> upsert -> delete ->
    append: a store whose timeline exercises every changelog arm."""
    register(spark)
    shutil.rmtree(path, ignore_errors=True)
    _write(spark, _rows(spark, 300), path, "overwrite")        # snap 1
    _write(spark, _rows(spark, 200, lo=300), path, "append")   # snap 2
    delete_where(spark, path, "grp = 3")                       # at=2
    _write(spark, _rows(spark, 100, lo=500), path, "append")   # snap 3
    upserts = spark.range(150, 180).selectExpr(
        "id AS k", "CAST(99 AS INT) AS grp", "concat('u-', id) AS name"
    )
    upsert_by_key(spark, path, upserts, "k")        # at=3, then snap 4
    delete_matching(
        spark, path, spark.range(420, 470).selectExpr("id AS k"), "k"
    )                                                          # at=4
    _write(spark, _rows(spark, 50, lo=600), path, "append")    # snap 5
    return 5


def _mirror_replay(spark, path, s):
    """Sync at snapshot s, apply changes (inserts of commit k before
    deletes tagged at=k; unknown delete addresses are no-ops), return
    the mirror as a set of (k, grp, name) tuples."""
    sync = (
        spark.read.format("pgs").option("with_pos", "true")
        .option("as_of_commit", str(s)).load(path)
    ).collect()
    mirror = {(r["_pgs_part"], r["_pgs_pos"]): (r["k"], r["grp"], r["name"])
              for r in sync}
    ev = read_changes(spark, path, s).collect()
    ins = sorted((r for r in ev if r["_change_type"] == "insert"),
                 key=lambda r: r["_pgs_commit"])
    dels = sorted((r for r in ev if r["_change_type"] == "delete"),
                  key=lambda r: r["_pgs_commit"])
    i = d = 0
    commits = sorted({r["_pgs_commit"] for r in ev})
    for c in commits:
        while i < len(ins) and ins[i]["_pgs_commit"] == c:
            r = ins[i]
            mirror[(r["_pgs_part"], r["_pgs_pos"])] = (
                r["k"], r["grp"], r["name"]
            )
            i += 1
        while d < len(dels) and dels[d]["_pgs_commit"] == c:
            mirror.pop((dels[d]["_pgs_part"], dels[d]["_pgs_pos"]), None)
            d += 1
    return set(mirror.values())


def test_replay_from_every_snapshot(spark, tmp_out):
    now = _build(spark, tmp_out)
    want = {
        (r["k"], r["grp"], r["name"])
        for r in spark.read.format("pgs").load(tmp_out).collect()
    }
    for s in range(1, now + 1):
        assert _mirror_replay(spark, tmp_out, s) == want, f"sync at {s}"


def test_empty_window_and_bounds(spark, tmp_out):
    now = _build(spark, tmp_out)
    assert read_changes(spark, tmp_out, now).count() == 0
    assert read_changes(spark, tmp_out, 1, until_commit=1).count() == 0
    with pytest.raises(ValueError, match="out of range"):
        read_changes(spark, tmp_out, now + 1)
    with pytest.raises(ValueError, match="until_commit"):
        read_changes(spark, tmp_out, 2, until_commit=now + 1)
    with pytest.raises(ValueError, match="until_commit"):
        read_changes(spark, tmp_out, 3, until_commit=2)


def test_intermediate_window_caps_inserts(spark, tmp_out):
    _build(spark, tmp_out)
    ev = read_changes(spark, tmp_out, 1, until_commit=3)
    got = {(r["_change_type"], r["_pgs_commit"]) for r in ev.collect()}
    assert all(c in (2, 3) for _, c in got)
    # snap-2 delete included, snap-4 delete (at=4) excluded
    assert ("delete", 2) in got


def test_eq_delete_window_refused(spark, tmp_out):
    _build(spark, tmp_out)
    delete_values(
        spark, tmp_out, spark.range(5).selectExpr("id AS k"), "k"
    )  # at = 5 (current snapshot)
    with pytest.raises(ValueError, match="equality-delete"):
        read_changes(spark, tmp_out, 4)
    # a window entirely BEFORE the eq commit is still readable
    assert read_changes(spark, tmp_out, 1, until_commit=4).count() > 0


def test_pre_lineage_entry_refused(spark, tmp_out):
    _build(spark, tmp_out)
    meta = _meta(tmp_out)
    del meta["deletes"][0]["at"]
    _write_meta(tmp_out, meta)
    with pytest.raises(ValueError, match="predates changelog"):
        read_changes(spark, tmp_out, 1)


def test_rollback_clamps_tags(spark, tmp_out):
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    _write(spark, _rows(spark, 200), tmp_out, "overwrite")      # snap 1
    _write(spark, _rows(spark, 100, lo=200), tmp_out, "append")  # snap 2
    _write(spark, _rows(spark, 100, lo=300), tmp_out, "append")  # snap 3
    delete_where(spark, tmp_out, "grp = 2")                      # at=3
    rollback_to_commit(tmp_out, 2)
    assert _meta(tmp_out)["deletes"][0]["at"] == 2
    _write(spark, _rows(spark, 60, lo=400), tmp_out, "append")   # snap 3'
    want = {
        (r["k"], r["grp"], r["name"])
        for r in spark.read.format("pgs").load(tmp_out).collect()
    }
    for s in (1, 2, 3):
        assert _mirror_replay(spark, tmp_out, s) == want, f"sync at {s}"


def test_expired_cursor_refused(spark, tmp_out):
    now = _build(spark, tmp_out)
    expire_snapshots(tmp_out, keep_last=2)
    with pytest.raises(ValueError, match="expired"):
        read_changes(spark, tmp_out, 1)
    # surviving window still replays to the current state
    want = {
        (r["k"], r["grp"], r["name"])
        for r in spark.read.format("pgs").load(tmp_out).collect()
    }
    assert _mirror_replay(spark, tmp_out, now - 1) == want


def test_stream_store_refused(spark, tmp_out):
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    _write(spark, _rows(spark, 50), tmp_out, "overwrite")
    meta = _meta(tmp_out)
    meta["clustering"] = "stream_append"
    _write_meta(tmp_out, meta)
    with pytest.raises(ValueError, match="stream"):
        read_changes(spark, tmp_out, 0)


def test_delete_events_carry_no_content(spark, tmp_out):
    _build(spark, tmp_out)
    ev = read_changes(spark, tmp_out, 1).filter(
        F.col("_change_type") == "delete"
    )
    rows = ev.collect()
    assert rows, "window must contain delete events"
    assert all(
        r["k"] is None and r["name"] is None and r["grp"] is None
        for r in rows
    )
    assert all(
        r["_pgs_part"] is not None and r["_pgs_pos"] is not None
        for r in rows
    )
