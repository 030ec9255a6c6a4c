"""Snapshot rollback: durably restoring a batch-writer store to an
earlier append commit, and the part-id floor that keeps tombstone
addresses and equality-delete caps exact across it."""

from __future__ import annotations

import shutil

import pytest

from parquet_go_spark.operators.deletes import delete_values, delete_where
from parquet_go_spark.sources.pgs_datasource import (
    _meta,
    register,
    rollback_to_commit,
    sweep_store,
)


def _write(spark, path, lo, hi, mode, parts=2):
    df = spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id % 5 AS INT) AS grp", "concat('r-', id) AS name"
    )
    df.repartition(parts).write.format("pgs").mode(mode).save(path)
    return df


def _same(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_rollback_basic(spark, tmp_out):
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    d1 = _write(spark, tmp_out, 0, 100, "overwrite")
    _write(spark, tmp_out, 100, 200, "append")
    _write(spark, tmp_out, 200, 300, "append")
    assert len(_meta(tmp_out)["history"]) == 3
    res = rollback_to_commit(tmp_out, 2)
    assert res["rolled_back_commits"] == 1 and res["removed_parts"] > 0
    back = spark.read.format("pgs").load(tmp_out)
    assert back.count() == 200 and back.filter("k >= 200").count() == 0
    assert len(_meta(tmp_out)["history"]) == 2
    # rolling back to the current snapshot is a no-op
    assert rollback_to_commit(tmp_out, 2) == {
        "rolled_back_commits": 0, "removed_parts": 0}
    # all the way to the first commit
    rollback_to_commit(tmp_out, 1)
    assert _same(spark.read.format("pgs").load(tmp_out), d1)
    # rolled-back files are sweep food, and the sweep changes nothing
    removed = sweep_store(tmp_out)
    assert removed
    assert _same(spark.read.format("pgs").load(tmp_out), d1)


def test_rollback_pid_floor_protects_delete_caps(spark, tmp_out):
    """The exact hazard the floor exists for: an equality delete whose
    cap covers the rolled-back id range must NOT hit rows appended
    after the rollback (their ids would otherwise be reused)."""
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    _write(spark, tmp_out, 0, 100, "overwrite")
    _write(spark, tmp_out, 100, 200, "append")
    # eq delete on grp=3: cap covers both commits' partitions
    delete_values(
        spark, tmp_out, spark.createDataFrame([(3,)], "grp int"), "grp"
    )
    rollback_to_commit(tmp_out, 1)
    floor = _meta(tmp_out)["pid_floor"]
    assert floor > 0
    # rows appended AFTER the delete (and after the rollback) with the
    # deleted key must survive
    extra = spark.range(500, 540).selectExpr(
        "id AS k", "CAST(3 AS INT) AS grp", "concat('x-', id) AS name"
    )
    extra.write.format("pgs").mode("append").save(tmp_out)
    back = spark.read.format("pgs").load(tmp_out)
    assert back.filter("k >= 500").count() == 40  # all survived
    assert back.filter("k < 100 AND grp = 3").count() == 0  # still deleted
    # the new partitions really do sit above the floor
    wp = (
        spark.read.format("pgs").option("with_pos", "true").load(tmp_out)
    )
    new_pids = [
        r[0] for r in
        wp.filter("k >= 500").select("_pgs_part").distinct().collect()
    ]
    assert min(new_pids) >= floor


def test_rollback_keeps_takedowns(spark, tmp_out):
    """Positional tombstones on surviving rows are NOT undone by a
    rollback (takedown semantics)."""
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    _write(spark, tmp_out, 0, 100, "overwrite")
    _write(spark, tmp_out, 100, 200, "append")
    delete_where(spark, tmp_out, "k < 10")
    rollback_to_commit(tmp_out, 1)
    back = spark.read.format("pgs").load(tmp_out)
    assert back.count() == 90 and back.filter("k < 10").count() == 0


def test_rollback_refusals(spark, tmp_out, tmp_path):
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    _write(spark, tmp_out, 0, 50, "overwrite")
    with pytest.raises(ValueError, match="out of range"):
        rollback_to_commit(tmp_out, 2)
    with pytest.raises(ValueError, match="out of range"):
        rollback_to_commit(tmp_out, 0)
    # operator-written stores record no commit history
    from parquet_go_spark.operators.pruned import encode_generic

    op_store = str(tmp_path / "op")
    df = spark.range(0, 50).selectExpr("id AS k", "id * 2 AS v")
    encode_generic(spark, df, op_store, key_col="k", clustering="range",
                   num_parts=2)
    with pytest.raises(ValueError, match="no generation/commit history"):
        rollback_to_commit(op_store, 1)


def test_rollback_then_compact(spark, tmp_out, tmp_path):
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    d1 = _write(spark, tmp_out, 0, 100, "overwrite")
    _write(spark, tmp_out, 100, 200, "append")
    rollback_to_commit(tmp_out, 1)
    from parquet_go_spark.operators.compact import compact_store

    dst = str(tmp_path / "c")
    compact_store(spark, tmp_out, dst)
    assert _same(spark.read.format("pgs").load(dst), d1)
    assert "pid_floor" not in _meta(dst)


def test_snapshot_tags(spark, tmp_out):
    from parquet_go_spark.sources.pgs_datasource import (
        describe_store, drop_tag, tag_commit,
    )

    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    d1 = _write(spark, tmp_out, 0, 100, "overwrite")
    assert tag_commit(tmp_out, "v1") == 1
    _write(spark, tmp_out, 100, 200, "append")
    assert tag_commit(tmp_out, "v2") == 2

    by_tag = (
        spark.read.format("pgs").option("as_of_tag", "v1").load(tmp_out)
    )
    assert _same(by_tag, d1)
    assert describe_store(tmp_out)["tags"] == {"v1": 1, "v2": 2}
    # re-tagging the same snapshot is idempotent; a different one refuses
    assert tag_commit(tmp_out, "v1", 1) == 1
    with pytest.raises(ValueError, match="already names"):
        tag_commit(tmp_out, "v1", 2)
    with pytest.raises(Exception, match="no tag"):
        spark.read.format("pgs").option("as_of_tag", "nope") \
            .load(tmp_out).count()
    # rollback drops tags that name rolled-back snapshots
    rollback_to_commit(tmp_out, 1)
    assert describe_store(tmp_out)["tags"] == {"v1": 1}
    drop_tag(tmp_out, "v1")
    assert describe_store(tmp_out)["tags"] == {}


# ---------- expire_snapshots (retention) ----------

def test_expire_snapshots_absolute_numbering(spark, tmp_out):
    """Expired snapshots become unreadable; retained ones keep their
    ABSOLUTE numbers; tags on expired snapshots drop; the incremental
    cursor at the expiry base still works (base_cap floor)."""
    from parquet_go_spark.sources.pgs_datasource import (
        expire_snapshots, tag_commit,
    )

    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    _write(spark, tmp_out, 0, 100, "overwrite")
    _write(spark, tmp_out, 100, 200, "append")
    _write(spark, tmp_out, 200, 300, "append")
    _write(spark, tmp_out, 300, 400, "append")
    tag_commit(tmp_out, "old", 1)
    tag_commit(tmp_out, "recent", 3)

    res = expire_snapshots(tmp_out, keep_last=2)
    assert res["expired"] == 2 and res["retained"] == 2
    assert res["dropped_tags"] == ["old"]
    m = _meta(tmp_out)
    assert m["history_base"] == 2 and len(m["history"]) == 2
    assert m["tags"] == {"recent": 3}

    # full read unaffected
    back = spark.read.format("pgs").load(tmp_out)
    assert back.count() == 400
    # retained snapshot 3 keeps its absolute number
    snap3 = (spark.read.format("pgs").option("as_of_commit", 3)
             .load(tmp_out))
    assert snap3.count() == 300
    # expired snapshots raise
    with pytest.raises(Exception, match="expired"):
        (spark.read.format("pgs").option("as_of_commit", 1)
         .load(tmp_out).count())
    # since_commit at the expiry base uses the recorded base cap
    inc = (spark.read.format("pgs").option("since_commit", 2)
           .load(tmp_out))
    assert inc.count() == 200  # commits 3 and 4
    with pytest.raises(Exception, match="expired"):
        (spark.read.format("pgs").option("since_commit", 1)
         .load(tmp_out).count())
    # idempotent / no-op when already within retention
    assert expire_snapshots(tmp_out, keep_last=5)["expired"] == 0


def test_expire_then_rollback_and_append(spark, tmp_out):
    """Rollback cannot target an expired snapshot; rolling back to a
    retained one and appending keeps absolute numbering intact."""
    from parquet_go_spark.sources.pgs_datasource import expire_snapshots

    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    _write(spark, tmp_out, 0, 100, "overwrite")
    _write(spark, tmp_out, 100, 200, "append")
    _write(spark, tmp_out, 200, 300, "append")
    _write(spark, tmp_out, 300, 400, "append")
    expire_snapshots(tmp_out, keep_last=3)  # base = 1
    with pytest.raises(ValueError, match="out of range"):
        rollback_to_commit(tmp_out, 1)
    res = rollback_to_commit(tmp_out, 3)
    assert res["rolled_back_commits"] == 1
    back = spark.read.format("pgs").load(tmp_out)
    assert back.count() == 300
    _write(spark, tmp_out, 400, 450, "append")  # snapshot 4 again
    snap4 = (spark.read.format("pgs").option("as_of_commit", 4)
             .load(tmp_out))
    assert snap4.count() == 350


def test_expire_guards(spark, tmp_out):
    from parquet_go_spark.sources.pgs_datasource import expire_snapshots

    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    _write(spark, tmp_out, 0, 50, "overwrite")
    with pytest.raises(ValueError, match="keep_last"):
        expire_snapshots(tmp_out, 0)
