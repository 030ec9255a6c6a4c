"""as_of_timestamp: timestamp time travel over the lockstep history_ts
list (the Iceberg snapshot-timestamp rule: latest commit at or before
the instant). Wall-clock values are never pinned — only resolution
semantics, lockstep maintenance across expire/rollback/publish, and the
pre-timestamp refusal."""

from __future__ import annotations

import shutil

import pytest

from parquet_go_spark.sources.pgs_datasource import (
    _meta,
    _pad_ts,
    _resolve_as_of_ts,
    _write_meta,
    expire_snapshots,
    inspect_snapshots,
    register,
    rollback_to_commit,
)


def _write(spark, path, lo, hi, mode):
    spark.range(lo, hi).selectExpr("id AS k").repartition(2) \
        .write.format("pgs").mode(mode).save(path)


def test_as_of_timestamp_resolves_between_commits(spark, tmp_out):
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    _write(spark, tmp_out, 0, 50, "overwrite")
    _write(spark, tmp_out, 50, 100, "append")
    _write(spark, tmp_out, 100, 150, "append")
    meta = _meta(tmp_out)
    tss = meta["history_ts"]
    assert len(tss) == 3 and all(t is not None for t in tss)
    assert tss == sorted(tss)

    # exactly at commit 2's instant and one microsecond before commit 3
    for q, first_absent in [(tss[0], 50), (tss[1], 100),
                            (tss[2] - 1, 100), (tss[2], 150)]:
        got = (
            spark.read.format("pgs")
            .option("as_of_timestamp", str(q)).load(tmp_out)
        )
        assert got.filter(f"k >= {first_absent}").count() == 0
        assert got.count() == first_absent

    # before the first commit: refuse, never "empty table"
    with pytest.raises(Exception, match="no snapshot"):
        (spark.read.format("pgs")
         .option("as_of_timestamp", str(tss[0] - 1)).load(tmp_out)
         .count())

    # ISO-8601 far future resolves to the current snapshot
    cur = (spark.read.format("pgs")
           .option("as_of_timestamp", "2100-01-01T00:00:00+00:00")
           .load(tmp_out))
    assert cur.count() == 150

    snaps = {r["snapshot"]: r["committed_at_us"]
             for r in inspect_snapshots(spark, tmp_out).collect()}
    assert snaps == {1: tss[0], 2: tss[1], 3: tss[2]}


def test_lockstep_survives_expire_and_rollback(spark, tmp_out):
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    for i, mode in enumerate(["overwrite", "append", "append", "append"]):
        _write(spark, tmp_out, i * 10, (i + 1) * 10, mode)
    tss = list(_meta(tmp_out)["history_ts"])
    rollback_to_commit(tmp_out, 3)
    assert _meta(tmp_out)["history_ts"] == tss[:3]
    expire_snapshots(tmp_out, keep_last=1)
    meta = _meta(tmp_out)
    assert meta["history_ts"] == tss[2:3]
    # the retained snapshot still resolves; expired instants refuse
    assert _resolve_as_of_ts(meta, tss[2]) == 3
    with pytest.raises(ValueError, match="no snapshot"):
        _resolve_as_of_ts(meta, tss[1])


def test_pre_timestamp_commits_refuse(spark, tmp_out):
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    _write(spark, tmp_out, 0, 20, "overwrite")
    # simulate a store written before commit timestamps existed
    meta = _meta(tmp_out)
    meta.pop("history_ts", None)
    _write_meta(tmp_out, meta)
    with pytest.raises(ValueError, match="predates commit timestamps"):
        _resolve_as_of_ts(_meta(tmp_out), 1 << 62)
    # an append resumes the lockstep list: old entry None, new one real
    _write(spark, tmp_out, 20, 40, "append")
    tss = _meta(tmp_out)["history_ts"]
    assert tss[0] is None and tss[1] is not None
    got = (spark.read.format("pgs")
           .option("as_of_timestamp", str(tss[1])).load(tmp_out))
    assert got.count() == 40  # commit 2 addressable
    with pytest.raises(Exception, match="no snapshot"):
        (spark.read.format("pgs")
         .option("as_of_timestamp", str(tss[1] - 1)).load(tmp_out)
         .count())


def test_changes_between_timestamps(spark, tmp_out):
    from parquet_go_spark.operators.changes import (
        read_changes_between_timestamps,
    )

    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    _write(spark, tmp_out, 0, 30, "overwrite")
    _write(spark, tmp_out, 30, 60, "append")
    _write(spark, tmp_out, 60, 90, "append")
    tss = _meta(tmp_out)["history_ts"]
    # window (commit1, commit2]: exactly the second batch, as inserts
    ev = read_changes_between_timestamps(
        spark, tmp_out, tss[0], tss[1]
    ).collect()
    ks = sorted(r["k"] for r in ev)
    assert ks == list(range(30, 60))
    assert {r["_change_type"] for r in ev} == {"insert"}
    # open-ended window from commit2's instant: the third batch
    ev = read_changes_between_timestamps(spark, tmp_out, tss[1]).collect()
    assert sorted(r["k"] for r in ev) == list(range(60, 90))
    # a bound before the first commit refuses like an expired cursor
    with pytest.raises(ValueError, match="no snapshot"):
        read_changes_between_timestamps(spark, tmp_out, tss[0] - 1)


def test_pad_ts_alignment():
    assert _pad_ts(None, 3) == [None, None, None]
    assert _pad_ts([7], 3) == [None, None, 7]
    assert _pad_ts([1, 2, 3], 3) == [1, 2, 3]
