"""Staging branches (write-audit-publish): append to a branch, audit
its view in isolation, fast-forward main on publish — the Iceberg
branch-ref / WAP pattern. Branch views are pure metadata (a generation
subset); part ids stay globally unique across main and every branch."""

from __future__ import annotations

import shutil

import pytest

from parquet_go_spark.operators.compact import compact_store
from parquet_go_spark.operators.deletes import (
    delete_values,
    delete_where,
    merge_into,
    update_where,
    upsert_by_key,
)
from parquet_go_spark.operators.evolve import add_column
from parquet_go_spark.sources.pgs_datasource import (
    _meta,
    create_branch,
    drop_branch,
    publish_branch,
    register,
    rollback_to_commit,
    sweep_store,
)


def _mkstore(spark, path, n=300, parts=3):
    register(spark)
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(0, n).selectExpr(
        "id AS k", "CAST(id % 5 AS INT) AS grp", "concat('r-', id) AS name"
    )
    df.repartition(parts).write.format("pgs").mode("overwrite").save(path)
    return df


def _batch(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id % 5 AS INT) AS grp", "concat('r-', id) AS name"
    )


def _same(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def _write_branch(df, path, name):
    (df.write.format("pgs").mode("append")
       .option("branch", name).save(path))


def test_branch_isolation_and_publish(spark, tmp_out):
    df = _mkstore(spark, tmp_out)
    create_branch(tmp_out, "audit")
    staged = _batch(spark, 300, 400)
    _write_branch(staged.repartition(2), tmp_out, "audit")

    main = spark.read.format("pgs").load(tmp_out)
    assert _same(main, df)  # main blind to the staged files
    br = (spark.read.format("pgs").option("branch", "audit")
          .load(tmp_out))
    assert _same(br, df.unionAll(staged))  # branch sees base + staged

    res = publish_branch(tmp_out, "audit")
    assert res["published_commits"] == 1
    main2 = spark.read.format("pgs").load(tmp_out)
    assert _same(main2, df.unionAll(staged))
    # the branch is gone; its option is now an error
    with pytest.raises(Exception, match="no branch"):
        (spark.read.format("pgs").option("branch", "audit")
         .load(tmp_out).count())


def test_branch_multi_commit_history_extends_main(spark, tmp_out):
    _mkstore(spark, tmp_out)
    create_branch(tmp_out, "b")
    _write_branch(_batch(spark, 300, 350), tmp_out, "b")
    _write_branch(_batch(spark, 350, 420), tmp_out, "b")
    base_hist = len(_meta(tmp_out)["history"])
    publish_branch(tmp_out, "b")
    meta = _meta(tmp_out)
    assert len(meta["history"]) == base_hist + 2
    # published snapshots time-travel like native commits
    k = base_hist + 1
    snap = (spark.read.format("pgs").option("as_of_commit", k)
            .load(tmp_out))
    assert snap.count() == 300 + 50


def test_drop_branch_orphans_are_swept(spark, tmp_out):
    df = _mkstore(spark, tmp_out)
    create_branch(tmp_out, "trash")
    _write_branch(_batch(spark, 300, 340), tmp_out, "trash")
    drop_branch(tmp_out, "trash")
    removed = sweep_store(tmp_out)
    assert removed  # the staged generation's files were orphaned
    assert _same(spark.read.format("pgs").load(tmp_out), df)


def test_publish_refused_after_main_advances(spark, tmp_out):
    _mkstore(spark, tmp_out)
    create_branch(tmp_out, "b")
    _write_branch(_batch(spark, 300, 320), tmp_out, "b")
    # main advances while the branch is open (plain append is allowed)
    _batch(spark, 900, 920).write.format("pgs").mode("append").save(tmp_out)
    with pytest.raises(ValueError, match="main advanced"):
        publish_branch(tmp_out, "b")
    drop_branch(tmp_out, "b")


def test_branch_view_excludes_posterior_main_commits(spark, tmp_out):
    df = _mkstore(spark, tmp_out)
    create_branch(tmp_out, "b")
    staged = _batch(spark, 300, 320)
    _write_branch(staged, tmp_out, "b")
    late = _batch(spark, 900, 920)
    late.write.format("pgs").mode("append").save(tmp_out)
    br = spark.read.format("pgs").option("branch", "b").load(tmp_out)
    # branch = main AS OF the branch point + staged; the late commit is
    # outside base_gens and invisible
    assert _same(br, df.unionAll(staged))
    drop_branch(tmp_out, "b")


def test_pid_namespace_shared_across_branch_and_main(spark, tmp_out):
    _mkstore(spark, tmp_out)
    create_branch(tmp_out, "b")
    _write_branch(_batch(spark, 300, 340).repartition(2), tmp_out, "b")
    # a main append while the branch holds higher pids must allocate
    # above them — publish later may not collide
    _batch(spark, 900, 910).write.format("pgs").mode("append").save(tmp_out)
    drop_branch(tmp_out, "b")
    register(spark)
    pids = (
        spark.read.format("pgs").option("with_pos", "true").load(tmp_out)
        .selectExpr("_pgs_part").distinct().toPandas()["_pgs_part"]
    )
    assert len(set(pids)) == len(pids)
    # fresh branch over the advanced main publishes cleanly
    create_branch(tmp_out, "b2")
    _write_branch(_batch(spark, 950, 960), tmp_out, "b2")
    publish_branch(tmp_out, "b2")
    all_pids = (
        spark.read.format("pgs").option("with_pos", "true").load(tmp_out)
        .selectExpr("_pgs_part").distinct().toPandas()["_pgs_part"]
    )
    assert len(set(all_pids)) == len(all_pids)


def test_main_takedowns_apply_to_branch_reads(spark, tmp_out):
    """Positional/equality deletes committed BEFORE the branch opened
    keep applying to branch reads of shared partitions (takedown
    semantics, same as snapshot reads)."""
    df = _mkstore(spark, tmp_out)
    delete_where(spark, tmp_out, "grp = 2")
    create_branch(tmp_out, "b")
    staged = _batch(spark, 300, 310)
    _write_branch(staged, tmp_out, "b")
    br = spark.read.format("pgs").option("branch", "b").load(tmp_out)
    expect = df.filter("grp != 2").unionAll(staged)
    assert _same(br, expect)
    drop_branch(tmp_out, "b")


def test_mutations_refused_while_branch_open(spark, tmp_out):
    _mkstore(spark, tmp_out)
    create_branch(tmp_out, "b")
    keys = spark.createDataFrame([(1,)], "grp int")
    batch = _batch(spark, 300, 310)
    for op in (
        lambda: delete_where(spark, tmp_out, "grp = 1"),
        lambda: delete_values(spark, tmp_out, keys, "grp"),
        lambda: update_where(spark, tmp_out, "grp = 1",
                             {"name": "concat(name, '!')"}),
        lambda: upsert_by_key(spark, tmp_out, batch, "k"),
        lambda: merge_into(spark, tmp_out, batch, "k",
                           when_matched={"name": "s.name"}),
        lambda: add_column(tmp_out, "extra", "int", 0),
        lambda: rollback_to_commit(tmp_out, 1),
        lambda: compact_store(spark, tmp_out, tmp_out + "-c"),
        lambda: batch.write.format("pgs").mode("overwrite").save(tmp_out),
    ):
        with pytest.raises(Exception, match="branches exist"):
            op()
    drop_branch(tmp_out, "b")


def test_branch_guards(spark, tmp_out):
    _mkstore(spark, tmp_out)
    create_branch(tmp_out, "b")
    with pytest.raises(ValueError, match="already exists"):
        create_branch(tmp_out, "b")
    # branch is a head, not a timeline address
    with pytest.raises(Exception, match="cannot combine"):
        (spark.read.format("pgs").option("branch", "b")
         .option("as_of_commit", 1).load(tmp_out).count())
    # overwrite through the branch option is refused
    with pytest.raises(Exception, match="append-only"):
        (_batch(spark, 0, 5).write.format("pgs").mode("overwrite")
         .option("branch", "b").save(tmp_out))
    # append to a nonexistent branch is refused
    with pytest.raises(Exception, match="no branch"):
        (_batch(spark, 0, 5).write.format("pgs").mode("append")
         .option("branch", "nope").save(tmp_out))
    drop_branch(tmp_out, "b")
    with pytest.raises(ValueError, match="no branch"):
        publish_branch(tmp_out, "b")


def test_empty_branch_view_does_not_leak_main(spark, tmp_out):
    """A branch whose view holds zero files must read as empty — never
    fall back to main's current dataset (post-branch main commits would
    leak in)."""
    import pyspark.sql.types as T

    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    empty = spark.createDataFrame(
        [], T.StructType.fromDDL("k long, grp int, name string")
    )
    empty.write.format("pgs").mode("overwrite").save(tmp_out)
    create_branch(tmp_out, "b")
    _batch(spark, 0, 40).write.format("pgs").mode("append").save(tmp_out)
    br = spark.read.format("pgs").option("branch", "b").load(tmp_out)
    assert br.count() == 0
    assert spark.read.format("pgs").load(tmp_out).count() == 40
    drop_branch(tmp_out, "b")
