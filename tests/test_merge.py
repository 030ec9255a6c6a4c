"""merge_into: the full conditional MERGE verb (WHEN MATCHED
UPDATE/DELETE + WHEN NOT MATCHED INSERT) over the pgs store —
tombstone-matched + one append, both arms materialized before the
tombstone commit."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from parquet_go_spark.operators.deletes import merge_into
from parquet_go_spark.sources.pgs_datasource import register


def _mkstore(spark, path, n=400, parts=3):
    register(spark)
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(0, n).selectExpr(
        "id AS k", "CAST(id % 5 AS INT) AS grp", "CAST(id * 10 AS INT) AS qty"
    )
    df.repartition(parts).write.format("pgs").mode("overwrite").save(path)
    return df


def _same(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_merge_update_and_insert(spark, tmp_out):
    df = _mkstore(spark, tmp_out)
    # source: accumulate qty on every 3rd key, insert fresh keys
    src = (
        df.filter("k % 3 = 0").selectExpr("k", "grp", "CAST(7 AS INT) AS qty")
        .unionAll(spark.range(1000, 1010).selectExpr(
            "id AS k", "CAST(9 AS INT) AS grp", "CAST(1 AS INT) AS qty"))
    )
    res = merge_into(
        spark, tmp_out, src, "k",
        when_matched={"qty": "t.qty + s.qty"},
        when_not_matched=True,
    )
    assert res["matched_rows"] == df.filter("k % 3 = 0").count()
    assert res["inserted_rows"] == 10
    back = spark.read.format("pgs").load(tmp_out)
    expect = (
        df.withColumn(
            "qty",
            F.when(F.col("k") % 3 == 0, F.col("qty") + 7)
            .otherwise(F.col("qty")).cast("int"),
        )
        .unionAll(spark.range(1000, 1010).selectExpr(
            "id AS k", "CAST(9 AS INT) AS grp", "CAST(1 AS INT) AS qty"))
    )
    assert _same(back, expect)


def test_merge_delete_matched(spark, tmp_out):
    df = _mkstore(spark, tmp_out)
    src = df.filter("grp = 2").select("k")
    res = merge_into(spark, tmp_out, src, "k", when_matched="delete")
    assert res["matched_rows"] == df.filter("grp = 2").count()
    assert res["inserted_rows"] == 0
    back = spark.read.format("pgs").load(tmp_out)
    assert _same(back, df.filter("grp != 2"))


def test_merge_matched_condition_narrows(spark, tmp_out):
    df = _mkstore(spark, tmp_out)
    src = df.select("k", "grp", "qty")
    merge_into(
        spark, tmp_out, src, "k",
        when_matched={"qty": "t.qty + 1"},
        matched_condition="s.grp = 1",
    )
    back = spark.read.format("pgs").load(tmp_out)
    expect = df.withColumn(
        "qty",
        F.when(F.col("grp") == 1, F.col("qty") + 1)
        .otherwise(F.col("qty")).cast("int"),
    )
    assert _same(back, expect)


def test_merge_insert_projection_dict(spark, tmp_out):
    df = _mkstore(spark, tmp_out)
    src = spark.range(2000, 2005).selectExpr("id AS k", "id * 2 AS v")
    merge_into(
        spark, tmp_out, src, "k",
        when_not_matched={"k": "s.k", "grp": "CAST(s.v % 5 AS INT)",
                          "qty": "CAST(s.v AS INT)"},
        not_matched_condition="s.k % 2 = 0",
    )
    back = spark.read.format("pgs").load(tmp_out)
    inserted = back.filter("k >= 2000")
    assert inserted.count() == 3  # 2000, 2002, 2004
    assert _same(
        inserted,
        spark.sql("SELECT * FROM VALUES "
                  "(2000L, CAST(0 AS INT), CAST(4000 AS INT)),"
                  "(2002L, CAST(4 AS INT), CAST(4004 AS INT)),"
                  "(2004L, CAST(3 AS INT), CAST(4008 AS INT)) "
                  "AS v(k, grp, qty)"),
    )
    assert _same(back.filter("k < 2000"), df)


def test_merge_ambiguous_source_refused(spark, tmp_out):
    _mkstore(spark, tmp_out)
    dup = spark.createDataFrame(
        [(3, 0, 1), (3, 0, 2)], "k long, grp int, qty int"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_into(spark, tmp_out, dup, "k",
                   when_matched={"qty": "s.qty"})
    # duplicates confined to the INSERT arm are allowed (both insert)
    dup_ins = spark.createDataFrame(
        [(5000, 0, 1), (5000, 0, 2)], "k long, grp int, qty int"
    )
    res = merge_into(spark, tmp_out, dup_ins, "k",
                     when_matched={"qty": "s.qty"},
                     when_not_matched=True)
    assert res["inserted_rows"] == 2


def test_merge_noop_and_guards(spark, tmp_out):
    df = _mkstore(spark, tmp_out)
    empty = spark.createDataFrame([], "k long, grp int, qty int")
    res = merge_into(spark, tmp_out, empty, "k",
                     when_matched={"qty": "s.qty"}, when_not_matched=True)
    assert res == {"matched_rows": 0, "inserted_rows": 0, "name": None}
    assert _same(spark.read.format("pgs").load(tmp_out), df)
    with pytest.raises(ValueError, match="at least one action"):
        merge_into(spark, tmp_out, empty, "k")
    with pytest.raises(ValueError, match="must be 'delete'"):
        merge_into(spark, tmp_out, empty, "k", when_matched="drop")
    with pytest.raises(ValueError, match="no column"):
        merge_into(spark, tmp_out, empty, "nope",
                   when_matched={"qty": "s.qty"})
    with pytest.raises(ValueError, match="lacks store columns"):
        merge_into(spark, tmp_out,
                   spark.createDataFrame([(1,)], "k long"), "k",
                   when_not_matched=True)


def test_merge_null_keys_never_match(spark, tmp_out):
    """ANSI ON-clause equality: a null source key matches nothing and
    (with insert on) inserts."""
    df = _mkstore(spark, tmp_out)
    src = spark.createDataFrame(
        [(None, 9, 1)], "k long, grp int, qty int"
    )
    res = merge_into(spark, tmp_out, src, "k",
                     when_matched={"qty": "s.qty"},
                     when_not_matched=True)
    assert res["matched_rows"] == 0 and res["inserted_rows"] == 1
    back = spark.read.format("pgs").load(tmp_out)
    assert back.filter("k IS NULL").count() == 1
    assert _same(back.filter("k IS NOT NULL"), df)


def test_merge_tside_condition_insert_arm_exact(spark, tmp_out):
    """The matched arm pushes a t-side condition into its scan; the
    insert arm must plan on a FRESH load (the engine's scan cache
    replays a prior pushdown for later executions of the same loaded
    relation), or matched rows in pruned-away partitions would
    misclassify as unmatched and re-insert."""
    df = _mkstore(spark, tmp_out, n=400, parts=4)
    # source hits every grp; the matched condition touches only grp=1
    src = df.select("k", "grp").selectExpr(
        "k", "grp", "CAST(1 AS INT) AS qty"
    )
    res = merge_into(
        spark, tmp_out, src, "k",
        when_matched={"qty": "t.qty + s.qty"},
        matched_condition="t.grp = 1",
        when_not_matched=True,
    )
    # every source row matches SOME store row: nothing may insert
    assert res["inserted_rows"] == 0
    back = spark.read.format("pgs").load(tmp_out)
    assert back.count() == 400
    expect = df.withColumn(
        "qty",
        F.when(F.col("grp") == 1, F.col("qty") + 1)
        .otherwise(F.col("qty")).cast("int"),
    )
    assert _same(back, expect)


def test_merge_empty_update_dict_refused(spark, tmp_out):
    _mkstore(spark, tmp_out, n=50)
    src = spark.createDataFrame([(1, 0, 1)], "k long, grp int, qty int")
    with pytest.raises(ValueError, match="updates no columns"):
        merge_into(spark, tmp_out, src, "k", when_matched={})
    assert spark.read.format("pgs").load(tmp_out).count() == 50
