"""Equality deletes: key-value delete files applied as a read-time
anti-join (the Iceberg equality-delete analog; no store scan at delete
time), their part-id cap scoping, interplay with positional tombstones,
evolution, compaction, and the lazy upsert built on them."""

from __future__ import annotations

import os
import shutil

import pytest

from parquet_go_spark.operators.compact import compact_store
from parquet_go_spark.operators.deletes import (
    delete_stats,
    delete_values,
    delete_where,
    upsert_by_key,
)
from parquet_go_spark.operators.evolve import (
    add_column,
    drop_column,
    rename_column,
)
from parquet_go_spark.sources.pgs_datasource import (
    _meta,
    describe_store,
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


def test_eq_delete_basic(spark, tmp_out):
    df = _mkstore(spark, tmp_out)
    keys = spark.createDataFrame([(2,), (4,)], "grp int")
    res = delete_values(spark, tmp_out, keys, "grp")
    assert res["keys"] == 2 and res["name"].startswith("eq-")
    back = spark.read.format("pgs").load(tmp_out)
    assert _same(back, df.filter("grp NOT IN (2, 4)"))
    st = delete_stats(tmp_out)
    assert st["eq_delete_dirs"] == 1 and st["eq_delete_keys"] == 2


def test_eq_delete_multi_column_key(spark, tmp_out):
    df = _mkstore(spark, tmp_out)
    keys = df.filter("k % 7 = 0").select("grp", "name").distinct()
    delete_values(spark, tmp_out, keys, ["grp", "name"])
    # name is unique per row here, so exactly the k%7 rows disappear
    back = spark.read.format("pgs").load(tmp_out)
    assert _same(back, df.filter("k % 7 != 0"))


def test_eq_delete_key_not_projected(spark, tmp_out):
    """The key column decodes for matching even when the read projects
    other columns only."""
    df = _mkstore(spark, tmp_out)
    delete_values(
        spark, tmp_out, spark.createDataFrame([(1,)], "grp int"), "grp"
    )
    got = spark.read.format("pgs").load(tmp_out).select("k", "name")
    assert _same(got, df.filter("grp != 1").select("k", "name"))


def test_eq_delete_null_safe(spark, tmp_out):
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    df = spark.range(0, 100).selectExpr(
        "id AS k",
        "CASE WHEN id % 10 = 0 THEN NULL "
        "ELSE concat('g', id % 3) END AS tag",
    )
    df.repartition(2).write.format("pgs").mode("overwrite").save(tmp_out)
    keys = spark.createDataFrame([(None,), ("g1",)], "tag string")
    delete_values(spark, tmp_out, keys, "tag")
    back = spark.read.format("pgs").load(tmp_out)
    # null key matches null rows (Iceberg equality-field semantics) —
    # the opposite of SQL join semantics, so spell the oracle with
    # null-safe equality
    expect = df.filter("NOT (tag <=> 'g1' OR tag IS NULL)")
    assert _same(back, expect)


def test_eq_delete_cap_scopes_to_delete_time(spark, tmp_out):
    """Rows appended AFTER the delete survive even with matching keys;
    a second delete catches them."""
    df = _mkstore(spark, tmp_out)
    delete_values(
        spark, tmp_out, spark.createDataFrame([(3,)], "grp int"), "grp"
    )
    extra = spark.range(1000, 1060).selectExpr(
        "id AS k", "CAST(3 AS INT) AS grp", "concat('x-', id) AS name"
    )
    extra.write.format("pgs").mode("append").save(tmp_out)
    back = spark.read.format("pgs").load(tmp_out)
    assert _same(back, df.filter("grp != 3").unionAll(extra))
    delete_values(
        spark, tmp_out, spark.createDataFrame([(3,)], "grp int"), "grp"
    )
    back2 = spark.read.format("pgs").load(tmp_out)
    assert _same(back2, df.filter("grp != 3"))


def test_eq_delete_combines_with_positional_and_pages(spark, tmp_out):
    df = _mkstore(spark, tmp_out, n=1000, parts=2, page_rows="64")
    delete_where(spark, tmp_out, "k BETWEEN 100 AND 140")
    delete_values(
        spark, tmp_out, spark.createDataFrame([(0,)], "grp int"), "grp"
    )
    got = (
        spark.read.format("pgs").load(tmp_out)
        .filter("k >= 90 AND k <= 300")
    )
    expect = df.filter(
        "NOT (k BETWEEN 100 AND 140) AND grp != 0 "
        "AND k >= 90 AND k <= 300"
    )
    assert _same(got, expect)


def test_eq_delete_refuses_bad_key_columns(spark, tmp_out):
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    df = spark.range(0, 50).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS score",
        "array(id, id + 1) AS toks",
    )
    df.repartition(1).write.format("pgs").mode("overwrite").save(tmp_out)
    for col in ("score", "toks", "missing", "_pgs_part"):
        with pytest.raises(ValueError):
            delete_values(spark, tmp_out, df.selectExpr("k AS x"), col)


def test_eq_delete_rename_follows_and_drop_refused(spark, tmp_out):
    df = _mkstore(spark, tmp_out)
    delete_values(
        spark, tmp_out, spark.createDataFrame([(2,)], "grp int"), "grp"
    )
    rename_column(tmp_out, "grp", "bucket")
    e = _meta(tmp_out)["eq_deletes"][0]
    assert e["key_cols"] == ["bucket"] and e["file_cols"] == ["grp"]
    back = spark.read.format("pgs").load(tmp_out)
    assert _same(
        back,
        df.filter("grp != 2").withColumnRenamed("grp", "bucket"),
    )
    with pytest.raises(ValueError, match="equality deletes"):
        drop_column(tmp_out, "bucket")


def test_eq_delete_on_added_column_default(spark, tmp_out):
    """A key column added after some partitions were written matches
    those partitions through its synthesized default."""
    df = _mkstore(spark, tmp_out)
    add_column(tmp_out, "src", "string", default="legacy")
    extra = spark.range(1000, 1050).selectExpr(
        "id AS k", "CAST(id % 5 AS INT) AS grp",
        "concat('x-', id) AS name", "'fresh' AS src",
    )
    extra.write.format("pgs").mode("append").save(tmp_out)
    delete_values(
        spark, tmp_out,
        spark.createDataFrame([("legacy",)], "src string"), "src",
    )
    back = spark.read.format("pgs").load(tmp_out)
    assert _same(back, extra)
    assert back.count() == 50 and df.count() == 600


def test_eq_delete_compaction_materializes(spark, tmp_out, tmp_path):
    df = _mkstore(spark, tmp_out)
    delete_values(
        spark, tmp_out, spark.createDataFrame([(1,)], "grp int"), "grp"
    )
    delete_where(spark, tmp_out, "k < 10")
    dst = str(tmp_path / "compacted")
    res = compact_store(spark, tmp_out, dst)
    assert res["eq_deletes_applied"] == 1
    meta = _meta(dst)
    assert "eq_deletes" not in meta and "deletes" not in meta
    assert not os.path.isdir(os.path.join(dst, "deletes"))
    back = spark.read.format("pgs").load(dst)
    assert _same(back, df.filter("grp != 1 AND k >= 10"))


def test_eq_delete_sweep_and_describe(spark, tmp_out):
    _mkstore(spark, tmp_out)
    delete_values(
        spark, tmp_out, spark.createDataFrame([(2,)], "grp int"), "grp"
    )
    # an orphan eq dir (crashed delete: renamed but never committed)
    orphan = os.path.join(tmp_out, "deletes", "eq-deadbeef0000")
    os.makedirs(orphan)
    removed = sweep_store(tmp_out)
    assert "deletes/eq-deadbeef0000" in removed
    committed = _meta(tmp_out)["eq_deletes"][0]["name"]
    assert os.path.isdir(os.path.join(tmp_out, "deletes", committed))
    d = describe_store(tmp_out)
    assert d["eq_delete_dirs"] == 1 and d["eq_delete_keys"] == 1


def test_eq_delete_idempotent_noop(spark, tmp_out):
    _mkstore(spark, tmp_out)
    res = delete_values(
        spark, tmp_out,
        spark.createDataFrame([], "grp int"), "grp",
    )
    assert res == {"keys": 0, "name": None, "cap": res["cap"]}
    assert "eq_deletes" not in (_meta(tmp_out) or {})


def test_eq_delete_encrypted_store(spark, tmp_out):
    key = "00112233445566778899aabbccddeeff"
    df = _mkstore(spark, tmp_out, key_hex=key)
    delete_values(
        spark, tmp_out,
        spark.createDataFrame([(4,)], "grp int"), "grp",
    )
    back = spark.read.format("pgs").option("key_hex", key).load(tmp_out)
    assert _same(back, df.filter("grp != 4"))


def test_upsert_lazy_converges(spark, tmp_out):
    df = _mkstore(spark, tmp_out)
    batch = spark.range(590, 650).selectExpr(
        "id AS k", "CAST(9 AS INT) AS grp", "concat('u-', id) AS name"
    )
    res = upsert_by_key(spark, tmp_out, batch, "k", lazy=True)
    assert res == {"deleted_keys": 60}
    back = spark.read.format("pgs").load(tmp_out)
    expect = df.filter("k < 590").unionAll(batch)
    assert _same(back, expect)
    # replay converges (the second delete caps before the second append)
    upsert_by_key(spark, tmp_out, batch, "k", lazy=True)
    assert _same(spark.read.format("pgs").load(tmp_out), expect)


def test_eq_delete_int_type_widening(spark, tmp_out):
    """int64 keys match int32 store chunks (and an out-of-range key
    simply matches nothing)."""
    df = _mkstore(spark, tmp_out)
    keys = spark.createDataFrame(
        [(2,), (1 << 40,)], "grp bigint"
    )
    delete_values(spark, tmp_out, keys, "grp")
    back = spark.read.format("pgs").load(tmp_out)
    assert _same(back, df.filter("grp != 2"))


def test_eq_keep_mask_fuzz_vs_python_sets():
    """The factorize+np.unique membership kernel vs a row-at-a-time
    Python tuple-set reference, across random type mixes, null rates,
    widths, and duplicate-heavy domains."""
    import random

    import pyarrow as pa

    from parquet_go_spark import eqdel

    rng = random.Random(404)

    def col(n, kind, null_p):
        def one():
            if rng.random() < null_p:
                return None
            if kind == "i32":
                return rng.randrange(-5, 6)
            if kind == "i64":
                return rng.randrange(-3, 4) * (1 << 40)
            if kind == "str":
                return rng.choice(["a", "b", "c", "", "αβ", "d"])
            if kind == "bin":
                return bytes([rng.randrange(4)])
            return rng.random() < 0.5  # bool
        t = {"i32": pa.int32(), "i64": pa.int64(), "str": pa.utf8(),
             "bin": pa.binary(), "bool": pa.bool_()}[kind]
        return pa.array([one() for _ in range(n)], type=t)

    for trial in range(60):
        ncols = rng.randrange(1, 4)
        kinds = [rng.choice(["i32", "i64", "str", "bin", "bool"])
                 for _ in range(ncols)]
        null_p = rng.choice([0.0, 0.1, 0.5])
        n, m = rng.randrange(0, 40), rng.randrange(0, 12)
        rows = [col(n, k, null_p) for k in kinds]
        keys = [col(m, k, null_p) for k in kinds]
        got = eqdel.keep_mask(rows, keys) if n else None
        key_set = set(zip(*(k.to_pylist() for k in keys))) if m else set()
        want = [
            tuple(r[i] for r in (c.to_pylist() for c in rows))
            not in key_set
            for i in range(n)
        ] if n and m else [True] * n
        if got is None:
            assert all(want), (trial, kinds, null_p)
        else:
            assert got.tolist() == want, (trial, kinds, null_p)


def test_eq_delete_bounds_prune_attachment(spark, tmp_out):
    """Integer key bounds recorded at delete time keep the anti-join
    off partitions whose stats cannot intersect — and the answer stays
    exact, including after a rename of the key column."""
    from parquet_go_spark.operators.pruned import encode_generic
    from parquet_go_spark.sources.pgs_datasource import PGSReader

    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    # m tracks k, so range clustering on k gives m tight per-partition
    # stats too — the eq key is m, which stays renameable
    df = spark.range(0, 800).selectExpr(
        "id AS k", "id + 10000 AS m", "concat('n', id) AS name"
    )
    encode_generic(spark, df, tmp_out, key_col="k", clustering="range",
                   num_parts=8)
    keys = spark.createDataFrame(
        [(10100,), (10105,), (10110,)], "m bigint"
    )
    delete_values(spark, tmp_out, keys, "m")
    e = _meta(tmp_out)["eq_deletes"][0]
    assert e["bounds"] == {"0": [10100, 10110]}

    back = spark.read.format("pgs").load(tmp_out)
    r = PGSReader(tmp_out, back.schema, {})
    parts = r.partitions()
    attached = [p for p in parts if p.value is not None and p.value[4]]
    assert 1 <= len(attached) < len(parts)
    assert _same(back, df.filter("m NOT IN (10100, 10105, 10110)"))

    # rename the key column: entry key_cols follow, stats rows resolve
    # through the alias chain, pruning and exactness both survive
    rename_column(tmp_out, "m", "mm")
    back2 = spark.read.format("pgs").load(tmp_out)
    r2 = PGSReader(tmp_out, back2.schema, {})
    attached2 = [p for p in r2.partitions()
                 if p.value is not None and p.value[4]]
    assert len(attached2) == len(attached)
    assert back2.filter("mm IN (10100, 10105, 10110)").count() == 0
    assert back2.count() == 797


def test_eq_delete_null_keys_suppress_bounds(spark, tmp_out):
    """A key set containing NULL must not record bounds for that
    column — null keys match null rows that value stats cannot see."""
    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    df = spark.range(0, 200).selectExpr(
        "id AS k",
        "CASE WHEN id >= 190 THEN NULL ELSE id END AS v",
    )
    df.repartition(4).write.format("pgs").mode("overwrite").save(tmp_out)
    keys = spark.createDataFrame([(5,), (None,)], "v bigint")
    delete_values(spark, tmp_out, keys, "v")
    assert _meta(tmp_out)["eq_deletes"][0]["bounds"] == {}
    back = spark.read.format("pgs").load(tmp_out)
    assert back.count() == 189  # 200 - one v=5 row - ten null rows
