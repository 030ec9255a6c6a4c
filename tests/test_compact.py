"""Compaction: merged stores decode identically with fewer partitions.

The maintenance pass an Iceberg-style store needs (rewrite_data_files
analog) that the write-once reference never had; data-path invariants
mirror the encode job's (same kernel, same manifest treatment).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from parquet_go_spark.operators.compact import compact_store, plan_compaction
from parquet_go_spark.operators.decode_job import decode_table
from parquet_go_spark.operators.encode_job import encode_table
from parquet_go_spark.operators.store import ManifestStore
from parquet_go_spark.sources.synth import token_sequences

TOKEN_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"
TOKEN_COLS = ["doc_id", "tokens", "n_tok", "source"]


# ---------- pure planner ----------

def test_plan_compaction_groups_adjacent_small_parts():
    parts = [(0, 100), (1, 100), (2, 100), (3, 1000), (4, 50), (5, 50)]
    groups = plan_compaction(parts, target_raw=300)
    assert groups == [[0, 1, 2], [3], [4, 5]]
    # order preserved, every part exactly once
    flat = [p for g in groups for p in g]
    assert flat == [0, 1, 2, 3, 4, 5]


def test_plan_compaction_respects_target():
    groups = plan_compaction([(i, 120) for i in range(10)], target_raw=300)
    assert all(sum(120 for _ in g) <= 300 or len(g) == 1 for g in groups)
    assert [len(g) for g in groups] == [2, 2, 2, 2, 2]


def test_plan_compaction_single_big_part_untouched():
    assert plan_compaction([(7, 10**9)], target_raw=100) == [[7]]


# ---------- end-to-end ----------

@pytest.fixture(scope="module")
def small_part_store(spark):
    src = token_sequences(spark, 4000, partitions=4)
    out = tempfile.mkdtemp(prefix="compact_src_")
    # tiny target -> many small partitions
    store, plan = encode_table(spark, src, out, target_tokens=50_000,
                               resume=False)
    n_committed = store.manifest(spark).select("part_id").distinct().count()
    yield out, src, n_committed
    shutil.rmtree(out, ignore_errors=True)


def test_compact_reduces_parts_and_preserves_data(spark, small_part_store):
    src_dir, src_df, n_src = small_part_store
    dst_dir = tempfile.mkdtemp(prefix="compact_dst_")
    shutil.rmtree(dst_dir, ignore_errors=True)
    try:
        res = compact_store(spark, src_dir, dst_dir,
                            target_raw=4 << 20)
        assert res["src_parts"] == n_src
        assert res["dst_parts"] < n_src
        assert res["merged_groups"] >= 1
        dec = decode_table(spark, dst_dir, TOKEN_COLS, TOKEN_SCHEMA)
        assert dec.exceptAll(src_df).count() == 0
        assert src_df.exceptAll(dec).count() == 0
        # manifest consistency: contiguous new ids, row counts conserved
        dst = ManifestStore(dst_dir)
        m = dst.manifest(spark)
        ids = [r["part_id"] for r in
               m.select("part_id").distinct().orderBy("part_id").collect()]
        assert ids == list(range(res["dst_parts"]))
        rows_src = ManifestStore(src_dir).manifest(spark).filter(
            F.col("col") == "doc_id").agg(F.sum("count")).collect()[0][0]
        rows_dst = m.filter(F.col("col") == "doc_id").agg(
            F.sum("count")).collect()[0][0]
        assert rows_src == rows_dst
        # lineage metadata present for merged groups
        meta = dst.meta()
        assert meta["num_parts"] == res["dst_parts"]
        assert len(meta["lineage"]) == res["merged_groups"]
        src_ids_in_lineage = [p for g in meta["lineage"].values() for p in g]
        assert len(src_ids_in_lineage) == len(set(src_ids_in_lineage))
    finally:
        shutil.rmtree(dst_dir, ignore_errors=True)


def test_compact_refuses_existing_destination(spark, small_part_store):
    src_dir, _, _ = small_part_store
    with pytest.raises(ValueError, match="already exists"):
        compact_store(spark, src_dir, src_dir)


def test_compact_plan_shape_single_shuffle(spark, small_part_store):
    """The recode arm must shuffle exactly once (on new_part); the
    passthrough arm must be shuffle-free — the 100 TB contract."""
    src_dir, _, _ = small_part_store
    src = ManifestStore(src_dir)
    sizes = (src.manifest(spark).groupBy("part_id")
             .agg(F.sum("raw_size").alias("raw")))
    mapping = spark.createDataFrame(
        [(r["part_id"], 0, True) for r in sizes.collect()],
        "part_id int, new_part int, merged boolean",
    )
    joined = src.blobs(spark).join(F.broadcast(mapping), "part_id")
    plan = joined.filter(~F.col("merged"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, (
        "passthrough arm must not shuffle (broadcast map join only)"
    )


def test_compact_encrypted_store(spark):
    """Merged groups must unseal with the store key and re-seal; the
    compacted store stays unreadable without the key."""
    key = bytes(range(32, 64))
    src = token_sequences(spark, 1500, partitions=2)
    src_dir = tempfile.mkdtemp(prefix="compact_enc_")
    shutil.rmtree(src_dir, ignore_errors=True)
    dst_dir = src_dir + "_dst"
    try:
        encode_table(spark, src, src_dir, target_tokens=40_000,
                     resume=False, encryption_key=key)
        res = compact_store(spark, src_dir, dst_dir, target_raw=8 << 20,
                            encryption_key=key)
        assert res["merged_groups"] >= 1
        dec = decode_table(spark, dst_dir, TOKEN_COLS, TOKEN_SCHEMA,
                           encryption_key=key)
        assert dec.exceptAll(src).count() == 0
        assert src.exceptAll(dec).count() == 0
        with pytest.raises(Exception):
            decode_table(spark, dst_dir, TOKEN_COLS, TOKEN_SCHEMA).collect()
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(dst_dir, ignore_errors=True)


def test_empty_blob_table_matches_blob_schema(spark):
    """_empty_blob_table is a hand-written pyarrow twin of BLOB_SCHEMA
    (executors cannot parse DDL without a session); this pins the two
    spellings together so a schema change cannot silently diverge the
    fully-deleted/all-retired compaction branch."""
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    from parquet_go_spark.operators.compact import _empty_blob_table
    from parquet_go_spark.operators.store import BLOB_SCHEMA

    want = to_arrow_schema(StructType.fromDDL(BLOB_SCHEMA))
    got = _empty_blob_table().schema
    assert got.names == want.names
    for g, w in zip(got, want):
        assert g.type == w.type, g.name


# ---------- recluster (rewrite with sort order) ----------

def test_recluster_store_orders_and_materializes(spark, tmp_path):
    from parquet_go_spark.operators.compact import recluster_store
    from parquet_go_spark.operators.deletes import delete_where
    from parquet_go_spark.sources.pgs_datasource import (
        _dataset, _meta, register,
    )

    register(spark)
    src = str(tmp_path / "shuffled")
    dst = str(tmp_path / "ranged")
    # keys deliberately scattered across partitions: every partition's
    # [vmin, vmax] on k covers nearly the whole domain
    df = spark.range(0, 900).selectExpr(
        "id AS k", "CAST(id % 7 AS INT) AS grp"
    ).repartition(4)
    df.write.format("pgs").mode("overwrite").save(src)
    delete_where(spark, src, "grp = 3")

    res = recluster_store(spark, src, dst, "k")
    assert res["dst_parts"] == res["src_parts"] == 4

    back = spark.read.format("pgs").load(dst)
    expect = df.filter("grp != 3")
    assert back.exceptAll(expect).count() == 0
    assert expect.exceptAll(back).count() == 0

    # the whole point: per-partition key bounds are now non-overlapping
    t = _dataset(dst).to_table(columns=["part_id", "col", "vmin", "vmax"])
    bounds = sorted(
        (int(vmin), int(vmax))
        for c, vmin, vmax in zip(t.column("col").to_pylist(),
                                 t.column("vmin").to_pylist(),
                                 t.column("vmax").to_pylist())
        if c == "k"
    )
    assert len(bounds) == 4
    for (lo1, hi1), (lo2, hi2) in zip(bounds, bounds[1:]):
        assert hi1 < lo2  # disjoint ranges

    # tombstones materialized; lineage recorded; sort key declared
    m = _meta(dst)
    assert not m.get("deletes")
    assert m["reclustered_from"].endswith("shuffled")
    assert m["key_col"] == "k"

    # a range read through pushdown now plans a strict partition subset
    one = (
        spark.read.format("pgs").option("pushdown", "true").load(dst)
        .filter("k >= 10 AND k <= 20")
    )
    assert one.count() == expect.filter("k >= 10 AND k <= 20").count()


def test_recluster_store_target_rows_and_guards(spark, tmp_path):
    from parquet_go_spark.operators.compact import recluster_store
    from parquet_go_spark.sources.pgs_datasource import register

    register(spark)
    src = str(tmp_path / "src2")
    spark.range(0, 600).selectExpr("id AS k", "id * 2 AS v") \
        .repartition(3).write.format("pgs").mode("overwrite").save(src)
    dst = str(tmp_path / "dst2")
    res = recluster_store(spark, src, dst, "k", target_rows=100)
    assert res["dst_parts"] == 6
    back = spark.read.format("pgs").load(dst)
    assert back.count() == 600
    with pytest.raises(ValueError, match="already exists"):
        recluster_store(spark, src, dst, "k")
    with pytest.raises(ValueError, match="no column"):
        recluster_store(spark, src, str(tmp_path / "dst3"), "nope")


def test_recluster_zorder_multi_key_locality(spark, tmp_path):
    """Z-order (list of keys): a box filter on BOTH axes — and a range
    on EITHER single axis — must intersect a strict subset of the
    partitions' stats bounds, which a linear single-key order cannot
    give for the second axis."""
    from parquet_go_spark.operators.compact import recluster_store
    from parquet_go_spark.sources.pgs_datasource import (
        _dataset, _meta, register,
    )

    register(spark)
    src = str(tmp_path / "grid")
    dst = str(tmp_path / "zordered")
    # a 64x64 grid, scattered: every source partition spans both axes
    df = spark.range(0, 64 * 64).selectExpr(
        "CAST(id % 64 AS INT) AS x",
        "CAST(id DIV 64 AS INT) AS y",
        "id AS payload",
    ).repartition(8)
    df.write.format("pgs").mode("overwrite").save(src)

    res = recluster_store(spark, src, dst, ["x", "y"], target_rows=256)
    assert res["dst_parts"] == 16
    assert _meta(dst)["zorder_by"] == ["x", "y"]

    back = spark.read.format("pgs").load(dst)
    assert back.exceptAll(df).count() == 0
    assert df.exceptAll(back).count() == 0
    assert "__pgs_zcluster" not in back.columns

    t = _dataset(dst).to_table(columns=["part_id", "col", "vmin", "vmax"])
    bounds: dict[str, dict[int, tuple[int, int]]] = {"x": {}, "y": {}}
    for p, c, vmin, vmax in zip(
        t.column("part_id").to_pylist(), t.column("col").to_pylist(),
        t.column("vmin").to_pylist(), t.column("vmax").to_pylist(),
    ):
        if c in bounds:
            bounds[c][p] = (int(vmin), int(vmax))
    parts = sorted(bounds["x"])
    assert len(parts) == 16

    def hits(col, lo, hi):
        return sum(
            1 for p in parts
            if not (bounds[col][p][1] < lo or bounds[col][p][0] > hi)
        )

    # a 16-wide slab on either axis intersects a strict subset; the box
    # on both axes intersects very few (Morton locality)
    assert hits("x", 0, 15) <= 8
    assert hits("y", 0, 15) <= 8
    box = sum(
        1 for p in parts
        if not (bounds["x"][p][1] < 0 or bounds["x"][p][0] > 15)
        and not (bounds["y"][p][1] < 0 or bounds["y"][p][0] > 15)
    )
    assert box <= 4


def test_recluster_zorder_guards(spark, tmp_path):
    from parquet_go_spark.operators.compact import recluster_store
    from parquet_go_spark.sources.pgs_datasource import register

    register(spark)
    src = str(tmp_path / "src3")
    spark.range(0, 100).selectExpr(
        "id AS k", "concat('s', id) AS name"
    ).write.format("pgs").mode("overwrite").save(src)
    with pytest.raises(ValueError, match="zorder key"):
        recluster_store(spark, src, str(tmp_path / "d"), ["k", "name"])


def test_recluster_zorder_temporal_and_many_keys(spark, tmp_path):
    """Temporal keys normalize through a double cast (manifest stats
    are not numeric-formatted for them), and a 5-key list shrinks the
    per-key bit budget so no interleaved position reaches the BIGINT
    sign bit — content stays exact in both cases."""
    from parquet_go_spark.operators.compact import recluster_store
    from parquet_go_spark.sources.pgs_datasource import register

    register(spark)
    src = str(tmp_path / "tsrc")
    df = spark.range(0, 500).selectExpr(
        "id AS k",
        "timestamp_seconds(1700000000 + id * 60) AS ts",
        "CAST(id % 9 AS INT) AS a", "CAST(id % 7 AS INT) AS b",
        "CAST(id % 5 AS INT) AS c",
    ).repartition(3)
    df.write.format("pgs").mode("overwrite").save(src)

    dst1 = str(tmp_path / "tz")
    recluster_store(spark, src, dst1, ["ts", "k"])
    back1 = spark.read.format("pgs").load(dst1)
    assert back1.exceptAll(df).count() == 0
    assert df.exceptAll(back1).count() == 0

    dst2 = str(tmp_path / "z5")
    recluster_store(spark, src, dst2, ["k", "a", "b", "c", "ts"])
    back2 = spark.read.format("pgs").load(dst2)
    assert back2.exceptAll(df).count() == 0
    assert df.exceptAll(back2).count() == 0


def test_compact_clears_expiry_state(spark, tmp_path):
    """Compacting an expired store must drop history_base(+cap) and
    delete_seq with the history: part ids are rebased to 0..N, so stale
    expiry state under a FRESH history rebuilt by later appends would
    mis-number snapshots and null out _pgs_commit lineage (found by the
    chaos model's changelog-replay arm, seed 7)."""
    from parquet_go_spark.operators.changes import read_changes
    from parquet_go_spark.operators.deletes import delete_where
    from parquet_go_spark.sources.pgs_datasource import (
        _meta, expire_snapshots, register,
    )

    register(spark)
    src = str(tmp_path / "exp_src")
    for lo, mode in ((0, "overwrite"), (100, "append"), (200, "append")):
        spark.range(lo, lo + 100).selectExpr(
            "id AS k", "CAST(id % 5 AS INT) AS grp"
        ).repartition(2).write.format("pgs").mode(mode).save(src)
    delete_where(spark, src, "grp = 2")
    expire_snapshots(src, keep_last=1)
    assert _meta(src)["history_base"] == 2

    dst = str(tmp_path / "exp_dst")
    compact_store(spark, src, dst, target_raw=1 << 30)
    m = _meta(dst)
    for stale in ("history", "history_base", "history_base_cap",
                  "delete_seq", "deletes", "tags", "pid_floor"):
        assert stale not in m, stale

    # appends rebuild a CLEAN timeline: the compacted dataset becomes
    # the synthesized snapshot 1, the append snapshot 2, every row's
    # lineage resolves, and the changelog replays exactly
    spark.range(300, 360).selectExpr(
        "id AS k", "CAST(id % 5 AS INT) AS grp"
    ).repartition(2).write.format("pgs").mode("append").save(dst)
    rows = (
        spark.read.format("pgs").option("with_commit", "true")
        .load(dst).collect()
    )
    assert {r["_pgs_commit"] for r in rows if r["k"] >= 300} == {2}
    assert {r["_pgs_commit"] for r in rows if r["k"] < 300} == {1}
    ev = read_changes(spark, dst, since_commit=1).collect()
    assert sorted(r["k"] for r in ev) == list(range(300, 360))
    assert {r["_pgs_commit"] for r in ev} == {2}
