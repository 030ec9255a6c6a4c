"""Curation-operator tests: deterministic sampling/split/mix/shuffle
semantics, engine-vs-DuckDB hash parity, and the plan shapes the 100-TB
story depends on (map-only policy application, single-shuffle global
permutation)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from parquet_go_spark.operators import curation as C

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _count_exchanges(plan: str) -> int:
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("(")
        and "Exchange" in line
        and "Reused" not in line
        and "BroadcastExchange" not in line  # broadcasts aren't shuffles
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hash_parity_spark_vs_duckdb(spark, docs):
    """The 60-bit md5 hash — the root of every curation decision — must
    be bit-identical between the engine and the oracle."""
    got = {
        r["doc_id"]: r["h"]
        for r in docs.select("doc_id", C._h60("par-7").alias("h"))
        .limit(64).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = dict(
        con.execute(
            f"SELECT doc_id, {C._h60_duck('par-7')} FROM documents"
        ).fetchall()
    )
    assert all(want[k] == v for k, v in got.items())
    # 60-bit range sanity: non-negative, below 2^60
    assert all(0 <= v < (1 << 60) for v in got.values())


def test_sample_rate_extremes_and_determinism(spark, docs):
    total = {r["source"]: r["c"] for r in
             docs.groupBy("source").agg(F.count("*").alias("c")).collect()}
    out = C.sample_weighted(
        docs, {"src0": 0.0, "src1": 1.0, "src2": 0.5}, seed="t-ext"
    )
    by_src = {r["source"]: r["c"] for r in
              out.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert "src0" not in by_src            # rate 0 drops everything
    assert by_src["src1"] == total["src1"]  # rate 1 keeps everything
    assert 0 < by_src.get("src2", 0) < total["src2"]
    # sources absent from the policy are dropped
    assert set(by_src) <= {"src1", "src2"}
    # deterministic: identical result on re-run
    a = sorted(out.collect())
    b = sorted(C.sample_weighted(
        docs, {"src0": 0.0, "src1": 1.0, "src2": 0.5}, seed="t-ext"
    ).collect())
    assert a == b


def test_split_exhaustive_and_seed_sensitivity(spark, docs):
    n = docs.count()
    out = C.split_assign(docs).cache()
    try:
        assert out.count() == n
        assert out.select("doc_id").distinct().count() == n
        labels = {r["split"] for r in out.select("split").distinct().collect()}
        assert labels <= {"train", "val", "test"}
        n_train = out.filter("split = 'train'").count()
        assert 0.75 * n <= n_train <= n  # loose at 500 rows
        # a different seed reassigns some documents
        other = C.split_assign(docs, seed="other-seed")
        joined = out.join(other.withColumnRenamed("split", "s2"), "doc_id")
        assert joined.filter("split <> s2").count() > 0
    finally:
        out.unpersist()


def test_mix_copy_counts_follow_weights(spark, docs):
    total = {r["source"]: r["c"] for r in
             docs.groupBy("source").agg(F.count("*").alias("c")).collect()}
    out = C.mix_sources(
        docs, {"src0": 0.0, "src1": 2.0, "src2": 0.5, "src3": 1.25},
        seed="t-mix",
    ).cache()
    try:
        by = {r["source"]: (r["rows"], r["docs"], r["emax"]) for r in
              out.groupBy("source").agg(
                  F.count("*").alias("rows"),
                  F.countDistinct("doc_id").alias("docs"),
                  F.max("epoch").alias("emax"),
              ).collect()}
        assert "src0" not in by
        # integer weight 2.0: every doc exactly twice
        assert by["src1"] == (2 * total["src1"], total["src1"], 2)
        # fractional 0.5: each kept doc once, some docs dropped
        rows2, docs2, emax2 = by["src2"]
        assert rows2 == docs2 and 0 < docs2 < total["src2"] and emax2 == 1
        # 1.25: every doc at least once, some twice
        rows3, docs3, emax3 = by["src3"]
        assert docs3 == total["src3"] and emax3 == 2
        assert total["src3"] < rows3 < 2 * total["src3"]
    finally:
        out.unpersist()


def test_global_shuffle_is_exact_permutation(spark, docs):
    n = docs.count()
    out = C.global_shuffle(docs, seed="t-shuf")
    pos = sorted(r["pos"] for r in out.collect())
    assert pos == list(range(n))
    # deterministic under a different input partitioning
    re = C.global_shuffle(docs.repartition(7), seed="t-shuf")
    assert sorted(out.collect()) == sorted(re.collect())


def test_sample_and_mix_plans_are_map_only(spark, docs):
    for df in (
        C.sample_weighted(docs, C.SAMPLE_RATES),
        C.mix_sources(docs, C.MIX_WEIGHTS),
        C.split_assign(docs),
    ):
        plan = _plan(df)
        assert _count_exchanges(plan) == 0, plan
        assert "BroadcastHashJoin" in plan or "Project" in plan


def test_global_shuffle_single_exchange(spark, docs):
    # the position-assignment dataflow before materialization: exactly
    # one range shuffle + the broadcast of per-partition base offsets;
    # mirrors global_shuffle's internals (no Window — a Window
    # PARTITION BY pid would add a second full-data shuffle)
    spark2 = docs.sparkSession
    skey = F.md5(F.concat(F.lit("p|"), F.col("doc_id").cast("string")))
    ranged = (
        docs.select("doc_id", skey.alias("skey"))
        .repartitionByRange(4, "skey")
        .sortWithinPartitions("skey", "doc_id")
        .select(
            "doc_id",
            F.spark_partition_id().alias("pid"),
            F.expr("monotonically_increasing_id() & 8589934591")
            .alias("loc"),
        )
    )
    base_df = spark2.createDataFrame([(i, 0) for i in range(4)],
                                     "pid int, base long")
    out = ranged.join(F.broadcast(base_df), "pid", "left").select(
        (F.coalesce(F.col("base"), F.lit(0)) + F.col("loc")).alias("pos"),
        "doc_id",
    )
    plan = _plan(out)
    assert _count_exchanges(plan) == 1, plan
    # the sort must sit BELOW the local-index projection: the plan has
    # a Sort and the mid-derived loc is projected above it
    assert "Sort" in plan, plan
