"""Corpus-hygiene operator tests: decontamination semantics + plan shape
(broadcast eval side, no train-corpus join shuffle), PII redaction
counts/digests, and the duplicate-2-gram quality signal — plus
engine-vs-DuckDB parity for all three (the driver-gate contract)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from parquet_go_spark.operators import contamination as C
from parquet_go_spark.operators import curation as Cur

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con


def _parity(df, con, sql):
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


# ------------------------------------------------------------- decontam

def test_decontam_parity(spark, docs, oracle):
    _parity(C.decontam_overlap_query(spark, SF), oracle, C.DECONTAM_ORACLE)


def test_decontam_excludes_eval_docs(spark, docs):
    """Output rows are train docs only: the eval set never reports
    contamination against itself."""
    out = C.decontam_overlap(docs)
    eval_ids = {
        r["doc_id"]
        for r in docs.select("doc_id")
        .filter(Cur._h60(C.DECON_SEED) < F.lit(C.EVAL_THR)).collect()
    }
    assert eval_ids, "eval set must be non-empty at this rate"
    got_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert not (got_ids & eval_ids)


def test_decontam_ratio_bounds(spark, docs):
    rows = C.decontam_overlap(docs).collect()
    assert rows, "synthetic corpus must show non-trivial overlap"
    for r in rows:
        assert 1 <= r["n_shared"] <= r["n_shingles"]
        assert 0.0 < r["overlap_ratio"] <= 1.0


def test_decontam_plan_broadcasts_eval_side(spark, docs):
    """The eval shingle set ships as a broadcast: the train corpus must
    not be shuffled for the join (the 100-TB contract — benchmarks are
    tiny, corpora are not)."""
    plan = _plan(C.decontam_overlap(docs))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------------------------- pii scrub

def test_pii_parity(spark, oracle):
    _parity(C.pii_scrub_query(spark, SF), oracle, C.PII_SCRUB_ORACLE)


def test_pii_counts_and_redaction(spark):
    rows = C.pii_scrub_query(spark, SF).collect()
    for r in rows:
        # exactly one specimen of each class is injected per row
        assert r["n_email"] == 1
        assert r["n_ip"] == 1
        assert r["n_phone"] == 1
    # and the scrubbed text really is scrubbed
    spark.read.parquet(f"{SF}/documents.parquet").createOrReplaceTempView(
        "documents_v"
    )
    probe = spark.sql(
        C.PII_SCRUB_SPARK.replace("md5(t3) AS scrub_digest",
                                  "t3 AS scrubbed")
    ).limit(8).collect()
    for r in probe:
        assert "@" not in r["scrubbed"]
        assert "<EMAIL>" in r["scrubbed"]
        assert "<IP>" in r["scrubbed"]
        assert "<PHONE>" in r["scrubbed"]


def test_pii_plan_is_map_only(spark):
    plan = _plan(C.pii_scrub_query(spark, SF))
    assert "Exchange" not in plan


# ------------------------------------------------------------- dup ngram

def test_dup_ngram_parity(spark, oracle):
    _parity(C.dup_ngram_query(spark, SF), oracle, C.DUP_NGRAM_ORACLE)


def test_dup_ngram_hand_example(spark):
    """'a b a b a' -> 2-grams [a b, b a, a b, b a]: all 4 duplicated."""
    spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y z")], "doc_id int, text string"
    ).createOrReplaceTempView("documents_v")
    got = {r["doc_id"]: r for r in spark.sql(C.DUP_NGRAM_SPARK).collect()}
    assert got[1]["n_grams"] == 4 and got[1]["n_dup"] == 4
    assert got[1]["dup_ratio"] == 1.0
    assert got[2]["n_grams"] == 2 and got[2]["n_dup"] == 0
    assert got[2]["dup_ratio"] == 0.0
