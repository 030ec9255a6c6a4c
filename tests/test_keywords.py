"""Keyword extraction (operators/keywords.py): exact tf/df semantics,
tie-breaking, and the single-exchange-per-aggregate plan."""

from __future__ import annotations

from parquet_go_spark.operators.keywords import extract_keywords


def test_keywords_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple pear common common"),
            (2, "pear banana common"),
            (3, "common banana"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["rank"]): (r["w"], r["tf"], r["df"])
        for r in extract_keywords(spark, docs, k=2).collect()
    }
    # doc 1: apple tf=2 df=1 (score 2.0) > common tf=2 df=3 (0.67) and
    # pear tf=1 df=2 (0.5)
    assert got[(1, 1)] == ("apple", 2, 1)
    assert got[(1, 2)] == ("common", 2, 3)
    # doc 3: banana 1/2 beats common 1/3; ties never arise here
    assert got[(3, 1)] == ("banana", 1, 2)
    assert got[(3, 2)] == ("common", 1, 3)


def test_keywords_tie_break_by_word(spark):
    docs = spark.createDataFrame(
        [(1, "zz aa"), (2, "zz aa")], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["rank"]): r["w"]
        for r in extract_keywords(spark, docs, k=2).collect()
    }
    # identical scores (1/2): ASC word order decides, in both engines
    assert got[(1, 1)] == "aa" and got[(1, 2)] == "zz"
