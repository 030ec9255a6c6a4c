"""BM25 retrieval (operators/retrieval.py): score semantics vs a
pure-Python reference of the same formula, rank determinism, and the
idf direction (rarer term outranks a common one at equal tf)."""

from __future__ import annotations

import math

from parquet_go_spark.operators.retrieval import bm25_topk

DOCS = [
    (1, "spark join join merge"),
    (2, "spark filter filter filter"),
    (3, "join merge merge table scan"),
    (4, "table table table table scan"),
]


def _py_bm25(docs, query_terms):
    """The operator's exact formula, in plain Python doubles."""
    tf = {}
    for doc_id, text in docs:
        for w in text.split(" "):
            tf[(doc_id, w)] = tf.get((doc_id, w), 0) + 1
    dl = {d: sum(v for (dd, _), v in tf.items() if dd == d)
          for d, _ in docs}
    df = {}
    for (_, w) in tf:
        df[w] = df.get(w, 0) + 1
    n_docs = len(docs)
    total_len = sum(dl.values())
    scores = {}
    for d, _ in docs:
        parts = []
        for w in sorted(query_terms):
            t = tf.get((d, w))
            if t is None:
                continue
            idf = (2 * (n_docs - df[w]) + 1) / (2 * df[w] + 1)
            lenr = (dl[d] * n_docs) / total_len
            norm = float(t) + 1.2 * (0.25 + 0.75 * lenr)
            parts.append(idf * (float(t) * 2.2) / norm)
        if parts:
            acc = 0.0
            for p in parts:
                acc += p
            scores[d] = acc
    return scores


def test_bm25_scores_match_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["rank"], r["score"])
        for r in bm25_topk(
            spark, docs, [("q", "join merge")], k=10
        ).collect()
    }
    exp = _py_bm25(DOCS, {"join", "merge"})
    assert set(got) == set(exp)
    for d, s in exp.items():
        # bit-identical: the operator promises the exact fold
        assert got[d][1] == s, (d, got[d][1], s)
    order = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [d for d, _ in order] == [
        d for d, _ in sorted(got.items(), key=lambda kv: kv[1][0])
    ]


def test_bm25_idf_prefers_rare_term(spark):
    # equal tf and equal doc length; only idf separates the docs
    corpus = [
        (1, "rare aa bb"),
        (2, "common aa bb"),
        (3, "common cc dd"),
        (4, "common ee ff"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: r["rank"]
        for r in bm25_topk(
            spark, docs, [("q", "rare common")], k=10
        ).collect()
    }
    # doc 1 holds the df=1 term: it must outrank every common-term doc
    assert got[1] == 1


def test_bm25_rank_tie_breaks_by_doc_id(spark):
    corpus = [(7, "x y"), (3, "x y"), (5, "x y")]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = bm25_topk(spark, docs, [("q", "x")], k=10).collect()
    ranked = sorted((r["rank"], r["doc_id"]) for r in rows)
    assert ranked == [(1, 3), (2, 5), (3, 7)]


def test_bm25_multi_query_isolated(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = bm25_topk(
        spark, docs, [("a", "spark"), ("b", "scan")], k=10
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], set()).add(r["doc_id"])
    assert by_q["a"] == {1, 2}
    assert by_q["b"] == {3, 4}
