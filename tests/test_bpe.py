"""Distributed BPE (operators/bpe.py): merge-fold greedy-left
semantics (run parity), training argmax determinism, and parity with a
pure-Python reference implementation of word-histogram BPE."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_go_spark.operators.bpe import _apply_merge, bpe_apply, bpe_train


def _fold(spark, syms, l, r):
    df = spark.createDataFrame([(syms,)], "syms array<string>")
    return df.select(_apply_merge(F.col("syms"), l, r).alias("o")).head()["o"]


def test_merge_fold_greedy_left_run_parity(spark):
    # runs of the same pair merge left-to-right, non-overlapping
    assert _fold(spark, list("aaa"), "a", "a") == ["aa", "a"]
    assert _fold(spark, list("aaaa"), "a", "a") == ["aa", "aa"]
    assert _fold(spark, list("aaaaa"), "a", "a") == ["aa", "aa", "a"]


def test_merge_fold_basic_and_no_rematch(spark):
    assert _fold(spark, list("abab"), "a", "b") == ["ab", "ab"]
    # a merged l||r never re-merges as the LEFT side within the round
    assert _fold(spark, list("abb"), "a", "b") == ["ab", "b"]
    # empty and single-symbol arrays pass through
    assert _fold(spark, [], "a", "b") == []
    assert _fold(spark, ["x"], "a", "b") == ["x"]
    # an original symbol equal to l||r is not a (l, r) pair
    assert _fold(spark, ["ab", "b"], "a", "b") == ["ab", "b"]


def _py_bpe(texts: list[str], n_merges: int):
    """Word-histogram BPE, the operator's exact spec, in plain Python."""
    hist: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            hist[w] = hist.get(w, 0) + 1
    syms = {w: list(w) for w in hist}
    merges = []
    for step in range(1, n_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for w, s in syms.items():
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] = pairs.get((s[i], s[i + 1]), 0) + hist[w]
        if not pairs:
            break
        (l, r), wt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, l, r, l + r, wt))
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            syms[w] = out
    return merges, syms


def test_bpe_train_matches_python_reference(spark):
    texts = [
        "lower lower lowest newer newer newer wider wide",
        "low low lowest newest newest wide",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    mdf, ws = bpe_train(spark, docs, n_merges=6)
    got = [
        (r["step"], r["lhs"], r["rhs"], r["merged"], r["weight"])
        for r in mdf.orderBy("step").collect()
    ]
    exp_merges, exp_syms = _py_bpe(texts, 6)
    assert got == exp_merges
    got_syms = {r["w"]: r["syms"] for r in ws.collect()}
    assert got_syms == exp_syms


def test_bpe_apply_document_order(spark):
    texts = ["ab ab cd", "cd ab"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    _, ws = bpe_train(spark, docs.select("text"), n_merges=2)
    _, exp_syms = _py_bpe(texts, 2)
    got = {
        r["doc_id"]: r["toks"]
        for r in bpe_apply(spark, docs, ws).collect()
    }
    for i, t in enumerate(texts):
        exp = [s for w in t.split(" ") for s in exp_syms[w]]
        assert got[i] == exp


def test_bpe_train_early_stop_on_single_symbol_words(spark):
    docs = spark.createDataFrame([("a b c a",)], "text string")
    mdf, ws = bpe_train(spark, docs, n_merges=4)
    assert mdf.count() == 0
    assert {r["w"]: r["syms"] for r in ws.collect()} == {
        "a": ["a"], "b": ["b"], "c": ["c"]
    }
