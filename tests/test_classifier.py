"""Distributed perceptron (operators/classifier.py): exact training
parity with a pure-Python reference, and actual learning on separable
data."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from parquet_go_spark.operators.classifier import B, _SEED, perceptron_train


def _bucket(w: str) -> int:
    return int(hashlib.md5(f"{_SEED}|{w}".encode()).hexdigest()[:15], 16) % B


def _py_perceptron(docs, rounds):
    """The operator's exact spec in plain Python ints."""
    feats = {}
    for d, text, y in docs:
        f = {-1: 1}
        for w in text.split(" "):
            b = _bucket(w)
            f[b] = f.get(b, 0) + 1
        feats[d] = (y, f)
    weights = {b: 0 for _, (_, f) in feats.items() for b in f}
    for _ in range(rounds):
        upd: dict[int, int] = {}
        for d, (y, f) in feats.items():
            m = sum(weights[b] * x for b, x in f.items())
            if y * m <= 0:
                for b, x in f.items():
                    upd[b] = upd.get(b, 0) + y * x
        for b, d_ in upd.items():
            weights[b] += d_
    out = {}
    for d, (y, f) in feats.items():
        m = sum(weights[b] * x for b, x in f.items())
        out[d] = (y, m, 1 if m > 0 else -1)
    return weights, out


def test_perceptron_matches_python_reference(spark):
    docs = [
        (i, f"alpha w{i % 5} beta w{i % 3} gamma", 1 if i % 2 else -1)
        for i in range(30)
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string, y int")
    weights, scored = perceptron_train(spark, sdf, rounds=3)
    exp_w, exp = _py_perceptron(docs, 3)
    assert weights == exp_w
    got = {
        r["doc_id"]: (r["y"], r["margin"], r["pred"])
        for r in scored.collect()
    }
    assert got == exp


def test_perceptron_learns_separable_data(spark):
    # positive docs use one vocabulary, negative docs another:
    # linearly separable, so the perceptron must reach 100% training
    # accuracy within a few rounds
    docs = [
        (i, "good clean signal text here", 1) for i in range(20)
    ] + [
        (100 + i, "spammy noisy junk words here", -1) for i in range(20)
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string, y int")
    _, scored = perceptron_train(spark, sdf, rounds=6)
    wrong = scored.filter(F.col("pred") != F.col("y")).count()
    assert wrong == 0
