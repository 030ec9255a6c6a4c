"""Sequence packing: exact window content vs a local reference
implementation, boundary and tail semantics, scalability shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_go_spark.operators.packing import pack_sequences


def _reference_pack(docs: list[tuple[int, list[int]]], w: int):
    stream, bounds = [], []
    for doc_id, toks in sorted(docs):
        for t in toks:
            stream.append((t, doc_id))
    out = {}
    for i in range(0, len(stream) - len(stream) % w, w):
        chunk = stream[i : i + w]
        out[i // w] = (
            [t for t, _ in chunk],
            len({d for _, d in chunk}),
            min(d for _, d in chunk),
            max(d for _, d in chunk),
        )
    return out


def test_pack_sequences_exact(spark):
    docs = [(i, [(i * 31 + j) % 997 for j in range((i * 7) % 23 + 1)])
            for i in range(200)]
    df = spark.createDataFrame(
        [(d, t) for d, t in docs], "doc_id long, toks array<long>"
    ).repartition(5)
    got = {
        r["seq_id"]: (r["tokens"], r["n_docs"], r["first_doc"],
                      r["last_doc"])
        for r in pack_sequences(df, 64).collect()
    }
    assert got == _reference_pack(docs, 64)
    # every window is exactly 64 tokens; the ragged tail is dropped
    total = sum(len(t) for _, t in docs)
    assert len(got) == total // 64


def test_pack_sequences_empty_docs_skipped(spark):
    docs = [(0, [1, 2, 3]), (1, []), (2, [4, 5, 6, 7, 8])]
    df = spark.createDataFrame(docs, "doc_id long, toks array<long>")
    got = pack_sequences(df, 4).collect()
    assert len(got) == 2
    by_id = {r["seq_id"]: r for r in got}
    assert by_id[0]["tokens"] == [1, 2, 3, 4]
    assert by_id[0]["n_docs"] == 2  # doc 1 contributed nothing
    assert by_id[1]["tokens"] == [5, 6, 7, 8]


def test_pack_single_doc_spanning_many_windows(spark):
    df = spark.createDataFrame(
        [(7, list(range(1000)))], "doc_id long, toks array<long>"
    )
    got = sorted(pack_sequences(df, 256).collect(),
                 key=lambda r: r["seq_id"])
    assert [r["seq_id"] for r in got] == [0, 1, 2]
    assert got[1]["tokens"] == list(range(256, 512))
    assert all(r["n_docs"] == 1 and r["first_doc"] == 7 for r in got)
