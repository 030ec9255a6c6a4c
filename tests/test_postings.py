"""Inverted-index operator (operators/postings.py): semantics, the
stop-word cap, the two-shuffle plan, and the delta-codec synergy the
composition query exists for."""

from __future__ import annotations

import pyarrow as pa
import pytest

from parquet_go_spark.operators.postings import build_postings


def _rows(df):
    return {r["w"]: (r["df"], r["postings"]) for r in df.collect()}


def test_postings_semantics(spark):
    docs = spark.createDataFrame(
        [
            (10, "a b b c"),   # duplicate word in one doc counts once
            (3, "b c"),
            (7, "c"),
        ],
        "doc_id long, text string",
    )
    got = _rows(build_postings(spark, docs))
    assert got["a"] == (1, [10])
    assert got["b"] == (2, [3, 10])      # sorted ascending
    assert got["c"] == (3, [3, 7, 10])


def test_postings_df_caps(spark):
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "x y"), (3, "x")],
        "doc_id long, text string",
    )
    got = _rows(build_postings(spark, docs, max_df=2))
    assert set(got) == {"y"}             # x present in 3 docs: capped
    got = _rows(build_postings(spark, docs, min_df=3))
    assert set(got) == {"x"}


def test_postings_plan_two_shuffles(spark):
    from tests.test_plans import _count_exchanges, _plan

    docs = spark.createDataFrame(
        [(i, f"w{i % 5} w{i % 3}") for i in range(50)],
        "doc_id long, text string",
    )
    plan = _plan(build_postings(spark, docs))
    # distinct(w, doc) + groupBy(w) — the minhash shape, nothing more
    assert _count_exchanges(plan) == 2, plan


def test_prefilter_identical_output_and_broadcast(spark):
    """The stop-word prefilter arm must produce bit-identical output
    (it pre-applies the same exact df cap) and route the stop list
    through a broadcast anti-join, never a shuffled one."""
    from tests.test_plans import _plan

    docs = spark.createDataFrame(
        [(i, f"stop w{i % 17} w{i % 5}") for i in range(60)],
        "doc_id long, text string",
    )
    plain = build_postings(spark, docs, max_df=10)
    pre = build_postings(spark, docs, max_df=10, prefilter=True)
    assert _rows(plain) == _rows(pre)
    assert "stop" not in _rows(pre)  # df=60 > 10: gone in both arms
    assert "BroadcastHashJoin" in _plan(pre)

    import pytest

    with pytest.raises(ValueError, match="max_df"):
        build_postings(spark, docs, prefilter=True)


def test_sorted_postings_pick_delta_codec():
    """The composition query's reason to exist: sorted doc-id lists are
    the canonical DELTA_BINARY_PACKED input, and the auto-picker must
    find that on its own."""
    from parquet_go_spark import chunk

    postings = [list(range(d, 4000 + d * 7, 7)) for d in range(40)]
    arr = pa.array(postings, pa.list_(pa.int64()))
    blob, st = chunk.encode_chunk(arr, codec="auto", compression="zstd")
    assert st["values_codec"] == "delta_binary_packed", st
    assert chunk.decode_chunk(blob).cast(pa.list_(pa.int64())).equals(arr)
