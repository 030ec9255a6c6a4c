"""DSIR-style importance selection (operators/dsir.py): score
semantics vs a pure-Python reference of the same hashed-bucket ratio
formula, and directionality (target-like docs outrank off-target)."""

from __future__ import annotations

import hashlib

from parquet_go_spark.operators.dsir import (
    B,
    _SEED_F,
    _SEED_T,
    _TARGET_THR,
    dsir_select,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _bucket(w: str) -> int:
    return _h60(f"{_SEED_F}|{w}") % B


def _py_dsir(docs: list[tuple[int, str]]):
    """The operator's exact spec in plain Python doubles."""
    is_t = {d: _h60(f"{_SEED_T}|{d}") < _TARGET_THR for d, _ in docs}
    cnt_t: dict[int, int] = {}
    cnt_r: dict[int, int] = {}
    total_t = total_r = 0
    occ: dict[int, list[int]] = {}
    for d, text in docs:
        for pos, w in enumerate(text.split(" ")):
            b = _bucket(w)
            if is_t[d]:
                cnt_t[b] = cnt_t.get(b, 0) + 1
                total_t += 1
            else:
                cnt_r[b] = cnt_r.get(b, 0) + 1
                total_r += 1
                occ.setdefault(d, []).append(b)
    out = {}
    for d, buckets in occ.items():
        acc = 0.0
        for b in buckets:  # position order
            acc += ((cnt_t.get(b, 0) + 1) * (total_r + B)) / (
                (total_t + B) * (cnt_r[b] + 1)
            )
        out[d] = (len(buckets), acc, acc / float(len(buckets)))
    return out, is_t


def test_dsir_scores_match_python_reference(spark):
    docs = [
        (i, f"alpha beta gamma w{i % 7} w{i % 3} delta") for i in range(40)
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["dl"], r["score"], r["mean_ratio"], r["rank"])
        for r in dsir_select(spark, sdf, k=100).collect()
    }
    exp, is_t = _py_dsir(docs)
    assert set(got) == set(exp)
    for d, (dl, score, mean) in exp.items():
        assert got[d][0] == dl
        assert got[d][1] == score  # bit-identical fold
        assert got[d][2] == mean
    # ranks follow (mean DESC, doc_id ASC)
    order = sorted(exp.items(), key=lambda kv: (-kv[1][2], kv[0]))
    assert [d for d, _ in order] == [
        d for d, v in sorted(got.items(), key=lambda kv: kv[1][3])
    ]
    # sanity: the carve actually split the corpus
    assert any(is_t.values()) and not all(is_t.values())


def test_dsir_prefers_target_like_docs(spark):
    # make the target distribution dominated by one word; raw docs
    # made of that word must outrank raw docs made of another
    rows = []
    target_ids = [d for d in range(200)
                  if _h60(f"{_SEED_T}|{d}") < _TARGET_THR]
    raw_ids = [d for d in range(200)
               if _h60(f"{_SEED_T}|{d}") >= _TARGET_THR]
    assert len(target_ids) >= 2 and len(raw_ids) >= 2
    for d in target_ids:
        rows.append((d, "targetword targetword targetword"))
    like, unlike = raw_ids[0], raw_ids[1]
    rows.append((like, "targetword targetword"))
    rows.append((unlike, "otherword otherword"))
    for d in raw_ids[2:]:
        rows.append((d, "filler noise words here"))
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["mean_ratio"]
           for r in dsir_select(spark, sdf, k=1000).collect()}
    assert got[like] > got[unlike]
