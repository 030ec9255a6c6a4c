"""Split-block bloom + xxHash64 unit tests (mirror of the reference's
bloomfilter tests: no false negatives, bounded FPR, roundtrip serialize)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_spark.bloom import (
    SplitBlockBloom,
    _xxh64_scalar,
    build_bloom,
    hash_values,
    xxhash64_bytes,
    xxhash64_u64,
)

# canonical XXH64 test vectors (seed 0)
VECTORS = {
    b"": 0xEF46DB3751D8E999,
    b"a": 0xD24EC4F1A98C6E5B,
    b"abc": 0x44BC2CF5AD770999,
}


def test_xxh64_known_vectors():
    for data, want in VECTORS.items():
        assert _xxh64_scalar(data) == want
    got = xxhash64_bytes(list(VECTORS))
    assert [int(x) for x in got] == list(VECTORS.values())


def test_xxh64_vectorized_matches_scalar_all_lengths():
    vals = [bytes(range(n)) for n in range(0, 70)]
    got = xxhash64_bytes(vals)
    want = [_xxh64_scalar(v) for v in vals]
    assert [int(x) for x in got] == want


def test_xxh64_u64_matches_le_bytes():
    ints = np.array([0, 1, -1, 123456789, 2**62, -(2**63)], dtype=np.int64)
    got = xxhash64_u64(ints)
    want = [
        _xxh64_scalar(int(x).to_bytes(8, "little", signed=True)) for x in ints
    ]
    assert [int(x) for x in got] == want


def test_bloom_no_false_negatives_and_fpr():
    keys = np.arange(5000, dtype=np.int64) * 7
    bf = SplitBlockBloom.sized(len(keys), fpp=0.01)
    bf.insert_hashes(xxhash64_u64(keys))
    assert bf.check_hashes(xxhash64_u64(keys)).all()
    absent = np.arange(100_000, 150_000, dtype=np.int64)
    fpr = bf.check_hashes(xxhash64_u64(absent)).mean()
    assert fpr < 0.02, fpr


def test_bloom_serialize_roundtrip():
    arr = pa.array([f"key-{i}" for i in range(100)])
    blob = build_bloom(arr)
    bf = SplitBlockBloom.frombytes(blob)
    assert bf.check_hashes(hash_values(pa.array(["key-0", "key-99"]))).all()
    miss = bf.check_hashes(hash_values(pa.array([f"nope-{i}" for i in range(500)])))
    assert miss.mean() < 0.05


def test_bloom_bad_magic():
    with pytest.raises(ValueError):
        SplitBlockBloom.frombytes(b"XXXX" + b"\x00" * 32)


def test_bloom_string_and_int_types_via_arrow():
    ints = pa.array(np.arange(50, dtype=np.int32))
    blob = build_bloom(ints)
    bf = SplitBlockBloom.frombytes(blob)
    assert bf.check_hashes(hash_values(pa.array([7], pa.int32()))).all()


def test_element_bloom_over_list_columns():
    """List columns bloom their flattened cells: every element present
    anywhere in the array column must hit; absent probes mostly miss."""
    import pyarrow as pa

    from parquet_go_spark import bloom as bloommod

    rng = np.random.default_rng(11)
    lists = [rng.integers(0, 5000, size=rng.integers(1, 30)).tolist()
             for _ in range(400)]
    lists[17] = None  # null row
    lists[18] = [7, None, 9]  # null element
    arr = pa.array(lists, pa.list_(pa.int64()))
    bf = bloommod.SplitBlockBloom.frombytes(bloommod.build_bloom(arr))
    present = sorted({v for l in lists if l for v in l if v is not None})
    h = bloommod.xxhash64_u64(np.asarray(present, dtype=np.int64))
    assert bool(bf.check_hashes(h).all())  # zero false negatives
    absent = np.arange(100_000, 102_000, dtype=np.int64)
    fp = bf.check_hashes(bloommod.xxhash64_u64(absent)).mean()
    assert fp < 0.05
    # string elements too (the word-membership path)
    sarr = pa.array([["aa", "bb"], ["cc"], None], pa.list_(pa.string()))
    sbf = bloommod.SplitBlockBloom.frombytes(bloommod.build_bloom(sarr))
    sh = bloommod.xxhash64_bytes([b"aa", b"bb", b"cc"])
    assert bool(sbf.check_hashes(sh).all())
    assert not bool(
        sbf.check_hashes(bloommod.xxhash64_bytes([b"zz-not-there"])).any()
    )
