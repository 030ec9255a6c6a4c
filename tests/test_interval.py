"""INTERVAL logical type: pack/unpack layout, reference string rendering,
parse symmetry, and the FLBA codec-stack roundtrip
(reference /root/reference/types/interval.go:9-88)."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_spark import chunk, interval


def test_pack_layout_pinned():
    # interval.go:82-86: LE u32 months | days | millis
    arr = interval.pack_interval(
        np.array([1], dtype=np.uint32),
        np.array([2], dtype=np.uint32),
        np.array([0x01020304], dtype=np.uint32),
    )
    assert arr.type == pa.binary(12)
    assert arr[0].as_py() == (
        b"\x01\x00\x00\x00" b"\x02\x00\x00\x00" b"\x04\x03\x02\x01"
    )


def test_pack_unpack_roundtrip_random():
    rng = np.random.default_rng(7)
    m = rng.integers(0, 2**32, 1000, dtype=np.uint32)
    d = rng.integers(0, 2**32, 1000, dtype=np.uint32)
    ms = rng.integers(0, 2**32, 1000, dtype=np.uint32)
    m2, d2, ms2 = interval.unpack_interval(interval.pack_interval(m, d, ms))
    np.testing.assert_array_equal(m, m2)
    np.testing.assert_array_equal(d, d2)
    np.testing.assert_array_equal(ms, ms2)


def test_to_strings_matches_reference_renderer():
    # Hand-computed against IntervalToString (interval.go:9-34): zero
    # parts omitted, sec emitted when > 0 or alone, %.3f seconds.
    cases = [
        ((0, 0, 0), "0.000 sec"),
        ((2, 0, 0), "2 mon"),
        ((0, 3, 0), "3 day"),
        ((0, 0, 4500), "4.500 sec"),
        ((2, 3, 4500), "2 mon 3 day 4.500 sec"),
        ((2, 3, 0), "2 mon 3 day"),
        ((0, 0, 1), "0.001 sec"),
        ((0, 0, 90061001), "90061.001 sec"),
    ]
    arr = interval.pack_interval(
        *(np.array([c[0][i] for c in cases], dtype=np.uint32) for i in range(3))
    )
    assert interval.to_strings(arr) == [c[1] for c in cases]


def test_parse_interval_string_symmetry():
    for s in ["", "2 mon", "3 day", "4.500 sec", "2 mon 3 day 4.500 sec"]:
        packed = interval.parse_interval_string(s)
        arr = pa.Array.from_buffers(
            pa.binary(12), 1, [None, pa.py_buffer(packed)]
        )
        expect = s if s else "0.000 sec"
        assert interval.to_strings(arr) == [expect]
    with pytest.raises(ValueError):
        interval.parse_interval_string("2 fortnight")
    with pytest.raises(ValueError):
        interval.parse_interval_string("2")


def test_codec_stack_roundtrip():
    rng = np.random.default_rng(11)
    n = 5000
    arr = interval.pack_interval(
        rng.integers(0, 25, n).astype(np.uint32),
        rng.integers(0, 31, n).astype(np.uint32),
        rng.integers(0, 90_061_000, n).astype(np.uint32),
    )
    for codec in ("auto", "plain", "dict"):
        blob, meta = chunk.encode_chunk(arr, codec=codec, compression="zstd")
        out = chunk.decode_chunk(blob)
        assert out.type == pa.binary(12)
        assert out.equals(arr), codec
