"""ALP decimal-float codec: bit-exactness, exception handling, selection.

The correctness contract mirrors the engine's other codecs (reference
roundtrip norm, /root/reference/AGENTS.md:35-36): decode(encode(x)) is
bit-identical for every IEEE value, including NaN payloads, infinities,
-0.0 and subnormals — anything the decimal transform can't reproduce
rides the exception patch list.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_go_spark import chunk, frame
from parquet_go_spark.codecs import alp


def _bits(a: np.ndarray) -> np.ndarray:
    return a.view(np.uint32 if a.dtype.itemsize == 4 else np.uint64)


def _rt(vals: np.ndarray, codec: str = "alp", compression="zstd"):
    blob, meta = chunk.encode_chunk(
        pa.chunked_array([pa.array(vals)]), codec=codec, compression=compression
    )
    out = np.asarray(chunk.decode_chunk(blob))
    assert out.dtype == vals.dtype
    assert np.array_equal(_bits(out), _bits(vals)), "bit-identity violated"
    return blob, meta


# ---------- transform-level ----------

def test_split_merge_prices():
    v = np.round(np.random.default_rng(1).uniform(1, 1e5, 10_000), 2)
    stored, pos, exc = alp.split(v, 2, 0)
    assert len(pos) == 0
    out = alp.merge(stored, 2, 0, pos, exc, v.dtype)
    assert np.array_equal(_bits(out), _bits(v))


def test_split_flags_nonfinite_and_negzero():
    v = np.array([np.nan, np.inf, -np.inf, -0.0, 1.25, 2.5])
    stored, pos, exc = alp.split(v, 2, 0)
    assert list(pos) == [0, 1, 2, 3]
    out = alp.merge(stored, 2, 0, pos, exc, v.dtype)
    assert np.array_equal(_bits(out), _bits(v))


def test_split_exception_fill_keeps_span_tight():
    # one 1e300 outlier must not blow up the stored-int span
    v = np.concatenate([np.full(100, 12.34), [1e300]])
    stored, pos, exc = alp.split(v, 2, 0)
    assert list(pos) == [100]
    assert stored.max() == stored.min() == 1234


def test_trailing_zero_factor():
    # whole-dollar prices at e=2: f strips the two trailing zeros
    v = (np.arange(1, 2000, dtype=np.float64) * 1.0)
    params = alp.choose_params(v)
    assert params is not None
    e, f = params
    stored, pos, exc = alp.split(v, e, f)
    assert len(pos) == 0
    out = alp.merge(stored, e, f, pos, exc, v.dtype)
    assert np.array_equal(_bits(out), _bits(v))
    # the stored span must reflect the stripped zeros
    assert int(stored.max()) < 3000


def test_choose_params_rejects_random_doubles():
    v = np.random.default_rng(2).standard_normal(8192)
    assert alp.choose_params(v) is None


def test_choose_params_empty():
    assert alp.choose_params(np.array([], dtype=np.float64)) is None


# ---------- chunk-level roundtrips ----------

def test_chunk_prices_picks_alp_and_beats_bss():
    v = np.round(np.random.default_rng(3).uniform(900, 105_000, 200_000), 2)
    blob, meta = _rt(v, codec="auto")
    assert meta["codec"] == "alp"
    bss_blob, _ = chunk.encode_chunk(
        pa.chunked_array([pa.array(v)]), codec="byte_stream_split",
        compression="zstd",
    )
    assert len(blob) < 0.7 * len(bss_blob)


def test_chunk_random_auto_avoids_alp():
    v = np.random.default_rng(4).standard_normal(50_000)
    blob, meta = chunk.encode_chunk(
        pa.chunked_array([pa.array(v)]), codec="auto", compression="zstd"
    )
    assert meta["codec"] != "alp"


def test_chunk_forced_alp_on_random_still_roundtrips():
    v = np.random.default_rng(5).standard_normal(10_000)
    _rt(v, codec="alp")


def test_chunk_float32():
    v = np.round(
        np.random.default_rng(6).uniform(0, 100, 50_000), 2
    ).astype(np.float32)
    blob, meta = _rt(v, codec="auto")
    assert meta["codec"] == "alp"


def test_chunk_edge_values():
    v = np.array(
        [np.nan, np.inf, -np.inf, -0.0, 0.0, 1.25, np.pi, 1e300, 5e-324,
         123.45, -987.65, float(2**62), 0.1],
        dtype=np.float64,
    )
    _rt(v, codec="alp")


def test_chunk_nan_payload_preserved():
    # non-default NaN bit pattern must survive via the exception list
    v = np.array([0x7FF8_0000_DEAD_BEEF, 0x3FF0_0000_0000_0000],
                 dtype=np.uint64).view(np.float64)
    _rt(v, codec="alp")


def test_chunk_with_nulls():
    arr = pa.array([1.25, None, 2.5, None, 100.75] * 500)
    blob, _ = chunk.encode_chunk(
        pa.chunked_array([arr]), codec="alp", compression="zstd"
    )
    out = chunk.decode_chunk(blob)
    assert out.equals(arr)


def test_chunk_empty_and_single():
    _rt(np.array([], dtype=np.float64), codec="alp")
    _rt(np.array([12.34], dtype=np.float64), codec="alp")


def test_all_exceptions_chunk():
    v = np.full(100, np.nan)
    _rt(v, codec="alp")


# ---------- malformed-input defense ----------

def test_malformed_truncated_header():
    with pytest.raises(ValueError):
        alp.parse_header(b"\x02\x00\x02", 10, np.dtype(np.float64))


def test_malformed_exception_count():
    sect = bytes([2, 0, 2, 0]) + (1000).to_bytes(4, "little")
    with pytest.raises(ValueError):
        alp.parse_header(sect, 10, np.dtype(np.float64))


def test_malformed_exception_position():
    pos = np.array([99], dtype="<u4")
    exc = np.array([1.0])
    sect = alp.pack_header(2, 0, frame.FOR_BITPACK, 1, pos, exc)
    with pytest.raises(ValueError):
        alp.parse_header(sect, 10, np.dtype(np.float64))


def test_malformed_frame_decode_raises_not_crashes():
    v = np.round(np.random.default_rng(7).uniform(0, 10, 1000), 2)
    blob, _ = chunk.encode_chunk(
        pa.chunked_array([pa.array(v)]), codec="alp", compression=None
    )
    for cut in (len(blob) // 2, len(blob) - 3):
        with pytest.raises(ValueError):
            chunk.decode_chunk(blob[:cut])


# ---------- property fuzz ----------

@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(allow_nan=True, allow_infinity=True, width=64),
            st.decimals(
                min_value=-10**8, max_value=10**8, places=2
            ).map(float),
        ),
        max_size=300,
    )
)
def test_fuzz_forced_alp_bit_identity(xs):
    v = np.array(xs, dtype=np.float64)
    _rt(v, codec="alp", compression=None)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.decimals(min_value=-10**6, max_value=10**6, places=2).map(float),
        min_size=1, max_size=200,
    ),
    st.data(),
)
def test_fuzz_mutated_alp_frame_never_crashes(xs, data):
    """Mutated ALP frames must raise (or decode to the right count),
    never hang or segfault — the reference's Fuzz* decoder norm."""
    v = np.array(xs, dtype=np.float64)
    blob, _ = chunk.encode_chunk(
        pa.chunked_array([pa.array(v)]), codec="alp", compression=None
    )
    pos = data.draw(st.integers(0, len(blob) - 1))
    bit = data.draw(st.integers(0, 7))
    mutated = bytearray(blob)
    mutated[pos] ^= 1 << bit
    try:
        out = chunk.decode_chunk(bytes(mutated))
        assert len(out) == len(v)
    except (ValueError, NotImplementedError, OverflowError):
        pass
