"""Roundtrip + boundary tests for the pure-numpy codec kernels.

Mirrors the reference's table-driven sweep style
(/root/reference/internal/encoding/encodingwrite_test.go:35-66 — bit widths
0,1,7,8,9,31,32,63,64 with boundary values) and the FIXTURES.md F2 vectors.
"""

from __future__ import annotations

import numpy as np
import pytest

from parquet_go_spark.codecs import (
    bitpack,
    bss,
    delta,
    deltaba,
    dictionary,
    fsst,
    plainc,
    rle,
    varint,
)


# ---------- varint / zigzag ----------

@pytest.mark.parametrize("v", [0, 1, 127, 128, 300, 2**31, 2**63, 2**64 - 1])
def test_uvarint_roundtrip(v):
    buf = varint.write_uvarint(v)
    got, pos = varint.read_uvarint(buf)
    assert got == v and pos == len(buf)


@pytest.mark.parametrize("v", [0, -1, 1, -2, 2, 2**62, -(2**63), 2**63 - 1])
def test_zigzag_roundtrip(v):
    assert varint.zigzag_decode(varint.zigzag_encode(v)) == v


def test_zigzag_array():
    a = np.array([0, -1, 1, -(2**31), 2**31 - 1], dtype=np.int64)
    enc = varint.zigzag_encode_array(a)
    assert np.array_equal(varint.zigzag_decode_array(enc), a)


def test_uvarint_truncated():
    with pytest.raises(ValueError):
        varint.read_uvarint(b"\xff\xff")


# ---------- bitpack ----------

BITWIDTH_SWEEP = [1, 2, 7, 8, 9, 16, 17, 31, 32, 33, 63, 64]


@pytest.mark.parametrize("bw", BITWIDTH_SWEEP)
def test_bitpack_boundary_values(bw):
    top = (1 << bw) - 1
    vals = np.array(
        [0, 1, top, top - 1 if top else 0, top // 2, 1 if bw == 1 else min(2, top)],
        dtype=np.uint64,
    )
    buf = bitpack.pack(vals, bw)
    assert len(buf) == -(-len(vals) * bw // 8)
    out = bitpack.unpack(buf, len(vals), bw)
    assert np.array_equal(out, vals)


def test_bitpack_random_roundtrip():
    rng = np.random.default_rng(42)
    for bw in [1, 5, 12, 17, 23, 40, 64]:
        n = int(rng.integers(1, 1000))
        hi = (1 << bw) - 1
        vals = rng.integers(0, hi, size=n, endpoint=True, dtype=np.uint64)
        assert np.array_equal(bitpack.unpack(bitpack.pack(vals, bw), n, bw), vals)


def test_bitpack_empty_and_zero_width():
    assert bitpack.pack(np.array([], dtype=np.uint64), 5) == b""
    assert len(bitpack.unpack(b"", 0, 5)) == 0
    assert np.array_equal(
        bitpack.unpack(b"", 4, 0), np.zeros(4, dtype=np.uint64)
    )


def test_bitpack_truncated_raises():
    with pytest.raises(ValueError):
        bitpack.unpack(b"\x01", 100, 7)


# ---------- RLE / bit-packed hybrid ----------

def _rle_rt(vals, bw):
    buf = rle.encode(np.asarray(vals, dtype=np.uint64), bw)
    out = rle.decode(buf, bw, len(vals))
    assert np.array_equal(out, np.asarray(vals, dtype=np.uint64))
    return buf


def test_rle_all_equal():
    buf = _rle_rt(np.full(1000, 7), 3)
    assert len(buf) <= 4  # one RLE run: header varint + 1 value byte


def test_rle_alternating_pure_literals():
    vals = np.tile([0, 1], 500)
    _rle_rt(vals, 1)


def test_rle_run_threshold_boundary():
    # runs of exactly 7 (literal) and exactly 8 (RLE) — encodingwrite.go:88
    vals = np.concatenate([np.full(7, 1), np.full(8, 2), np.full(7, 3)])
    _rle_rt(vals, 2)


def test_rle_literal_alignment():
    # 5 literals then a run of 9: reference steals 3 to align (encodingwrite.go:104-115)
    vals = np.concatenate([np.array([1, 2, 3, 4, 5]), np.full(9, 6)])
    _rle_rt(vals, 3)
    # stolen run drops below 8 -> whole thing literal
    vals2 = np.concatenate([np.array([1, 2, 3, 4, 5]), np.full(8, 6)])
    _rle_rt(vals2, 3)


def test_rle_zero_width():
    buf = rle.encode(np.zeros(100, dtype=np.uint64), 0)
    assert np.array_equal(rle.decode(buf, 0, 100), np.zeros(100, dtype=np.uint64))


def test_rle_random_roundtrip():
    rng = np.random.default_rng(7)
    for bw in [1, 4, 11, 20, 33]:
        hi = 1 << min(bw, 16)
        vals = rng.integers(0, hi, size=2000, dtype=np.uint64)
        # inject long runs (values must fit the bit width)
        vals[100:150] = hi - 1
        vals[900:1100] = hi // 2
        _rle_rt(vals, bw)


def test_rle_length_prefix_variant():
    vals = np.arange(100, dtype=np.uint64) % 16
    buf = rle.encode_with_length_prefix(vals, 4)
    out, consumed = rle.decode_with_length_prefix(buf, 4, 100)
    assert consumed == len(buf)
    assert np.array_equal(out, vals)


def test_rle_malformed():
    with pytest.raises(ValueError):
        rle.decode(b"\x10", 8, 200)  # truncated RLE value
    with pytest.raises(ValueError):
        rle.decode(varint.write_uvarint(1000 << 1) + b"\x01", 8, 5)  # run > count
    with pytest.raises(ValueError):
        rle.decode_with_length_prefix(b"\xff\xff\xff\x7f", 4, 10)


# ---------- DELTA_BINARY_PACKED ----------

@pytest.mark.parametrize("itemsize", [4, 8])
def test_delta_basic(itemsize):
    dt = np.int32 if itemsize == 4 else np.int64
    for vals in [
        np.array([], dtype=dt),
        np.array([42], dtype=dt),
        np.array([7, 5, 3, 1, 2, 3, 4, 5], dtype=dt),
        np.arange(1000, dtype=dt),            # sorted: min_delta > 0
        np.arange(1000, 0, -1, dtype=dt),     # descending
        np.zeros(129, dtype=dt),              # crosses block boundary
        np.arange(161, dtype=dt) * 3,         # crosses miniblock boundary
    ]:
        out = delta.decode(delta.encode(vals, itemsize), itemsize)
        assert out.dtype == dt
        assert np.array_equal(out, vals)


def test_delta_negatives_and_extremes():
    vals = np.array(
        [0, -1, 2**31 - 1, -(2**31), 5, -5, 0], dtype=np.int32
    )
    assert np.array_equal(delta.decode(delta.encode(vals, 4), 4), vals)
    vals64 = np.array([2**63 - 1, -(2**63), 0, -1, 1], dtype=np.int64)
    assert np.array_equal(delta.decode(delta.encode(vals64, 8), 8), vals64)


def test_delta_sawtooth_blocks():
    # pattern crossing the 128-value block and 32-value miniblock boundaries
    n = 128 * 3 + 37
    vals = (np.arange(n) % 50 * 17 - 300).astype(np.int64)
    assert np.array_equal(delta.decode(delta.encode(vals, 8), 8), vals)


def test_delta_random():
    rng = np.random.default_rng(1)
    vals = rng.integers(-(2**40), 2**40, size=5000, dtype=np.int64)
    assert np.array_equal(delta.decode(delta.encode(vals, 8), 8), vals)
    v32 = rng.integers(-(2**31), 2**31, size=5000, dtype=np.int32)
    assert np.array_equal(delta.decode(delta.encode(v32, 4), 4), v32)


def test_delta_malformed():
    with pytest.raises(ValueError):
        delta.decode(b"\x00", 8)  # truncated header
    good = delta.encode(np.arange(500, dtype=np.int64), 8)
    with pytest.raises(ValueError):
        delta.decode(good[: len(good) // 2], 8)  # truncated payload


def test_bit_length_array_exact():
    vals = []
    for k in [1, 7, 8, 9, 31, 32, 53, 63]:
        vals += [(1 << k) - 1, 1 << k, (1 << k) + 1]
    vals += [0, 1, 2**64 - 1]
    a = np.array(vals, dtype=np.uint64)
    expect = np.array([int(v).bit_length() for v in vals])
    assert np.array_equal(delta.bit_length_array(a), expect)


# ---------- PLAIN ----------

def test_plain_numeric_roundtrip():
    for dt in [np.int32, np.int64, np.float32, np.float64]:
        rng = np.random.default_rng(3)
        vals = rng.standard_normal(257).astype(dt)
        out = plainc.decode_numeric(plainc.encode_numeric(vals), np.dtype(dt), 257)
        assert np.array_equal(out, vals)


def test_plain_bool_odd_count():
    vals = np.array([True, False, True, True, False, True, False], dtype=bool)
    assert np.array_equal(
        plainc.decode_bool(plainc.encode_bool(vals), len(vals)), vals
    )


def test_plain_byte_array_roundtrip():
    strs = [b"", b"a", b"hello world", b"\x00\xff" * 10, "héllo".encode()]
    data = b"".join(strs)
    offsets = np.zeros(len(strs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strs], out=offsets[1:])
    buf = plainc.encode_byte_array(data, offsets)
    out_data, out_off = plainc.decode_byte_array(buf, len(strs))
    assert out_data == data and np.array_equal(out_off, offsets)


def test_plain_byte_array_malformed():
    with pytest.raises(ValueError):
        plainc.decode_byte_array(b"\xff\xff\xff\x7f", 1)  # giant declared length


# ---------- BYTE_STREAM_SPLIT ----------

@pytest.mark.parametrize("dt", [np.float32, np.float64, np.int32, np.int64])
def test_bss_roundtrip(dt):
    rng = np.random.default_rng(5)
    vals = rng.standard_normal(333).astype(dt)
    if np.dtype(dt).kind == "f":
        vals[0], vals[1], vals[2] = np.nan, np.inf, -np.inf
    out = bss.decode(bss.encode(vals), np.dtype(dt), len(vals))
    assert np.array_equal(out, vals, equal_nan=True)


# ---------- dictionary ----------

def test_dict_numeric_roundtrip():
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 100, size=5000, dtype=np.int64)
    uniques, codes = dictionary.build_numeric(vals)
    buf = dictionary.encode_indices(codes, len(uniques))
    out_codes = dictionary.decode_indices(buf, len(vals), len(uniques))
    assert np.array_equal(uniques[out_codes.astype(np.int64)], vals)


def test_dict_budget_overflow_returns_none():
    vals = np.arange(300_000, dtype=np.int64)  # 2.4 MB of uniques > 1 MiB cap
    assert dictionary.build_numeric(vals) is None


def test_dict_bytes_roundtrip():
    strs = [b"alpha", b"beta", b"alpha", b"", b"gamma", b"beta"] * 50
    data = b"".join(strs)
    offsets = np.zeros(len(strs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strs], out=offsets[1:])
    uniq, codes = dictionary.build_bytes(data, offsets)
    got = [uniq[c] for c in codes.astype(np.int64)]
    assert got == strs


def test_dict_index_out_of_range():
    buf = dictionary.encode_indices(np.array([0, 1, 5], dtype=np.uint64), 6)
    with pytest.raises(ValueError):
        dictionary.decode_indices(buf, 3, 3)


# ---------- DELTA_LENGTH / DELTA_BYTE_ARRAY ----------

def _mk(strs):
    data = b"".join(strs)
    offsets = np.zeros(len(strs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strs], out=offsets[1:])
    return data, offsets


def test_delta_length_ba_roundtrip():
    strs = [b"", b"a", b"abcdef", b"x" * 1000, "ünïcode".encode(), b""]
    data, offsets = _mk(strs)
    out_data, out_off = deltaba.decode_delta_length(
        deltaba.encode_delta_length(data, offsets)
    )
    assert out_data == data and np.array_equal(out_off, offsets)


def test_delta_ba_front_coding_roundtrip():
    strs = [f"doc-{i:012d}".encode() for i in range(500)] + [b"", b"zzz"]
    data, offsets = _mk(strs)
    buf = deltaba.encode_delta_ba(data, offsets)
    # shared prefixes should compress well below raw
    assert len(buf) < len(data)
    out_data, out_off = deltaba.decode_delta_ba(buf)
    assert out_data == data and np.array_equal(out_off, offsets)


def test_delta_ba_no_shared_prefix():
    strs = [b"apple", b"banana", b"", b"cherry", b"d"]
    data, offsets = _mk(strs)
    out_data, out_off = deltaba.decode_delta_ba(deltaba.encode_delta_ba(data, offsets))
    assert out_data == data and np.array_equal(out_off, offsets)


def test_common_prefix_lengths():
    strs = [b"abc", b"abd", b"abd", b"", b"abdx", b"q"]
    data, offsets = _mk(strs)
    got = deltaba.common_prefix_lengths(np.frombuffer(data, np.uint8), offsets)
    assert got.tolist() == [0, 2, 3, 0, 0, 0]


# ---------- FSST ----------

def test_fsst_roundtrip_shared_prefixes():
    strs = [f"user/alpha/{i}".encode() for i in range(300)]
    data, offsets = _mk(strs)
    merges, symbols = fsst.train(data, offsets)
    assert len(symbols) > 0
    blob = fsst.encode(data, offsets, merges, symbols)
    out_data, out_off = fsst.decode(blob)
    assert out_data == data and np.array_equal(out_off, offsets)
    assert len(blob) < len(data)  # must actually compress this corpus


def test_fsst_roundtrip_edge_strings():
    strs = [b"", b"\xff", b"\xff\xff\xff", b"a\xffb", b"plain", b"\x00" * 20]
    data, offsets = _mk(strs)
    merges, symbols = fsst.train(data, offsets)
    blob = fsst.encode(data, offsets, merges, symbols)
    out_data, out_off = fsst.decode(blob)
    assert out_data == data and np.array_equal(out_off, offsets)


def test_fsst_no_symbols_pure_escape():
    # high-entropy input: table may be empty; escape-only stream must roundtrip
    rng = np.random.default_rng(11)
    strs = [bytes(rng.integers(0, 256, size=9, dtype=np.uint8)) for _ in range(20)]
    data, offsets = _mk(strs)
    merges, symbols = fsst.train(data, offsets, max_symbols=0)
    blob = fsst.encode(data, offsets, merges, symbols)
    out_data, out_off = fsst.decode(blob)
    assert out_data == data and np.array_equal(out_off, offsets)


def test_fsst_malformed():
    with pytest.raises(ValueError):
        fsst.decode(b"\x01")  # truncated


def test_fsst_native_numpy_byte_identical():
    """The C FSST kernels (native.py: per-string merge replay + emit,
    decode expansion) must produce byte-identical blobs to the canonical
    numpy kernels and each must decode the other's output — the on-disk
    format may never depend on which kernel ran."""
    import pytest as _pytest

    from parquet_go_spark import native

    if not native.HAVE:
        _pytest.skip("no C compiler in environment")
    rng = np.random.default_rng(41)
    corpora = [
        [b"a" * k for k in range(0, 40)],            # adjacent-run overlap
        [bytes([255]) * 9, b"", b"\xff\xfe\xff", b"x"],  # escape-heavy
        [f"user/alpha/{i}".encode() for i in range(300)],
        [bytes(rng.integers(0, 256, size=int(k), dtype=np.uint8))
         for k in rng.integers(0, 50, 200)],         # high entropy + empties
        [b"the quick brown fox " * 10] * 50,         # long runs of merges
    ]
    for strs in corpora:
        data, offsets = _mk(strs)
        merges, symbols = fsst.train(data, offsets)
        blob_c = fsst.encode(data, offsets, merges, symbols)
        native.HAVE = False
        try:
            merges_np, symbols_np = fsst.train(data, offsets)
            assert merges_np == merges and symbols_np == symbols
            blob_np = fsst.encode(data, offsets, merges, symbols)
            d_np, o_np = fsst.decode(blob_c)
        finally:
            native.HAVE = True
        d_c, o_c = fsst.decode(blob_np)
        assert blob_c == blob_np
        assert d_np == data and np.array_equal(o_np, offsets)
        assert d_c == data and np.array_equal(o_c, offsets)


def test_dict_bss_codes_roundtrip_all_widths():
    rng = np.random.default_rng(11)
    for card in (2, 200, 300, 70_000):  # widths 1, 1, 2, 4
        vals = rng.integers(0, card, size=3000, dtype=np.int64)
        uniques, codes = dictionary.build_numeric(vals)
        buf = dictionary.encode_codes_bss(codes, len(uniques))
        out = dictionary.decode_codes_bss(buf, len(vals), len(uniques))
        assert np.array_equal(uniques[out.astype(np.int64)], vals)


def test_dict_bss_malformed():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dictionary.decode_codes_bss(b"", 10, 4)
    with _pytest.raises(ValueError):
        dictionary.decode_codes_bss(bytes([3]) + b"\x00" * 30, 10, 4)
    with _pytest.raises(ValueError):
        dictionary.decode_codes_bss(bytes([2]) + b"\x00" * 5, 10, 4)


# ----------------------------------------------------------------- rANS

def test_rans_roundtrip_distributions():
    from parquet_go_spark.codecs import rans

    rng = np.random.default_rng(17)
    cases = [
        np.empty(0, dtype=np.int64),
        np.array([7], dtype=np.int64),
        np.array([5, -3], dtype=np.int64),
        np.full(1000, 42, dtype=np.int64),              # single symbol
        rng.integers(0, 7, 10_000).astype(np.int64),    # near-uniform small
        (rng.zipf(1.2, 200_000) % 50_000).astype(np.int64),  # skewed wide
        rng.integers(-1000, 1000, 50_000).astype(np.int64),  # negative span
        rng.integers(0, 100, 3).astype(np.int64),       # n < lanes
        np.arange(2048, dtype=np.int64),                # every symbol once
    ]
    for vals in cases:
        blob = rans.encode_ints(vals)
        out = rans.decode_ints(blob)
        assert np.array_equal(out, vals)


def test_rans_native_numpy_byte_identical():
    """The optional C lane loops (native.py) must emit byte-identical blobs
    to the canonical numpy kernels, and each must decode the other's output
    — the on-disk format may never depend on which kernel ran."""
    import pytest as _pytest

    from parquet_go_spark import native
    from parquet_go_spark.codecs import rans

    if not native.HAVE:
        _pytest.skip("no C compiler in environment")
    rng = np.random.default_rng(41)
    cases = [
        (rng.zipf(1.3, 500_000) % 50_000).astype(np.int64),   # token-like
        (rng.zipf(1.1, 300_000) % 50_257).astype(np.int32),   # int32 fused path
        rng.integers(0, 17, 200_000).astype(np.int64),        # near-uniform
        np.repeat(rng.integers(0, 9, 2000),
                  rng.integers(1, 400, 2000)).astype(np.int64),  # runny
        rng.integers(-1000, 1000, 4097).astype(np.int64),     # odd n, neg
        np.full(20_000, 42, dtype=np.int64),                  # single symbol
        rng.integers(0, 99, 12_345).astype(np.int32)[::2],    # non-contiguous
    ]
    for vals in cases:
        blob_c = rans.encode_ints(vals)
        native.HAVE = False
        try:
            blob_np = rans.encode_ints(vals)
            out_np_of_c = rans.decode_ints(blob_c)
        finally:
            native.HAVE = True
        out_c_of_np = rans.decode_ints(blob_np)
        assert blob_c == blob_np
        assert np.array_equal(out_np_of_c, vals)
        assert np.array_equal(out_c_of_np, vals)
        # int32-output decode twin: same values, final dtype, no
        # int64 intermediate (valid whenever the range fits int32)
        out32 = rans.decode_ints(blob_c, np.int32)
        assert out32.dtype == np.int32
        assert np.array_equal(out32, vals.astype(np.int32))


def test_rans_compresses_skewed_below_bitpack():
    from parquet_go_spark.codecs import rans

    rng = np.random.default_rng(3)
    vals = (rng.zipf(1.2, 500_000) % 50_000).astype(np.int64)
    blob = rans.encode_ints(vals)
    counts = np.bincount(vals)
    entropy = rans.estimate_bits_per_value(counts)
    _fixed, var = rans.split_fixed(blob)
    # coded stream within 5% of the Shannon floor (the frequency table is
    # a separate amortized section, compressed by the frame layer)
    bits = len(var) * 8 / len(vals)
    assert bits < entropy * 1.05 + 0.2
    assert len(blob) * 8 / len(vals) < 16


def test_rans_quantize_freqs_sums_exact():
    from parquet_go_spark.codecs import rans

    rng = np.random.default_rng(5)
    for k in (10, 14, 20):
        for shape in (1, 3, 1000, 40_000):
            if shape > 1 << k:  # encode always picks k so nfreq fits
                continue
            counts = rng.integers(0, 1000, shape)
            if counts.sum() == 0:
                counts[0] = 1
            counts[rng.integers(0, shape)] = 10_000_000  # heavy head
            f = rans.quantize_freqs(counts, k)
            assert int(f.sum()) == 1 << k
            assert np.all(f[counts > 0] >= 1)
            assert np.all(f[counts == 0] == 0)


def test_rans_malformed():
    import pytest as _pytest

    from parquet_go_spark.codecs import rans

    vals = np.arange(5000, dtype=np.int64) % 97
    blob = bytearray(rans.encode_ints(vals))
    with _pytest.raises(ValueError):
        rans.decode_ints(b"")                      # truncated header
    with _pytest.raises(ValueError):
        rans.decode_ints(bytes(blob[:40]))         # truncated body
    bad = blob.copy()
    bad[0] = 99                                    # k out of range
    with _pytest.raises(ValueError):
        rans.decode_ints(bytes(bad))
    bad = blob.copy()
    bad[rans._HDR.size] ^= 0xFF                    # corrupt freq table
    with _pytest.raises(ValueError):
        rans.decode_ints(bytes(bad))
    with _pytest.raises(ValueError):
        rans.encode_ints(np.array([0, 1 << 20]))   # span gate


def test_rans_span_gate_applicable():
    from parquet_go_spark.codecs import rans

    assert rans.applicable(0, 50_000, 100)
    assert not rans.applicable(0, 1 << 18, 100)
    assert not rans.applicable(0, 10, 0)


def test_auto_selection_picks_rans_on_skewed_ints():
    """Chunk-level auto codec selection must route Zipf-like int columns to
    the entropy coder and still roundtrip bit-identically."""
    import pyarrow as pa

    from parquet_go_spark import chunk

    rng = np.random.default_rng(23)
    # steep Zipf (like real token-id columns): entropy ~3.5 bits against a
    # 16-bit span — the regime where entropy coding beats bitpack+zstd by
    # a wide margin. (At flatter skews the two are within ~2% and either
    # pick is legitimate.)
    vals = (rng.zipf(1.5, 300_000) % 50_000).astype(np.int32)
    arr = pa.array(vals, pa.int32())
    blob, stats = chunk.encode_chunk(arr, codec="auto", compression="zstd")
    assert stats["codec"] == "rans", stats["codec"]
    assert chunk.decode_chunk(blob).equals(arr)
    # and far below the 2-byte/value a 16-bit pack would need
    assert stats["encoded_size"] < 2 * len(vals)


def test_contiguous_sample_segments_disjoint():
    """Regression: for n slightly above target the mid segment must not
    overlap the tail (overlap inflated zstd trial compressibility of
    positional codecs and mis-ranked BSS over rANS)."""
    from parquet_go_spark import cost

    for n in (300_000, 262_145, 400_000, 786_432, 1_000_000):
        vals = np.arange(n, dtype=np.int64)
        s = cost.contiguous_sample(vals)
        assert len(np.unique(s)) == len(s), n


def test_dict_rans_wide_span_ints():
    """Wide-span skewed int columns (sparse id spaces) exceed the direct
    rANS span gate but their dictionary codes do not — DICT_RANS must win
    there and roundtrip; overflow paths must degrade with correct labels."""
    import pyarrow as pa

    from parquet_go_spark import chunk

    rng = np.random.default_rng(9)
    ranks = rng.zipf(1.4, 200_000) % 40_000
    idspace = rng.permutation(
        np.arange(0, 1 << 40, (1 << 40) // 40_000)
    )[:40_000]
    arr = pa.array(idspace[ranks].astype(np.int64), pa.int64())
    blob, st = chunk.encode_chunk(arr, codec="auto", compression="zstd")
    assert st["codec"] == "dict_rans", st["codec"]
    assert chunk.decode_chunk(blob).equals(arr)

    # dict budget overflow: forced dict_rans must land as labeled plain
    wide = pa.array(rng.integers(0, 1 << 60, 300_000, dtype=np.int64))
    b2, s2 = chunk.encode_chunk(wide, codec="dict_rans", compression="zstd")
    assert s2["codec"] == "plain"
    assert chunk.decode_chunk(b2).equals(wide)

    # dict fits budget but codes exceed the rANS span gate: falls to
    # dict_bss with the correct label
    ids = np.arange(0, 1 << 29, (1 << 29) // 200_000, dtype=np.int32)[:200_000]
    big = pa.array(rng.choice(ids, 400_000), pa.int32())
    b3, s3 = chunk.encode_chunk(big, codec="dict_rans", compression="zstd")
    assert s3["codec"] == "dict_bss"
    assert chunk.decode_chunk(b3).equals(big)
