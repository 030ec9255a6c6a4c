"""Property-based roundtrip tests (hypothesis) — the analog of the
reference's per-decoder fuzz harnesses (AGENTS.md:30-42, Fuzz* targets):
random typed arrays, with nulls and boundary values, must roundtrip
bit-identically through every auto-selected codec path, and malformed
frames must raise, never crash or return garbage."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parquet_go_spark import chunk

_SETTINGS = dict(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _roundtrip(arr: pa.Array):
    for compression in ("zstd", None):
        blob, _ = chunk.encode_chunk(arr, codec="auto", compression=compression)
        out = chunk.decode_chunk(blob)
        if out.type != arr.type:
            out = out.cast(arr.type)
        assert out.equals(arr), f"{arr.type} roundtrip mismatch"


@given(
    st.lists(
        st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)), max_size=300
    )
)
@settings(**_SETTINGS)
def test_int32_any(vals):
    _roundtrip(pa.array(vals, type=pa.int32()))


@given(
    st.lists(
        st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)), max_size=300
    )
)
@settings(**_SETTINGS)
def test_int64_any(vals):
    _roundtrip(pa.array(vals, type=pa.int64()))


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.floats(allow_nan=False, width=64),
            st.just(float("inf")),
            st.just(float("-inf")),
        ),
        max_size=200,
    )
)
@settings(**_SETTINGS)
def test_float64_any(vals):
    _roundtrip(pa.array(vals, type=pa.float64()))


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.floats(width=64),  # NaN and infinities included
        ),
        min_size=1,
        max_size=50,
    ),
    st.floats(width=64),
    st.sampled_from(["eq", "gt", "ge", "lt", "le", "in"]),
)
@settings(**_SETTINGS)
def test_float_stats_pruning_lossless(vals, fval, op):
    """If _stats_keep says prune, NO row of the chunk may satisfy the
    filter under engine float semantics (NaN greatest, NaN = NaN true,
    ±inf in-band) — bounds folded by encode_chunk, compared through the
    same string render the manifest uses."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        LessThan,
        LessThanOrEqual,
    )

    from parquet_go_spark.sources.pgs_datasource import _stats_keep

    _, stats = chunk.encode_chunk(pa.array(vals, type=pa.float64()))
    vmin, vmax = stats.get("min"), stats.get("max")
    smin = "" if vmin is None else str(vmin)
    smax = "" if vmax is None else str(vmax)
    fcls = {
        "eq": EqualTo, "gt": GreaterThan, "ge": GreaterThanOrEqual,
        "lt": LessThan, "le": LessThanOrEqual, "in": In,
    }[op]
    f = fcls(("c",), (fval, 0.25) if op == "in" else fval)

    def k(x):  # the engine total order: NaN greatest
        return (1, 0.0) if x != x else (0, x)

    def matches(x):  # Spark filter semantics on a non-null row
        if op == "eq":
            return k(x) == k(fval)
        if op == "gt":
            return k(x) > k(fval)
        if op == "ge":
            return k(x) >= k(fval)
        if op == "lt":
            return k(x) < k(fval)
        if op == "le":
            return k(x) <= k(fval)
        return k(x) in (k(fval), k(0.25))

    if not _stats_keep(smin, smax, f):
        assert not any(matches(v) for v in vals if v is not None)


@given(
    st.lists(
        st.one_of(st.none(), st.text(max_size=40), st.just(""), st.just("\x00")),
        max_size=200,
    )
)
@settings(**_SETTINGS)
def test_string_any(vals):
    _roundtrip(pa.array(vals, type=pa.utf8()))


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(st.integers(-(2**31), 2**31 - 1), max_size=50),
        ),
        max_size=100,
    )
)
@settings(**_SETTINGS)
def test_token_lists_any(vals):
    _roundtrip(pa.array(vals, type=pa.list_(pa.int32())))


@given(st.binary(min_size=0, max_size=400), st.integers(0, 3))
@settings(max_examples=60, deadline=None)
def test_malformed_frames_never_crash(junk, mode):
    """Random bytes, truncations, and bit flips of valid frames must raise
    ValueError (or decode to the exact original), never segfault/garble."""
    base, _ = chunk.encode_chunk(
        pa.array([1, 2, 3, 4, 5], type=pa.int32()), codec="auto",
        compression="zstd",
    )
    if mode == 0:
        buf = junk
    elif mode == 1:
        buf = base[: len(junk) % max(len(base), 1)]
    elif mode == 2:
        k = len(junk) % max(len(base), 1)
        flip = bytearray(base)
        flip[k] ^= 0xFF
        buf = bytes(flip)
    else:
        buf = base + junk
    try:
        out = chunk.decode_chunk(buf)
        # only acceptable success: the unmodified payload semantics
        assert out.cast(pa.int32()).equals(pa.array([1, 2, 3, 4, 5], pa.int32()))
    except (ValueError, NotImplementedError):
        pass


@given(
    st.lists(st.integers(-500, 500), min_size=0, max_size=400),
    st.integers(0, 3),
    st.data(),
)
@settings(**_SETTINGS)
def test_rans_fuzz_roundtrip_and_mutation(vals, _salt, data):
    """Valid blobs roundtrip; mutated blobs raise ValueError, never crash
    (the reference's Fuzz* decoder harness norm, AGENTS.md:30-42)."""
    from parquet_go_spark.codecs import rans

    arr = np.asarray(vals, dtype=np.int64)
    blob = rans.encode_ints(arr)
    assert np.array_equal(rans.decode_ints(blob), arr)
    if len(blob) > 0:
        pos = data.draw(st.integers(0, len(blob) - 1))
        bit = data.draw(st.integers(0, 7))
        mutated = bytearray(blob)
        mutated[pos] ^= 1 << bit
        try:
            out = rans.decode_ints(bytes(mutated))
            # A surviving decode must keep the element count — except when
            # the flip landed inside the header's n field (bytes 8..15 of
            # `<BBHIQqII`): the count exists ONLY there (an rANS stream
            # carries no redundancy about it — decoding fewer symbols, or
            # more from a degenerate single-symbol table, is structurally
            # valid), so that one field is undetectable at codec level.
            # Integrity there is the frame layer's CRC, which covers every
            # real read path (frame.py).
            if not (8 <= pos < 16):
                assert len(out) == len(arr)
        except (ValueError, OverflowError):
            pass


@given(st.binary(max_size=200))
@settings(**_SETTINGS)
def test_wkb_to_geojson_total(b):
    # The GeoJSON converter is a logical boundary fed by decoded column
    # bytes: arbitrary input must yield a dict or None, never an
    # exception (the reference's ok=false contract,
    # types/geospatial_wkb.go:145-188).
    from parquet_go_spark import geo

    out = geo.wkb_to_geojson(b)
    assert out is None or isinstance(out, dict)


@given(st.binary(min_size=5, max_size=200))
@settings(**_SETTINGS)
def test_wkb_to_geojson_point_prefix(b):
    # Any buffer that starts as a valid LE point header converts its
    # first 16 payload bytes; garbage after a complete geometry is
    # tolerated by the reference (it stops at the parsed geometry).
    from parquet_go_spark import geo

    buf = b"\x01\x01\x00\x00\x00" + b[5:]
    out = geo.wkb_to_geojson(buf)
    if len(buf) >= 21:
        assert out is None or out["type"] == "Point"
    else:
        assert out is None
