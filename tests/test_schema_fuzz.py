"""Random-SCHEMA roundtrip fuzz: the nested-type analog of the
reference's per-decoder fuzz harnesses (internal/encoding/*_fuzz_test.go,
`make fuzz`) at the level where our residual risk actually lives — the
recursive struct/map/list shredding in chunk.py, the param sections, and
the page machinery, crossed with every leaf logical type and codec-auto
selection.

Each seed builds a random schema (depth <= 3 over the full supported
leaf surface: int widths, floats incl. float16, bool, string/binary,
temporal units+tz, decimal128 at random precision, FLBA at random
width), generates value arrays with independent null decisions at every
nesting level, and asserts encode->decode identity, paged-encode
identity, and random row-range decode against Array.slice.

NaN is deliberately absent from the float pool here: pyarrow's
Array.equals treats NaN != NaN, and NaN/payload bit-exactness is
already pinned by test_property.py::test_float64_any and test_alp.py.
±inf, -0.0 and subnormals stay in.
"""

from __future__ import annotations

import datetime
import decimal
import random

import pyarrow as pa
import pytest

from parquet_go_spark import chunk

_MAX_DEPTH = 3

_FLOAT_POOL = [
    0.0, -0.0, 1.5, -2.25, float("inf"), float("-inf"),
    5e-324, -5e-324, 1e308, 3.141592653589793,
]


def _rand_leaf(rng: random.Random) -> pa.DataType:
    kind = rng.randrange(12)
    if kind == 0:
        return rng.choice([pa.int32(), pa.int64()])
    if kind == 1:
        return rng.choice([pa.int8(), pa.int16(), pa.uint8(),
                           pa.uint16(), pa.uint32(), pa.uint64()])
    if kind == 2:
        return rng.choice([pa.float32(), pa.float64()])
    if kind == 3:
        return pa.float16()
    if kind == 4:
        return pa.bool_()
    if kind == 5:
        return rng.choice([pa.string(), pa.large_string()])
    if kind == 6:
        return rng.choice([pa.binary(), pa.large_binary()])
    if kind == 7:
        return rng.choice([
            pa.timestamp("us"),
            pa.timestamp("ns"),
            pa.timestamp("ms", tz="UTC"),
            pa.timestamp("s"),
        ])
    if kind == 8:
        return rng.choice([pa.date32(), pa.time32("ms"),
                           pa.time64("us"), pa.duration("ms")])
    if kind == 9:
        prec = rng.randrange(1, 39)
        scale = rng.randrange(0, prec + 1)
        return pa.decimal128(prec, scale)
    if kind == 10:
        return pa.binary(rng.randrange(1, 21))  # fixed-size (FLBA)
    return pa.int32()


def _rand_type(rng: random.Random, depth: int = 0) -> pa.DataType:
    if depth >= _MAX_DEPTH or rng.random() < 0.45:
        return _rand_leaf(rng)
    kind = rng.randrange(4)
    if kind == 0:
        inner = _rand_type(rng, depth + 1)
        return rng.choice([pa.list_(inner), pa.large_list(inner)])
    if kind == 1:
        nf = rng.randrange(1, 4)
        return pa.struct([
            (f"f{i}", _rand_type(rng, depth + 1)) for i in range(nf)
        ])
    if kind == 2:
        key = rng.choice([pa.string(), pa.int64()])
        return pa.map_(key, _rand_type(rng, depth + 1))
    return pa.list_(_rand_leaf(rng))


def _rand_value(rng: random.Random, t: pa.DataType, depth: int = 0):
    """One non-null python value of type t (nulls decided by caller)."""
    if pa.types.is_boolean(t):
        return rng.random() < 0.5
    if pa.types.is_integer(t):
        info = pa.types
        width = t.bit_width
        if info.is_unsigned_integer(t):
            lo, hi = 0, (1 << width) - 1
        else:
            lo, hi = -(1 << (width - 1)), (1 << (width - 1)) - 1
        # mix boundary values with small ones (RLE/dict/delta paths)
        r = rng.random()
        if r < 0.1:
            return rng.choice([lo, hi, 0])
        if r < 0.6:
            return rng.randrange(0, 17)
        return rng.randrange(lo, hi + 1)
    if pa.types.is_float16(t):
        import numpy as np

        return np.float16(rng.choice([0.0, -0.0, 1.5, -2.25, 65504.0,
                                      -65504.0, 6e-8]))
    if pa.types.is_floating(t):
        if rng.random() < 0.5:
            return rng.choice(_FLOAT_POOL)
        return rng.uniform(-1e6, 1e6)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        n = rng.randrange(0, 12)
        return "".join(rng.choice("abcxyz…日本 \t0") for _ in range(n))
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return rng.randbytes(rng.randrange(0, 12))
    if pa.types.is_fixed_size_binary(t):
        return rng.randbytes(t.byte_width)
    if pa.types.is_timestamp(t):
        base = datetime.datetime(2001, 2, 3, 4, 5, 6, 789012)
        v = base + datetime.timedelta(seconds=rng.randrange(-10**9, 10**9))
        if t.tz is not None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        return v
    if pa.types.is_date32(t):
        return datetime.date(1970, 1, 1) + datetime.timedelta(
            days=rng.randrange(-3000, 40000))
    if pa.types.is_time32(t) or pa.types.is_time64(t):
        return datetime.time(rng.randrange(24), rng.randrange(60),
                             rng.randrange(60),
                             rng.randrange(1000) * 1000)
    if pa.types.is_duration(t):
        return datetime.timedelta(milliseconds=rng.randrange(-10**8, 10**8))
    if pa.types.is_decimal128(t):
        digits = rng.randrange(0, 10 ** t.precision)
        if rng.random() < 0.5:
            digits = -digits
        return decimal.Decimal(digits).scaleb(-t.scale)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        n = rng.randrange(0, 6)
        return [
            None if rng.random() < 0.12
            else _rand_value(rng, t.value_type, depth + 1)
            for _ in range(n)
        ]
    if pa.types.is_struct(t):
        return {
            f.name: (None if rng.random() < 0.12
                     else _rand_value(rng, f.type, depth + 1))
            for f in t
        }
    if pa.types.is_map(t):
        n = rng.randrange(0, 5)
        keys = set()
        out = []
        for _ in range(n):
            k = _rand_value(rng, t.key_type, depth + 1)
            if k in keys:
                continue
            keys.add(k)
            out.append((k, None if rng.random() < 0.12
                        else _rand_value(rng, t.item_type, depth + 1)))
        return out
    raise NotImplementedError(str(t))


def _rand_array(rng: random.Random, t: pa.DataType, n: int) -> pa.Array:
    vals = [
        None if rng.random() < 0.15 else _rand_value(rng, t)
        for _ in range(n)
    ]
    return pa.array(vals, type=t)


def _descend(v, path: list[str]):
    """Expected value of a struct field projection: a null parent at any
    level yields a null child row (chunk.decode_chunk_partial contract)."""
    for seg in path:
        if v is None:
            return None
        v = v[seg]
    return v


def _rand_partial_path(rng: random.Random, t: pa.DataType) -> list[str]:
    """A random projection path into t (decode_chunk_partial semantics:
    struct segments name fields, list layers are transparent, map layers
    take 'key'/'value'); [] when t has no projectable spine."""
    path: list[str] = []
    while True:
        if pa.types.is_struct(t):
            f = t.field(rng.randrange(t.num_fields))
            path.append(f.name)
            t = f.type
            if rng.random() < 0.5:
                return path
        elif pa.types.is_list(t) or pa.types.is_large_list(t):
            t = t.value_type  # transparent layer, no path segment
        elif pa.types.is_map(t):
            seg = rng.choice(["key", "value"])
            path.append(seg)
            t = t.key_type if seg == "key" else t.item_type
            if rng.random() < 0.5:
                return path
        else:
            return path


def _project(v, path: list[str], t: pa.DataType):
    """Expected projection of one python value along a partial path."""
    if not path:
        return v
    if v is None:
        return None
    if pa.types.is_struct(t):
        return _project(v[path[0]], path[1:], t.field(path[0]).type)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return [_project(e, path, t.value_type) for e in v]
    if pa.types.is_map(t):
        pick, sub = (0, t.key_type) if path[0] == "key" else (1, t.item_type)
        return [_project(e[pick], path[1:], sub) for e in v]
    raise AssertionError(f"path {path} into leaf {t}")


def _assert_same(decoded: pa.Array, arr: pa.Array, ctx: str) -> None:
    if decoded.type != arr.type:
        # large_* inputs store as their regular twins; value identity is
        # the contract, the 64-bit offset width is not
        arr = arr.cast(decoded.type)
    assert decoded.equals(arr), (
        f"{ctx}: decode mismatch for type {arr.type}"
    )


@pytest.mark.parametrize("seed", range(24))
def test_random_schema_roundtrip(seed):
    rng = random.Random(seed)
    for case in range(6):
        t = _rand_type(rng)
        n = rng.choice([0, 1, 2, 7, 33, 180])
        arr = _rand_array(rng, t, n)
        comp = rng.choice([None, "zstd", "snappy"])
        ctx = f"seed {seed} case {case} n={n} comp={comp}"
        blob, stats = chunk.encode_chunk(arr, compression=comp)
        assert stats["count"] == n, ctx
        _assert_same(chunk.decode_chunk(blob), arr, ctx)

        if n and rng.random() < 0.6:
            page_rows = rng.choice([3, 16, 64])
            pblob, _ = chunk.encode_chunk_paged(
                arr, page_rows=page_rows, compression=comp)
            _assert_same(chunk.decode_chunk(pblob), arr, ctx + " paged")
            lo = rng.randrange(n)
            hi = rng.randrange(lo, n) + 1
            got = chunk.decode_chunk_rows(pblob, lo, hi)
            _assert_same(got, arr.slice(lo, hi - lo),
                         ctx + f" rows[{lo}:{hi}]")

        path = _rand_partial_path(rng, t)
        if path:
            # random-depth projection (ReadPartial analog) through any
            # struct/list/map spine
            got = chunk.decode_chunk_partial(blob, path)
            exp = [_project(v, path, t) for v in arr.to_pylist()]
            _assert_same(got, pa.array(exp, type=got.type),
                         ctx + f" partial {'.'.join(path)}")


@pytest.mark.parametrize("seed", range(100, 110))
def test_random_schema_sealed_and_tampered(seed):
    """Random schemas through the encryption and integrity layers: a
    sealed frame must roundtrip with the key, refuse decode without it,
    and refuse a tampered byte; an unencrypted frame must catch a
    random payload flip via CRC (strict default)."""
    rng = random.Random(seed)
    key = bytes(rng.randrange(256) for _ in range(16))
    for case in range(4):
        t = _rand_type(rng)
        arr = _rand_array(rng, t, rng.choice([1, 5, 40]))
        ctx = f"seed {seed} case {case}"
        blob, _ = chunk.encode_chunk(arr, encryption_key=key)
        _assert_same(chunk.decode_chunk(blob, encryption_key=key), arr, ctx)
        with pytest.raises(Exception):
            chunk.decode_chunk(blob)  # keyless read of sealed data
        pos = rng.randrange(len(blob) // 2, len(blob))
        bad = blob[:pos] + bytes([blob[pos] ^ 0x40]) + blob[pos + 1:]
        with pytest.raises(Exception):
            chunk.decode_chunk(bad, encryption_key=key)  # GCM auth

        plain, _ = chunk.encode_chunk(arr)
        pos = rng.randrange(len(plain) // 2, len(plain))
        bad = plain[:pos] + bytes([plain[pos] ^ 0x40]) + plain[pos + 1:]
        with pytest.raises(Exception):
            chunk.decode_chunk(bad)  # CRC

        cut = rng.randrange(1, len(plain))
        with pytest.raises(Exception):
            chunk.decode_chunk(plain[:cut])  # truncation, any schema


@pytest.mark.parametrize("seed", range(24, 32))
def test_random_schema_all_null_and_empty(seed):
    """Degenerate shapes crossed with random schemas: all-null columns,
    empty chunks, and single rows — the edges where validity bitmaps,
    offsets, and param sections are most easily off by one."""
    rng = random.Random(seed)
    for case in range(8):
        t = _rand_type(rng)
        shape = rng.choice(["empty", "all_null", "one"])
        if shape == "empty":
            arr = pa.array([], type=t)
        elif shape == "all_null":
            arr = pa.array([None] * rng.choice([1, 2, 9, 40]), type=t)
        else:
            arr = pa.array([_rand_value(rng, t)], type=t)
        ctx = f"seed {seed} case {case} {shape} {t}"
        blob, _ = chunk.encode_chunk(arr)
        _assert_same(chunk.decode_chunk(blob), arr, ctx)
