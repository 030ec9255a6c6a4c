"""Hostile-input defense for the real-parquet reader (pqinterop):
corrupted or truncated files must raise clean errors in bounded time —
never hang, overallocate, or crash the interpreter. Mirrors the
reference's fuzz posture (parquet-go fuzzes its readers) and frame.py's
defensive-bounds discipline."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_spark import pqinterop as P
from parquet_go_spark import pqwriter as W

OK_ERRORS = (ValueError, KeyError, IndexError, OverflowError, TypeError,
             StopIteration, EOFError, OSError, pa.ArrowInvalid,
             pa.ArrowNotImplementedError)


def _file(tmp_path, name="f.parquet", **kw):
    rng = np.random.default_rng(11)
    n = 800
    tbl = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "s": pa.array([None if i % 9 == 0 else f"v{i % 31}"
                       for i in range(n)]),
        "e": pa.array([[float(x) for x in rng.normal(size=i % 4)]
                       for i in range(n)], pa.list_(pa.float64())),
    })
    f = str(tmp_path / name)
    W.write_table(tbl, f, compression="zstd", row_group_rows=300,
                  page_rows=100, **kw)
    return f, tbl


def _try_decode(blob: bytes, tmp_path, i):
    f = str(tmp_path / f"mut_{i}.parquet")
    with open(f, "wb") as fh:
        fh.write(blob)
    try:
        t = P.decode_table(f)
        t.num_rows  # force
    except OK_ERRORS:
        pass
    except Exception as e:  # zlib/zstd decoder errors etc. wrapped types
        assert type(e).__module__ != "builtins" or isinstance(e, OK_ERRORS), \
            (i, type(e), e)


def test_truncations_never_hang(tmp_path):
    f, _ = _file(tmp_path)
    data = open(f, "rb").read()
    for i, cut in enumerate(range(0, len(data), max(1, len(data) // 64))):
        _try_decode(data[:cut], tmp_path, i)


def test_byte_flips_never_hang(tmp_path):
    f, tbl = _file(tmp_path)
    data = bytearray(open(f, "rb").read())
    rng = np.random.default_rng(13)
    for i, pos in enumerate(rng.integers(0, len(data), 160)):
        mut = bytearray(data)
        mut[pos] ^= 0xFF
        _try_decode(bytes(mut), tmp_path, i)


def test_footer_declared_sizes_are_bounded(tmp_path):
    """A footer claiming absurd counts must fail cleanly, not allocate."""
    f, _ = _file(tmp_path)
    meta = P.read_footer(f)
    # patch a chunk's num_values to something absurd via object surgery
    cc = P.column_chunks(meta)[0][0]
    cc.num_values = 1 << 40
    buf, rcc = P.chunk_reader(f, cc)
    with pytest.raises(OK_ERRORS):
        vals = P._decode_chunk(buf, rcc)
        assert len(vals) < (1 << 40)


def test_bloom_header_validation(tmp_path):
    f, _ = _file(tmp_path)
    # no bloom written: read must refuse, not scan
    meta = P.read_footer(f)
    cc = P.column_chunks(meta)[0][0]
    with pytest.raises(ValueError, match="no bloom"):
        P.read_bloom_at(f, cc)


# --- randomized write/read equivalence (schemas × params × ranges) ------

def _rand_table(rng: np.random.Generator, n: int) -> pa.Table:
    cols = {}
    n_cols = int(rng.integers(2, 6))
    for ci in range(n_cols):
        kind = rng.integers(0, 10)
        nulls = rng.random() < 0.5
        def mk(vals, typ):
            if nulls:
                mask = rng.random(n) < 0.15
                vals = [None if m else v for v, m in zip(vals, mask)]
            return pa.array(vals, typ)
        if kind == 0:
            cols[f"i{ci}"] = mk(rng.integers(-10**6, 10**6, n).tolist(),
                                pa.int64())
        elif kind == 1:
            cols[f"j{ci}"] = mk(rng.integers(0, 50, n).tolist(),
                                pa.int32())
        elif kind == 2:
            cols[f"f{ci}"] = mk(rng.normal(size=n).tolist(), pa.float64())
        elif kind == 3:
            cols[f"s{ci}"] = mk([f"w{int(v)}" for v in
                                 rng.integers(0, 40, n)], pa.string())
        elif kind == 4:
            cols[f"b{ci}"] = mk(rng.random(n) < 0.5, pa.bool_())
        elif kind == 5:
            cols[f"l{ci}"] = mk(
                [rng.integers(0, 100, int(rng.integers(0, 5))).tolist()
                 for _ in range(n)], pa.list_(pa.int32()))
        elif kind == 6:
            cols[f"m{ci}"] = mk(
                [{f"k{j}": int(rng.integers(0, 99))
                  for j in range(int(rng.integers(0, 4)))}
                 for _ in range(n)], pa.map_(pa.string(), pa.int64()))
        elif kind == 7:
            cols[f"y{ci}"] = mk(rng.integers(-128, 128, n).tolist(),
                                pa.int8())
        elif kind == 8:
            cols[f"h{ci}"] = mk(
                list(np.round(rng.normal(size=n), 2)
                     .astype(np.float16)), pa.float16())
        else:
            cols[f"t{ci}"] = mk(
                rng.integers(0, 86_400_000_000, n).tolist(),
                pa.time64("us"))
    return pa.table(cols)


def _canon(tbl: pa.Table):
    out = []
    for r in tbl.to_pylist():
        row = {}
        for k, v in r.items():
            row[k] = sorted(dict(v).items()) if isinstance(v, list) and \
                v and isinstance(v[0], tuple) else v
        out.append(row)
    return out


def test_random_roundtrip_equivalence(tmp_path):
    """30 random (schema, writer-params) trials: engine write ->
    engine decode must equal the source exactly, and random row-range
    decodes must equal the sliced full decode."""
    for trial in range(30):
        rng = np.random.default_rng(1000 + trial)
        n = int(rng.integers(1, 900))
        t = _rand_table(rng, n)
        f = str(tmp_path / f"r{trial}.parquet")
        W.write_table(
            t, f,
            compression=str(rng.choice(
                ["none", "snappy", "zstd", "gzip", "lz4_raw"])),
            row_group_rows=int(rng.integers(50, 500)),
            page_rows=int(rng.integers(20, 200)),
            page_version=int(rng.choice([1, 2])),
            page_index=bool(rng.random() < 0.8))
        got = P.decode_table(f)
        assert _canon(got) == _canon(t), f"trial {trial} mismatch"
        # random row ranges against every row group
        meta = P.read_footer(f)
        n_rg = len(meta[4])
        ranges = {}
        for g in range(n_rg):
            rg_rows = meta[4][g].get(3, 0)
            if rg_rows and rng.random() < 0.8:
                k = int(rng.integers(1, 3))
                pts = sorted(rng.integers(0, rg_rows + 1, 2 * k).tolist())
                rr = P.merge_ranges(
                    [(pts[2 * i], pts[2 * i + 1]) for i in range(k)])
                if rr:
                    ranges[g] = rr
        if not ranges:
            continue
        sub = P.decode_table(f, row_ranges=ranges)
        base = 0
        keep = []
        for g in range(n_rg):
            rg_rows = meta[4][g].get(3, 0)
            rr = ranges.get(g)
            keep.extend(base + i for lo, hi in (rr or [(0, rg_rows)])
                        for i in range(lo, hi))
            base += rg_rows
        want = got.take(pa.array(keep, pa.int64()))
        assert _canon(sub) == _canon(want), f"trial {trial} range mismatch"


def test_legacy_lz4_all_three_flavors():
    """Codec id 5 ambiguity: hadoop-framed, raw-block, and LZ4-frame
    payloads must all decompress (the parquet-cpp Lz4HadoopCodec
    posture)."""
    import struct

    raw = b"the quick brown fox " * 200
    half = len(raw) // 2
    blocks = [raw[:half], raw[half:]]
    hadoop = b""
    for b in blocks:
        c = pa.Codec("lz4_raw").compress(b).to_pybytes()
        hadoop += struct.pack(">II", len(b), len(c)) + c
    assert P._block_decompress("lz4", hadoop, len(raw)) == raw
    rawblk = pa.Codec("lz4_raw").compress(raw).to_pybytes()
    assert P._block_decompress("lz4", rawblk, len(raw)) == raw
    frame = pa.Codec("lz4").compress(raw).to_pybytes()
    assert P._block_decompress("lz4", frame, len(raw)) == raw


def test_all_null_page_in_numeric_chunk():
    """A page whose values are ALL null must not flip the chunk's
    value-stream representation (deep-fuzz catch: numeric chunks
    decoded whole ndarrays as list elements after such a page)."""
    import tempfile

    import pyarrow.parquet as pqmod

    # 40 present doubles then 40 nulls -> with page_rows=40 the second
    # page is entirely null; also exercise v2 and a map variant
    for pv in (1, 2):
        t = pa.table({"x": pa.array(
            [float(i) for i in range(40)] + [None] * 40)})
        p = tempfile.mktemp(suffix=".parquet")
        W.write_table(t, p, page_rows=40, page_version=pv,
                      compression="snappy")
        assert P.decode_table(p).to_pydict() == t.to_pydict(), pv
        assert pqmod.read_table(p).to_pydict() == t.to_pydict(), pv
    rows = [{"k": float(i)} for i in range(40)] + [None] * 40
    t2 = pa.table({"m": pa.array(rows, pa.map_(pa.string(),
                                               pa.float64()))})
    p2 = tempfile.mktemp(suffix=".parquet")
    W.write_table(t2, p2, page_rows=40, page_version=2,
                  compression="snappy")
    got = P.decode_table(p2).column("m").to_pylist()
    want = t2.column("m").to_pylist()
    assert [None if v is None else sorted(dict(v).items())
            for v in got] == \
        [None if v is None else sorted(dict(v).items()) for v in want]


def test_empty_dictionary_with_indices_refuses_cleanly():
    """An empty dictionary page plus non-empty index stream must raise
    the controlled 'dictionary index out of range' error on BOTH value
    lanes (ADVICE r4: the ndarray branch skipped the bounds check when
    the dictionary was empty and died on a numpy IndexError instead)."""
    import numpy as np
    import pytest

    from parquet_go_spark import pqinterop as P
    from parquet_go_spark.codecs import rle

    bw = 1
    payload = bytes([bw]) + rle.encode(np.zeros(8, np.int64), bw)
    for dict_vals in (np.array([], np.int64),
                      pa.array([], pa.large_binary())):
        with pytest.raises(ValueError, match="dictionary index"):
            P._decode_values(payload, P.E_RLE_DICTIONARY, P.T_INT64,
                             8, None, dict_vals)
