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
