"""Format durability: decode the committed golden frames bit-exactly.

Mirror of the reference's external golden corpus discipline
(/root/reference/Makefile:13-19,74-81 downloads apache/parquet-testing
files and decodes them). These .bin frames were written at a pinned
revision by tools/make_golden_frames.py; this test never re-encodes —
it proves today's decoder still reads yesterday's store. If it fails,
either restore decode-side compatibility or consciously bump the frame
format and regenerate (and say so in the commit).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_spark import chunk

import golden_defs

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _expected(build) -> pa.Array:
    arr = build()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def _equal(got: pa.Array, want: pa.Array) -> bool:
    if got.equals(want):
        return True
    # float columns: NaNs compare unequal under .equals — compare bits
    if pa.types.is_floating(want.type) and want.null_count == 0:
        ib = np.uint32 if want.type == pa.float32() else np.uint64
        if want.type == pa.float16():
            ib = np.uint16
        g = np.asarray(got).view(ib)
        w = np.asarray(want).view(ib)
        return bool(np.array_equal(g, w))
    return False


@pytest.mark.parametrize("name", sorted(golden_defs.CASES))
def test_golden_frame_decodes(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.bin")
    assert os.path.exists(path), (
        f"missing golden frame {name}.bin — run tools/make_golden_frames.py "
        "only on an intentional format bump"
    )
    with open(path, "rb") as f:
        blob = f.read()
    build, kw = golden_defs.CASES[name]
    key = kw.get("encryption_key")
    got = chunk.decode_chunk(blob, encryption_key=key)
    want = _expected(build)
    assert _equal(got, want), f"golden frame {name} decoded differently"


def test_encrypted_golden_requires_key():
    path = os.path.join(GOLDEN_DIR, "encrypted_zstd.bin")
    with open(path, "rb") as f:
        blob = f.read()
    with pytest.raises(ValueError):
        chunk.decode_chunk(blob)
