"""BYTE_STREAM_SPLIT — byte-plane transposition for numeric columns.

Mirrors WriteByteStreamSplit and the 5 typed readers
(/root/reference/internal/encoding/encodingwrite.go:386-506,
 encodingread_bytestreamsplit.go:10-152). All byte-0s, then all byte-1s, …
which makes the stream highly compressible for floats with shared exponents.
Here it is a one-line numpy transpose — the reference loops per value.
"""

from __future__ import annotations

import numpy as np


def encode(values: np.ndarray) -> bytes:
    a = np.ascontiguousarray(values)
    a = a.astype(a.dtype.newbyteorder("<"), copy=False)
    n = len(a)
    if n == 0:
        return b""
    return a.view(np.uint8).reshape(n, a.dtype.itemsize).T.copy().tobytes()


def decode(buf: bytes, dtype: np.dtype, count: int) -> np.ndarray:
    dtype = np.dtype(dtype)
    if len(buf) < count * dtype.itemsize:
        raise ValueError("truncated BYTE_STREAM_SPLIT payload")
    planes = np.frombuffer(buf, dtype=np.uint8, count=count * dtype.itemsize)
    if count == 0:
        return np.zeros(0, dtype=dtype)
    rows = planes.reshape(dtype.itemsize, count).T.copy()
    return rows.view(dtype.newbyteorder("<")).ravel().astype(
        dtype.newbyteorder("="), copy=False
    )
