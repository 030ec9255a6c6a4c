"""Unsigned LEB128 varints + zigzag, as used by Parquet RLE / DELTA headers.

Semantics mirror the reference's WriteUnsignedVarInt
(/root/reference/internal/encoding/encodingwrite_plain.go:161-176) and
ReadUnsignedVarInt (/root/reference/internal/encoding/encodingread.go:29-44):
7-bit groups, LSB first, high bit = continuation.
"""

from __future__ import annotations

import numpy as np


def write_uvarint(num: int) -> bytes:
    """LEB128-encode a non-negative integer."""
    if num < 0:
        raise ValueError("uvarint requires non-negative input")
    out = bytearray()
    while True:
        b = num & 0x7F
        num >>= 7
        if num:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_uvarint(buf: bytes, pos: int = 0) -> tuple[int, int]:
    """Decode one LEB128 varint at ``pos``; returns (value, next_pos)."""
    result = 0
    shift = 0
    n = len(buf)
    while True:
        if pos >= n:
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def zigzag_encode(v: int) -> int:
    """Map signed -> unsigned: 0,-1,1,-2,... -> 0,1,2,3,...

    Same transform as the reference delta writer
    (/root/reference/internal/encoding/encodingwrite.go:205-206).
    """
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def zigzag_encode_array(a: np.ndarray) -> np.ndarray:
    """Vectorized zigzag for int32/int64 arrays -> same-width unsigned."""
    a = np.asarray(a)
    bits = a.dtype.itemsize * 8 - 1
    u = a.astype(a.dtype.newbyteorder("="), copy=False)
    return ((u.astype(np.int64) << 1) ^ (u.astype(np.int64) >> bits)).astype(
        np.uint64 if a.dtype.itemsize == 8 else np.uint32
    )


def zigzag_decode_array(u: np.ndarray, itemsize: int = 8) -> np.ndarray:
    u = np.asarray(u, dtype=np.uint64)
    s = (u >> np.uint64(1)) ^ (np.uint64(0) - (u & np.uint64(1)))
    return s.astype(np.int64 if itemsize == 8 else np.int32)
