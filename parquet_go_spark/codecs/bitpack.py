"""LSB-first bit-packing at fixed bit width (Parquet bit-packed runs).

Semantics mirror the reference's writeBitPackedInt64 / ReadBitPacked
(/root/reference/internal/encoding/encodingwrite.go:143-169,
 /root/reference/internal/encoding/encodingread.go:92-170): value i occupies
bit positions [i*bw, (i+1)*bw) of the output, little-endian bit order within
each byte; values are conceptually grouped by 8 (a group is bw bytes).

Vectorized: the reference loops value-by-value in Go; here we build the
(n, bw) bit matrix and let numpy's packbits/unpackbits do the work — one of
the places this engine is *more* vectorized than the reference by design.
"""

from __future__ import annotations

import numpy as np

_POW2 = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))


def bit_width(max_value: int) -> int:
    """bits.Len analog: number of bits to represent max_value (0 -> 0)."""
    return int(max_value).bit_length()


def pack(values: np.ndarray, bw: int) -> bytes:
    """Pack unsigned values at ``bw`` bits each, LSB-first.

    Output length is ceil(n*bw/8) bytes (caller pads group counts itself
    when writing Parquet-style 8-value groups).
    """
    n = len(values)
    if bw == 0 or n == 0:
        return b""
    if bw < 0 or bw > 64:
        raise ValueError(f"bit width {bw} out of range [0, 64]")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    shifts = np.arange(bw, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack(buf: bytes | np.ndarray, n: int, bw: int) -> np.ndarray:
    """Unpack ``n`` values of ``bw`` bits each from ``buf`` -> uint64 array."""
    if n == 0 or bw == 0:
        return np.zeros(n, dtype=np.uint64)
    if bw < 0 or bw > 64:
        raise ValueError(f"bit width {bw} out of range [0, 64]")
    raw = np.frombuffer(buf, dtype=np.uint8)
    need_bits = n * bw
    if len(raw) * 8 < need_bits:
        raise ValueError(
            f"bit-packed payload too short: {len(raw)} bytes < {need_bits} bits"
        )
    bits = np.unpackbits(raw, count=need_bits, bitorder="little")
    bits = bits.reshape(n, bw).astype(np.uint64)
    return (bits * _POW2[:bw]).sum(axis=1, dtype=np.uint64)
