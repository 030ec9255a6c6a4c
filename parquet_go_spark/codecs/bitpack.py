"""LSB-first bit-packing at fixed bit width (Parquet bit-packed runs).

Semantics mirror the reference's writeBitPackedInt64 / ReadBitPacked
(/root/reference/internal/encoding/encodingwrite.go:143-169,
 /root/reference/internal/encoding/encodingread.go:92-170): value i occupies
bit positions [i*bw, (i+1)*bw) of the output, little-endian bit order within
each byte; values are conceptually grouped by 8 (a group is bw bytes).

Vectorized fast paths (the reference loops value-by-value in Go):
  * bw % 8 == 0  -> pure byte truncation (memcpy-speed; bw=16 is the hot
    path for 50k-vocab token ids);
  * otherwise    -> np.unpackbits on the minimal byte view, sliced to bw
    bits per value, then np.packbits — all C loops, processed in bounded
    slices so the transient bit matrix stays < ~64 MB.
"""

from __future__ import annotations

import numpy as np

_POW2 = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
_SLICE = 4 << 20  # values per processing slice (bounds transient memory)


def bit_width(max_value: int) -> int:
    """bits.Len analog: number of bits to represent max_value (0 -> 0)."""
    return int(max_value).bit_length()


def _byte_width(bw: int) -> int:
    for w in (1, 2, 4, 8):
        if bw <= w * 8:
            return w
    raise ValueError(f"bit width {bw} out of range")


def pack(values: np.ndarray, bw: int) -> bytes:
    """Pack unsigned values at ``bw`` bits each, LSB-first."""
    n = len(values)
    if bw == 0 or n == 0:
        return b""
    if bw < 0 or bw > 64:
        raise ValueError(f"bit width {bw} out of range [0, 64]")
    v = np.asarray(values)
    if bw % 8 == 0:
        nbytes = bw // 8
        dt = _byte_width(bw)
        u = np.ascontiguousarray(v.astype(np.dtype(f"<u{dt}"), copy=False))
        if dt == nbytes:
            return u.tobytes()
        return u.view(np.uint8).reshape(n, dt)[:, :nbytes].tobytes()
    dt = _byte_width(bw)
    u = np.ascontiguousarray(v.astype(np.dtype(f"<u{dt}"), copy=False))
    out = []
    for lo in range(0, n, _SLICE):
        seg = u[lo : lo + _SLICE]
        m = len(seg)
        bits = np.unpackbits(
            seg.view(np.uint8).reshape(m, dt), axis=1, bitorder="little"
        )[:, :bw]
        out.append(np.packbits(bits.ravel(), bitorder="little").tobytes())
    if len(out) == 1:
        return out[0]
    # slices are bit-contiguous only if slice*bw % 8 == 0; _SLICE is a
    # multiple of 8 so each slice's bit count is byte-aligned
    return b"".join(out)


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
    if bw % 8 == 0:
        nbytes = bw // 8
        dt = _byte_width(bw)
        rows = raw[: n * nbytes].reshape(n, nbytes)
        if dt != nbytes:
            rows = np.concatenate(
                (rows, np.zeros((n, dt - nbytes), dtype=np.uint8)), axis=1
            )
        return (
            np.ascontiguousarray(rows)
            .view(np.dtype(f"<u{dt}"))
            .ravel()
            .astype(np.uint64, copy=False)
        )
    dt = _byte_width(bw)
    out = np.empty(n, dtype=np.uint64)
    # process in slices; n*bw bits per slice is byte-aligned (slice % 8 == 0)
    step = _SLICE
    for lo in range(0, n, step):
        m = min(step, n - lo)
        bit_lo = lo * bw
        byte_lo = bit_lo // 8
        bits = np.unpackbits(
            raw[byte_lo : byte_lo + (m * bw + 7) // 8],
            count=m * bw,
            bitorder="little",
        ).reshape(m, bw)
        padded = np.zeros((m, dt * 8), dtype=np.uint8)
        padded[:, :bw] = bits
        rows = np.packbits(padded, axis=1, bitorder="little")
        out[lo : lo + m] = (
            np.ascontiguousarray(rows).view(np.dtype(f"<u{dt}")).ravel()
        )
    return out
