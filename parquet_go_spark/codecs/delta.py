"""DELTA_BINARY_PACKED — frame-of-reference delta encoding (Parquet spec).

Layout matches the reference's WriteDelta / ReadDeltaBinaryPackedINT64
(/root/reference/internal/encoding/encodingwrite.go:171-322,
 encodingread_delta.go:8-139): header = uvarint(block_size=128),
uvarint(miniblocks_per_block=4), uvarint(total_count), zigzag-varint(first);
per block: zigzag-varint(min_delta), 4 width bytes, then 32-value miniblocks
bit-packed LSB-first at their width.

Vectorization strategy (the reference loops value-at-a-time): deltas via
np.diff; per-block minima via np.minimum.reduceat; miniblock bit widths via a
vectorized bit_length; miniblocks are *grouped by width* and packed in one
bitpack call per distinct width (each 32-value miniblock is byte-aligned, so
the concatenated pack splits exactly at 4*width-byte boundaries).
"""

from __future__ import annotations

import numpy as np

from .bitpack import pack as bp_pack
from .bitpack import unpack as bp_unpack
from .varint import read_uvarint, write_uvarint, zigzag_decode, zigzag_encode

BLOCK_SIZE = 128      # reference encodingwrite.go:191
MINIBLOCKS = 4
MINIBLOCK_SIZE = BLOCK_SIZE // MINIBLOCKS  # 32


def bit_length_array(m: np.ndarray) -> np.ndarray:
    """Vectorized int.bit_length for a uint64 array (exact, no float error)."""
    m = np.asarray(m, dtype=np.uint64)
    w = np.zeros(m.shape, dtype=np.int64)
    nz = m > 0
    if nz.any():
        approx = np.floor(np.log2(m[nz].astype(np.float64))).astype(np.int64) + 1
        approx = np.clip(approx, 1, 64)
        # float log2 can be off by one near powers of two — correct exactly
        too_big = (approx < 64) & (m[nz] >= (np.uint64(1) << approx.astype(np.uint64)))
        approx[too_big] += 1
        lo_mask = approx > 1
        shrink = np.zeros_like(approx, dtype=bool)
        shrink[lo_mask] = m[nz][lo_mask] < (
            np.uint64(1) << (approx[lo_mask] - 1).astype(np.uint64)
        )
        approx[shrink] -= 1
        w[nz] = approx
    return w


def encode(values: np.ndarray, itemsize: int = 8,
           block_size: int = BLOCK_SIZE,
           miniblocks: int = MINIBLOCKS) -> bytes:
    """Encode int32/int64 values; arithmetic wraps (matching Go int64 ops).

    ``block_size``/``miniblocks`` default to the reference writer's
    128/4 (encodingwrite.go:191); other spec-legal geometries (e.g.
    arrow C++'s 256/4 for INT64) are accepted for cross-writer
    byte-identity tests — the decoder reads the geometry from the
    header either way."""
    if block_size % (miniblocks * 8):
        raise ValueError("miniblock size must be a multiple of 8")
    mb_size = block_size // miniblocks
    a = np.ascontiguousarray(values).astype(np.int64, copy=False)
    n = len(a)
    out = [
        write_uvarint(block_size),
        write_uvarint(miniblocks),
        write_uvarint(n),
    ]
    if n == 0:
        return b"".join(out)
    first = int(a[0])
    if itemsize == 4:
        first_zz = ((first << 1) ^ (first >> 31)) & 0xFFFFFFFF
    else:
        first_zz = zigzag_encode(first) & 0xFFFFFFFFFFFFFFFF
    out.append(write_uvarint(first_zz))
    m = n - 1
    if m == 0:
        return b"".join(out)

    with np.errstate(over="ignore"):
        deltas = (a[1:].view(np.uint64) - a[:-1].view(np.uint64)).view(np.int64)
        if itemsize == 4:
            # keep deltas in 32-bit modular domain like the INT32 writer
            deltas = deltas.astype(np.int32).astype(np.int64)
    nblocks = -(-m // block_size)
    block_starts = np.arange(nblocks) * block_size
    mins = np.minimum.reduceat(deltas, block_starts)

    padded = np.empty(nblocks * block_size, dtype=np.int64)
    padded[:m] = deltas
    # pad with the last block's min so padding never widens a miniblock
    padded[m:] = mins[-1]
    with np.errstate(over="ignore"):
        adj = (
            padded.view(np.uint64).reshape(nblocks, block_size)
            - mins.view(np.uint64)[:, None]
        )
    if itemsize == 4:
        adj &= np.uint64(0xFFFFFFFF)

    mb = adj.reshape(nblocks * miniblocks, mb_size)
    used_mb = -(-m // mb_size)
    widths = bit_length_array(mb.max(axis=1))
    widths[used_mb:] = 0  # trailing miniblocks beyond data: width 0, no payload

    # pack all miniblocks of the same width in one vectorized call
    payload: list[bytes] = [b""] * (nblocks * miniblocks)
    for w in np.unique(widths[:used_mb]):
        w = int(w)
        if w == 0:
            continue
        idx = np.flatnonzero(widths[:used_mb] == w)
        blob = bp_pack(mb[idx].ravel(), w)
        step = mb_size * w // 8
        for k, i in enumerate(idx):
            payload[i] = blob[k * step : (k + 1) * step]

    for b in range(nblocks):
        mn = int(mins[b])
        if itemsize == 4:
            mn_zz = ((mn << 1) ^ (mn >> 31)) & 0xFFFFFFFF
        else:
            mn_zz = zigzag_encode(mn) & 0xFFFFFFFFFFFFFFFF
        out.append(write_uvarint(mn_zz))
        out.append(bytes(int(x) for x in widths[b * miniblocks : (b + 1) * miniblocks]))
        out.extend(payload[b * miniblocks : (b + 1) * miniblocks])
    return b"".join(out)


def decode(buf: bytes, itemsize: int = 8) -> np.ndarray:
    """Decode a DELTA_BINARY_PACKED stream -> int64 (or int32) array."""
    return decode_consumed(buf, itemsize)[0]


def decode_consumed(buf: bytes, itemsize: int = 8) -> tuple[np.ndarray, int]:
    """Decode and also return the byte position one past the stream's
    last miniblock — the spec's streams are self-delimiting, which is
    how DELTA_LENGTH_BYTE_ARRAY / DELTA_BYTE_ARRAY readers find the
    sections that follow (no length prefix in the wire format)."""
    block_size, pos = read_uvarint(buf, 0)
    miniblocks, pos = read_uvarint(buf, pos)
    if block_size == 0 or miniblocks == 0 or block_size % miniblocks:
        raise ValueError("invalid delta header")
    mb_size = block_size // miniblocks
    n, pos = read_uvarint(buf, pos)
    if n > (1 << 31):
        raise ValueError(f"invalid count {n}")  # validateCount analog
    dtype = np.int32 if itemsize == 4 else np.int64
    if n == 0:
        return np.zeros(0, dtype=dtype), pos
    first_zz, pos = read_uvarint(buf, pos)
    first = zigzag_decode(first_zz)
    if n == 1:
        return np.array([first], dtype=dtype), pos

    m = n - 1
    nblocks = -(-m // block_size)
    mins = np.empty(nblocks, dtype=np.int64)
    slots: list[tuple[int, int, int]] = []  # (mb_index, width, byte_offset)
    for b in range(nblocks):
        mn_zz, pos = read_uvarint(buf, pos)
        mins[b] = zigzag_decode(mn_zz)
        if pos + miniblocks > len(buf):
            raise ValueError("truncated miniblock widths")
        ws = buf[pos : pos + miniblocks]
        pos += miniblocks
        for j, w in enumerate(ws):
            if w > 64:
                raise ValueError(f"miniblock width {w} > 64")
            gmb = b * miniblocks + j
            if gmb * mb_size >= m:
                continue  # unused trailing miniblock
            nbytes = mb_size * w // 8
            if pos + nbytes > len(buf):
                raise ValueError("truncated miniblock payload")
            slots.append((gmb, w, pos))
            pos += nbytes

    adj = np.zeros(nblocks * miniblocks * mb_size, dtype=np.uint64)
    by_width: dict[int, list[tuple[int, int]]] = {}
    for gmb, w, off in slots:
        if w:
            by_width.setdefault(w, []).append((gmb, off))
    for w, items in by_width.items():
        step = mb_size * w // 8
        blob = b"".join(buf[off : off + step] for _, off in items)
        vals = bp_unpack(blob, len(items) * mb_size, w)
        for k, (gmb, _) in enumerate(items):
            adj[gmb * mb_size : (gmb + 1) * mb_size] = vals[
                k * mb_size : (k + 1) * mb_size
            ]

    with np.errstate(over="ignore"):
        deltas = adj.reshape(nblocks, block_size) + mins.view(np.uint64)[:, None]
        flat = deltas.ravel()[:m]
        acc = np.empty(n, dtype=np.uint64)
        acc[0] = np.uint64(first) if first >= 0 else np.uint64(first + (1 << 64))
        np.cumsum(flat, out=flat)
        acc[1:] = acc[0] + flat
    signed = acc.view(np.int64)
    if itemsize == 4:
        return signed.astype(np.int32), pos
    return signed.copy(), pos
