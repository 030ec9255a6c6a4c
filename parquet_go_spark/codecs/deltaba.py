"""DELTA_LENGTH_BYTE_ARRAY and DELTA_BYTE_ARRAY (front coding).

Mirrors WriteDeltaLengthByteArray / WriteDeltaByteArray and their readers
(/root/reference/internal/encoding/encodingwrite.go:324-384,
 encodingread_delta.go:141-207).

DELTA_LENGTH_BYTE_ARRAY = delta-packed lengths + concatenated payload —
our preferred at-rest layout for string chunks (it is exactly Arrow's
offsets+data split, so encode is zero-copy on the payload side).

DELTA_BYTE_ARRAY = per-value shared-prefix length (delta-packed) + suffixes
as DELTA_LENGTH_BYTE_ARRAY. Prefix computation is vectorized with a
repeat/gather + segmented argmin; reconstruction is inherently sequential
(each value references the previous) and uses a bounded Python loop —
the cost model prefers it only for sorted-ish identifier columns.
"""

from __future__ import annotations

import numpy as np

from . import delta


def encode_delta_length(data: bytes, offsets: np.ndarray) -> bytes:
    offsets = np.asarray(offsets, dtype=np.int64)
    lengths = np.diff(offsets)
    lens_blob = delta.encode(lengths, itemsize=4)
    payload = bytes(memoryview(data)[int(offsets[0]) : int(offsets[-1])])
    return len(lens_blob).to_bytes(4, "little") + lens_blob + payload


def decode_delta_length(buf: bytes) -> tuple[bytes, np.ndarray]:
    if len(buf) < 4:
        raise ValueError("truncated DELTA_LENGTH header")
    hl = int.from_bytes(buf[:4], "little")
    if 4 + hl > len(buf):
        raise ValueError("DELTA_LENGTH lengths section exceeds input")
    lengths = decode_lengths_checked(buf[4 : 4 + hl])
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    payload = buf[4 + hl :]
    if len(payload) < offsets[-1]:
        raise ValueError("DELTA_LENGTH payload shorter than declared lengths")
    return payload[: int(offsets[-1])], offsets


def decode_lengths_checked(blob: bytes) -> np.ndarray:
    lengths = delta.decode(blob, itemsize=4).astype(np.int64)
    if len(lengths) and lengths.min() < 0:
        raise ValueError("negative string length")  # encodingread_delta.go:154-157
    return lengths


def common_prefix_lengths(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """prefix[i] = shared-prefix byte count of value i with value i-1 (prefix[0]=0)."""
    n = len(offsets) - 1
    prefixes = np.zeros(n, dtype=np.int64)
    if n <= 1:
        return prefixes
    from .. import native

    if native.HAVE:
        data = np.ascontiguousarray(data)
        offsets = np.ascontiguousarray(offsets, dtype=np.int64)
        native.lib.pgs_dba_prefixes(
            data.ctypes.data, offsets.ctypes.data, n, prefixes.ctypes.data
        )
        return prefixes
    lengths = np.diff(offsets)
    ml = np.minimum(lengths[:-1], lengths[1:])  # pair i compares value i and i+1
    pairs = np.flatnonzero(ml > 0)
    if len(pairs) == 0:
        return prefixes
    seg_len = ml[pairs]
    seg_start = np.zeros(len(pairs), dtype=np.int64)
    np.cumsum(seg_len[:-1], out=seg_start[1:])
    total = int(seg_len.sum())
    within = np.arange(total, dtype=np.int64) - np.repeat(seg_start, seg_len)
    idx_a = within + np.repeat(offsets[:-1][pairs], seg_len)
    idx_b = within + np.repeat(offsets[pairs + 1], seg_len)
    neq = data[idx_a] != data[idx_b]
    pos = np.where(neq, within, np.repeat(seg_len, seg_len))
    first_mismatch = np.minimum.reduceat(pos, seg_start)
    prefixes[pairs + 1] = first_mismatch
    return prefixes


def encode_delta_ba(data: bytes, offsets: np.ndarray) -> bytes:
    offsets = np.asarray(offsets, dtype=np.int64)
    arr = np.frombuffer(data, dtype=np.uint8)
    n = len(offsets) - 1
    prefixes = common_prefix_lengths(arr, offsets)
    lengths = np.diff(offsets)
    suf_len = lengths - prefixes
    # gather suffix bytes
    suf_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(suf_len, out=suf_off[1:])
    total = int(suf_off[-1])
    if total:
        src = (
            np.arange(total, dtype=np.int64)
            - np.repeat(suf_off[:-1], suf_len)
            + np.repeat(offsets[:-1] + prefixes, suf_len)
        )
        suffixes = arr[src].tobytes()
    else:
        suffixes = b""
    pfx_blob = delta.encode(prefixes, itemsize=4)
    body = encode_delta_length(suffixes, suf_off)
    return len(pfx_blob).to_bytes(4, "little") + pfx_blob + body


def decode_delta_ba(buf: bytes) -> tuple[bytes, np.ndarray]:
    if len(buf) < 4:
        raise ValueError("truncated DELTA_BYTE_ARRAY header")
    pl = int.from_bytes(buf[:4], "little")
    if 4 + pl > len(buf):
        raise ValueError("prefix section exceeds input")
    prefixes = decode_lengths_checked(buf[4 : 4 + pl])
    suf_data, suf_off = decode_delta_length(buf[4 + pl :])
    n = len(prefixes)
    if len(suf_off) - 1 != n:
        raise ValueError("prefix/suffix count mismatch")

    from .. import native

    if native.HAVE and n:
        # Validate BEFORE allocating sum(prefixes) bytes: value i's length is
        # prefixes[i] + suf_len[i], and prefixes[i] may not exceed value i-1's
        # length — checkable in one vector pass since lens[i-1] is what the
        # previous value's length will be whenever everything before it is
        # valid. A malformed blob must raise, never trigger a giant alloc.
        lens = prefixes + np.diff(suf_off)
        if prefixes[0] != 0 or (n > 1 and np.any(prefixes[1:] > lens[:-1])):
            raise ValueError("prefix length exceeds previous value")
        total = int(lens.sum())
        out_buf = np.empty(max(total, 1), dtype=np.uint8)
        out_off = np.empty(n + 1, dtype=np.int64)
        suf_arr = np.frombuffer(suf_data, dtype=np.uint8)
        got = native.lib.pgs_dba_reconstruct(
            suf_arr.ctypes.data, suf_off.ctypes.data, prefixes.ctypes.data,
            n, out_buf.ctypes.data, out_off.ctypes.data,
        )
        if got >= 0:
            return out_buf[:got].tobytes(), out_off
        # unreachable after the check above; belt-and-braces fall-through
        # keeps the numpy path's exact error surface
    out = bytearray()
    offsets = np.zeros(n + 1, dtype=np.int64)
    prev_start = 0
    mv = memoryview(suf_data)
    for i in range(n):
        p = int(prefixes[i])
        if p > len(out) - prev_start:
            raise ValueError("prefix length exceeds previous value")
        start = len(out)
        out.extend(out[prev_start : prev_start + p])
        out.extend(mv[int(suf_off[i]) : int(suf_off[i + 1])])
        prev_start = start
        offsets[i + 1] = len(out)
    return bytes(out), offsets
