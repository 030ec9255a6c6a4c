"""PLAIN encoding — raw little-endian serialization per physical type.

Mirrors WritePlain / ReadPlain
(/root/reference/internal/encoding/encodingwrite_plain.go:34-159,
 encodingread_plain.go:12-58): fixed-width types are LE byte dumps, BOOLEAN
is bit-packed 1 bit/value LSB-first, BYTE_ARRAY is u32-length-prefixed bytes,
FIXED_LEN_BYTE_ARRAY is raw concatenation.
"""

from __future__ import annotations

import numpy as np

_MAX_DECODE = 256 << 20  # decompression/allocation bomb cap, compress.go:13-19


def encode_numeric(values: np.ndarray) -> bytes:
    """INT32/INT64/FLOAT/DOUBLE -> little-endian bytes."""
    a = np.ascontiguousarray(values)
    return a.astype(a.dtype.newbyteorder("<"), copy=False).tobytes()


def decode_numeric(buf: bytes, dtype: np.dtype, count: int) -> np.ndarray:
    dtype = np.dtype(dtype).newbyteorder("<")
    need = dtype.itemsize * count
    if need > _MAX_DECODE:
        raise ValueError("plain payload exceeds decode cap")
    if len(buf) < need:
        raise ValueError("truncated PLAIN payload")
    return np.frombuffer(buf, dtype=dtype, count=count).astype(
        dtype.newbyteorder("="), copy=False
    )


def encode_bool(values: np.ndarray) -> bytes:
    """BOOLEAN bit-packed LSB-first (encodingwrite_plain.go:57-71)."""
    return np.packbits(
        np.ascontiguousarray(values, dtype=bool), bitorder="little"
    ).tobytes()


def decode_bool(buf: bytes, count: int) -> np.ndarray:
    if len(buf) * 8 < count:
        raise ValueError("truncated BOOLEAN payload")
    return np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), count=count, bitorder="little"
    ).astype(bool)


def encode_byte_array(data: bytes, offsets: np.ndarray) -> bytes:
    """BYTE_ARRAY: u32 length prefix + bytes per value, vectorized scatter.

    ``data``/``offsets`` are Arrow-style: value i = data[offsets[i]:offsets[i+1]].
    (encodingwrite_plain.go:124-146)
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    if n == 0:
        return b""
    lengths = np.diff(offsets)
    total = int(lengths.sum()) + 4 * n
    out = np.zeros(total, dtype=np.uint8)
    # output start of each record = cumulative (len + 4)
    rec_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1] + 4, out=rec_starts[1:])
    # write u32 length prefixes
    len_le = lengths.astype("<u4").view(np.uint8).reshape(n, 4)
    for k in range(4):
        out[rec_starts + k] = len_le[:, k]
    # gather payload bytes: map each output payload byte to its input byte
    src = np.frombuffer(data, dtype=np.uint8)
    if len(src):
        # destination index for every input byte in [offsets[0], offsets[n])
        dst = (
            np.arange(offsets[0], offsets[n], dtype=np.int64)
            - np.repeat(offsets[:-1], lengths)
            + np.repeat(rec_starts + 4, lengths)
        )
        out[dst] = src[offsets[0] : offsets[n]]
    return out.tobytes()


def decode_byte_array(buf: bytes, count: int) -> tuple[bytes, np.ndarray]:
    """Inverse of encode_byte_array -> (data, offsets)."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    lengths = np.empty(count, dtype=np.int64)
    pos = 0
    # sequential header walk (lengths are data-dependent); vector gather after
    starts = np.empty(count, dtype=np.int64)
    blen = len(raw)
    for i in range(count):
        if pos + 4 > blen:
            raise ValueError("truncated BYTE_ARRAY length prefix")
        ln = int.from_bytes(buf[pos : pos + 4], "little")
        if ln > _MAX_DECODE or pos + 4 + ln > blen:
            raise ValueError("BYTE_ARRAY length exceeds remaining input")
        lengths[i] = ln
        starts[i] = pos + 4
        pos += 4 + ln
    offsets = np.zeros(count + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    total = int(offsets[-1])
    data = np.empty(total, dtype=np.uint8)
    if total:
        src = (
            np.arange(total, dtype=np.int64)
            - np.repeat(offsets[:-1], lengths)
            + np.repeat(starts, lengths)
        )
        data = raw[src]
    return data.tobytes(), offsets


def encode_fixed(data: bytes) -> bytes:
    """FIXED_LEN_BYTE_ARRAY: raw concatenation (encodingwrite_plain.go:148-159)."""
    return bytes(data)


def decode_fixed(buf: bytes, count: int, width: int) -> bytes:
    if len(buf) < count * width:
        raise ValueError("truncated FIXED payload")
    return buf[: count * width]
