"""INT96 legacy timestamps (reference physical type,
/root/reference/internal/encoding/encodingwrite_plain.go:89-95 writes them
as 12-byte values: u64 little-endian nanoseconds-of-day followed by u32
little-endian Julian day number — the layout Impala/legacy Spark used).

The engine stores INT96 columns as fixed(12) byte items, which gives them
the whole FLBA codec menu (plain/dict/delta/fsst + block compression);
these converters are the logical-type boundary: timestamp[us] <-> INT96,
vectorized numpy, lossless for microsecond precision.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

JULIAN_EPOCH_DAY = 2_440_588         # Julian day number of 1970-01-01
US_PER_DAY = 86_400_000_000


def timestamps_to_int96(arr: pa.Array) -> pa.Array:
    """timestamp[*] -> fixed_size_binary(12) in the INT96 layout."""
    a = arr.cast(pa.timestamp("us"))
    n = len(a)
    valid = None
    if a.null_count:
        valid = np.asarray(a.is_valid())
        dense = a.drop_null()
    else:
        dense = a
    us = np.asarray(dense.cast(pa.int64()), dtype=np.int64)
    days = np.floor_divide(us, US_PER_DAY)
    nanos = (us - days * US_PER_DAY).astype(np.uint64) * np.uint64(1000)
    julian = (days + JULIAN_EPOCH_DAY).astype(np.uint32)
    packed = np.zeros((len(us), 12), dtype=np.uint8)
    packed[:, :8] = nanos[:, None].view(np.uint8).reshape(len(us), 8)
    packed[:, 8:] = julian[:, None].view(np.uint8).reshape(len(us), 4)
    if valid is None:
        return pa.Array.from_buffers(
            pa.binary(12), n, [None, pa.py_buffer(packed.tobytes())]
        )
    full = np.zeros((n, 12), dtype=np.uint8)
    full[valid] = packed
    from . import frame

    return pa.Array.from_buffers(
        pa.binary(12), n,
        [pa.py_buffer(frame.pack_validity(valid)), pa.py_buffer(full.tobytes())],
        null_count=int((~valid).sum()),
    )


def int96_to_timestamps(arr: pa.Array) -> pa.Array:
    """fixed_size_binary(12) INT96 -> timestamp[us]."""
    if arr.type != pa.binary(12):
        raise ValueError(f"expected fixed(12), got {arr.type}")
    n = len(arr)
    valid = None
    if arr.null_count:
        valid = np.asarray(arr.is_valid())
        dense = arr.drop_null()
    else:
        dense = arr
    buf = dense.buffers()[1]
    raw = np.frombuffer(buf, dtype=np.uint8)[
        dense.offset * 12 : (dense.offset + len(dense)) * 12
    ].reshape(len(dense), 12)
    nanos = raw[:, :8].copy().view("<u8").reshape(-1)
    julian = raw[:, 8:].copy().view("<u4").reshape(-1).astype(np.int64)
    if len(dense) and int(nanos.max()) >= US_PER_DAY * 1000:
        raise ValueError("INT96 nanos-of-day out of range")
    us = (julian - JULIAN_EPOCH_DAY) * US_PER_DAY + (
        nanos // np.uint64(1000)
    ).astype(np.int64)
    if valid is None:
        return pa.array(us.astype("datetime64[us]"))
    full = np.zeros(n, dtype=np.int64)
    full[valid] = us
    return pa.array(full, type=pa.int64(), mask=~valid).cast(pa.timestamp("us"))
