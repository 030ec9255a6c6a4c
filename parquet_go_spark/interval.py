"""INTERVAL logical type (reference /root/reference/types/interval.go:9-88):
a 12-byte FIXED_LEN_BYTE_ARRAY of three little-endian uint32 fields —
months, days, milliseconds — rendered as "X mon X day X.xxx sec" (parts
with a zero value are omitted; a zero interval renders "0.000 sec").

The engine stores INTERVAL columns as fixed(12) byte items, which gives
them the whole FLBA codec menu (plain/dict/delta/fsst + block
compression); these converters are the logical-type boundary, vectorized
numpy on the pack/unpack side.  String *formatting* is deliberately left
to the caller: the rt_interval query renders the reference string with
JVM-side expressions (format_string/concat_ws), keeping per-row work out
of Python — `to_strings` below exists for pytest parity with the Go
renderer, not for the hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pack_interval(
    months: np.ndarray, days: np.ndarray, millis: np.ndarray
) -> pa.Array:
    """(months, days, millis) uint32 vectors -> fixed_size_binary(12)
    in the reference layout (interval.go:82-86: LE u32 × 3)."""
    m = np.ascontiguousarray(months, dtype=np.uint32)
    d = np.ascontiguousarray(days, dtype=np.uint32)
    ms = np.ascontiguousarray(millis, dtype=np.uint32)
    if not (len(m) == len(d) == len(ms)):
        raise ValueError("interval field vectors must share a length")
    packed = np.empty((len(m), 12), dtype=np.uint8)
    packed[:, 0:4] = m[:, None].view(np.uint8).reshape(len(m), 4)
    packed[:, 4:8] = d[:, None].view(np.uint8).reshape(len(m), 4)
    packed[:, 8:12] = ms[:, None].view(np.uint8).reshape(len(m), 4)
    return pa.Array.from_buffers(
        pa.binary(12), len(m), [None, pa.py_buffer(packed.tobytes())]
    )


def unpack_interval(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """fixed_size_binary(12) -> (months, days, millis) uint32 vectors
    (interval.go:14-16).  Nulls are not expected at this boundary — the
    chunk layer carries validity separately."""
    if arr.type != pa.binary(12):
        raise ValueError(f"INTERVAL expects fixed(12), got {arr.type}")
    if arr.null_count:
        raise ValueError("unpack_interval expects a dense (null-free) array")
    raw = np.frombuffer(
        arr.buffers()[1], dtype=np.uint8,
        count=len(arr) * 12, offset=arr.offset * 12,
    ).reshape(len(arr), 12)
    months = raw[:, 0:4].copy().view(np.uint32).reshape(len(arr))
    days = raw[:, 4:8].copy().view(np.uint32).reshape(len(arr))
    millis = raw[:, 8:12].copy().view(np.uint32).reshape(len(arr))
    return months, days, millis


def to_strings(arr: pa.Array) -> list[str]:
    """Reference IntervalToString (interval.go:9-34), for test parity:
    join non-zero "N mon" / "N day" parts, then "%.3f sec" when seconds
    > 0 or nothing else was emitted."""
    months, days, millis = unpack_interval(arr)
    out = []
    for m, d, ms in zip(months.tolist(), days.tolist(), millis.tolist()):
        parts = []
        if m > 0:
            parts.append(f"{m} mon")
        if d > 0:
            parts.append(f"{d} day")
        if ms > 0 or not parts:
            parts.append(f"{ms / 1000.0:.3f} sec")
        out.append(" ".join(parts))
    return out


def parse_interval_string(s: str) -> bytes:
    """Reference ParseIntervalString (interval.go:37-88): accept
    space-separated "<value> <unit>" pairs (mon/day/sec prefixes, any
    order), return the 12-byte LE layout.  Empty input is the zero
    interval.  Scalar converter utility (the reference's is too) — not a
    hot-path kernel."""
    s = s.strip()
    months = days = 0
    seconds = 0.0
    if s:
        parts = s.split()
        if len(parts) % 2:
            raise ValueError(f"invalid interval format: {s}")
        for i in range(0, len(parts), 2):
            value, unit = parts[i], parts[i + 1].lower()
            if unit.startswith("mon"):
                months = int(value)
            elif unit.startswith("day"):
                days = int(value)
            elif unit.startswith("sec"):
                seconds = float(value)
            else:
                raise ValueError(f"unknown interval unit: {unit}")
            if months < 0 or days < 0 or seconds < 0:
                raise ValueError(f"interval fields must be unsigned: {s}")
    out = np.empty(3, dtype=np.uint32)
    out[0], out[1], out[2] = months, days, int(seconds * 1000)
    return out.tobytes()
