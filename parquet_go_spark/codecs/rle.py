"""RLE / bit-packed hybrid encoding (Parquet's RLE encoding).

Stream grammar (same as the reference's WriteRLEBitPackedHybrid /
ReadRLEBitPackedHybrid, /root/reference/internal/encoding/encodingwrite.go:13-141
and encodingread.go:46-232):

  run        := rle-run | bitpacked-run
  rle-run    := uvarint(count << 1)            value:ceil(bw/8) LE bytes
  bitpacked- := uvarint(groups << 1 | 1)       groups * bw bytes (8 values/group)

Encoder policy mirrors the reference's greedy heuristic: value runs of
length >= 8 become RLE runs (``rleRunThreshold = 8``), everything else is
bit-packed literals, and literal counts are aligned to groups of 8 by
stealing leading values from the following RLE run
(encodingwrite.go:104-115). Only the final bit-packed run may carry
zero-padding; the decoder truncates to the declared count
(encodingread.go:222-228).

Vectorization: run boundaries come from np.diff; the Python loop is over
*qualifying runs* (length >= 8), not values, so all-literal data costs one
bit-pack call and RLE-friendly data costs O(#runs).
"""

from __future__ import annotations

import numpy as np

from .bitpack import pack as bp_pack
from .bitpack import unpack as bp_unpack
from .varint import read_uvarint, write_uvarint

RLE_RUN_THRESHOLD = 8  # reference encodingwrite.go:88
BIT_PACKED_GROUP = 8


def _runs(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Return (run_starts, run_lengths) for equal-value runs."""
    n = len(values)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    change = np.flatnonzero(values[1:] != values[:-1]) + 1
    starts = np.concatenate(([0], change))
    lengths = np.diff(np.concatenate((starts, [n])))
    return starts, lengths


def _rle_value_bytes(value: int, bw: int) -> bytes:
    nbytes = (bw + 7) // 8
    return int(value).to_bytes(nbytes, "little", signed=False)


def encode(values: np.ndarray, bw: int) -> bytes:
    """Encode unsigned ``values`` at bit width ``bw`` as an RLE-hybrid stream."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    out = bytearray()
    if n == 0:
        return bytes(out)

    def emit_bitpacked(seg: np.ndarray, final: bool) -> None:
        cnt = len(seg)
        if cnt == 0:
            return
        groups = -(-cnt // BIT_PACKED_GROUP)
        if not final and cnt % BIT_PACKED_GROUP:
            raise AssertionError("non-final literal run must be 8-aligned")
        if cnt % BIT_PACKED_GROUP:
            seg = np.concatenate(
                (seg, np.zeros(groups * BIT_PACKED_GROUP - cnt, np.uint64))
            )
        out.extend(write_uvarint((groups << 1) | 1))
        out.extend(bp_pack(seg, bw))

    def emit_rle(value: int, count: int) -> None:
        out.extend(write_uvarint(count << 1))
        out.extend(_rle_value_bytes(value, bw))

    starts, lengths = _runs(v)
    cand = np.flatnonzero(lengths >= RLE_RUN_THRESHOLD)
    lit_begin = 0
    for i in cand:
        s = int(starts[i])
        run_len = int(lengths[i])
        lit_count = s - lit_begin
        pad = (-lit_count) % BIT_PACKED_GROUP  # steal to align literals
        rem = run_len - pad
        if rem >= RLE_RUN_THRESHOLD:
            if lit_count + pad:
                emit_bitpacked(v[lit_begin : s + pad], final=False)
            emit_rle(int(v[s]), rem)
            lit_begin = s + run_len
        # else: run too short after alignment — absorbed into literals
    if n - lit_begin:
        emit_bitpacked(v[lit_begin:], final=True)
    return bytes(out)


def decode(buf: bytes, bw: int, count: int) -> np.ndarray:
    """Decode exactly ``count`` values from an RLE-hybrid stream.

    Defensive bounds mirror the reference (encodingread.go:52-61,120-126):
    declared run counts are checked against both the remaining payload and
    the remaining output budget before any allocation.
    """
    if count < 0 or count > (1 << 31):
        raise ValueError(f"invalid count {count}")  # validateCount analog
    out = np.empty(count, dtype=np.uint64)
    filled = 0
    pos = 0
    nbytes_val = (bw + 7) // 8
    blen = len(buf)
    while filled < count:
        header, pos = read_uvarint(buf, pos)
        if header & 1:  # bit-packed run
            groups = header >> 1
            nvals = groups * BIT_PACKED_GROUP
            nbytes = groups * bw
            if nvals > count - filled + BIT_PACKED_GROUP - 1:
                raise ValueError("bit-packed run exceeds declared count")
            if pos + nbytes > blen:
                raise ValueError("truncated bit-packed run")
            vals = bp_unpack(buf[pos : pos + nbytes], nvals, bw)
            take = min(nvals, count - filled)
            out[filled : filled + take] = vals[:take]
            filled += take
            pos += nbytes
        else:  # RLE run
            run_len = header >> 1
            if run_len > count - filled:
                raise ValueError("RLE run exceeds declared count")
            if pos + nbytes_val > blen:
                raise ValueError("truncated RLE value")
            value = int.from_bytes(buf[pos : pos + nbytes_val], "little") if nbytes_val else 0
            out[filled : filled + run_len] = value
            filled += run_len
            pos += nbytes_val
    return out


def encode_with_length_prefix(values: np.ndarray, bw: int) -> bytes:
    """u32-length-prefixed variant (v1 data-page levels, WriteRLEBitPackedHybrid)."""
    body = encode(values, bw)
    return len(body).to_bytes(4, "little") + body


def decode_with_length_prefix(buf: bytes, bw: int, count: int) -> tuple[np.ndarray, int]:
    if len(buf) < 4:
        raise ValueError("truncated RLE length prefix")
    blen = int.from_bytes(buf[:4], "little")
    if 4 + blen > len(buf):
        raise ValueError("RLE section length exceeds remaining input")
    return decode(buf[4 : 4 + blen], bw, count), 4 + blen
