"""BSON logical type: vectorized document packing and the decode-to-map
conversion, plus the ENUM note.

The reference annotates BYTE_ARRAY columns as BSON and converts values on
read with ConvertBSONLogicalValue (types/bson.go:10-35): bytes -> map,
falling back to base64 for malformed payloads. ENUM is annotation-only
(string func table, common/functable.go:33).

Here:

  * ``pack_docs`` — build BSON documents for a FIXED schema of scalar
    fields (int32/int64/float64/string/bool) fully vectorized: per-row
    byte layout is computed with numpy offset arithmetic (same scatter
    technique as geo.wkb_points), no per-row Python. This is the write
    side a pipeline uses to materialize a BSON column at scale.
  * ``unpack_docs`` — document-at-a-time parser to dicts for the read
    side, mirroring the reference's per-value converter (the conversion
    path, not the token hot path); malformed documents come back as
    base64 strings exactly like the reference's fallback.

BSON spec (bsonspec.org 1.1): document = int32 total_size, e_list, 0x00;
element = type_byte, cstring key, value.
"""

from __future__ import annotations

import base64
import struct

import numpy as np
import pyarrow as pa

T_DOUBLE, T_STRING, T_BOOL, T_NULL, T_INT32, T_INT64 = (
    0x01, 0x02, 0x08, 0x0A, 0x10, 0x12,
)
_FIXED_WIDTH = {T_DOUBLE: 8, T_INT32: 4, T_INT64: 8, T_BOOL: 1, T_NULL: 0}


def _field_plan(name: str, values) -> tuple[int, np.ndarray, list]:
    """(bson type, per-row value byte widths, normalized values)."""
    if isinstance(values, np.ndarray):
        if values.dtype == np.int32:
            return T_INT32, np.full(len(values), 4), values
        if values.dtype == np.int64:
            return T_INT64, np.full(len(values), 8), values
        if values.dtype == np.float64:
            return T_DOUBLE, np.full(len(values), 8), values
        if values.dtype == np.bool_:
            return T_BOOL, np.full(len(values), 1), values
        raise TypeError(f"unsupported dtype {values.dtype} for field {name}")
    # list of str -> BSON string: int32 len+1, bytes, NUL
    enc = [v.encode("utf-8") for v in values]
    lens = np.array([len(b) + 5 for b in enc], dtype=np.int64)
    return T_STRING, lens, enc


def pack_docs(fields: dict[str, object]) -> pa.Array:
    """Vectorized BSON builder for a fixed scalar schema.

    ``fields`` maps name -> numpy array (int32/int64/float64/bool) or
    list[str]; all the same length. Returns a binary Arrow array of BSON
    documents with fields in dict order."""
    names = list(fields)
    n = len(next(iter(fields.values())))
    plans = [(_field_plan(k, fields[k]), k.encode("utf-8") + b"\0")
             for k in names]
    # per-row total size: 4 (len) + sum(1 + len(key)+1 + width) + 1 (end)
    total = np.full(n, 5, dtype=np.int64)
    widths = []
    for (t, w, _), key in plans:
        total += 1 + len(key) + w
        widths.append(w)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(total, out=offsets[1:])
    buf = np.zeros(int(offsets[-1]), dtype=np.uint8)

    # document length prefix (little-endian int32) at each doc start
    doc_starts = offsets[:-1]
    buf_i32 = total.astype("<i4").view(np.uint8).reshape(n, 4)
    for b in range(4):
        buf[doc_starts + b] = buf_i32[:, b]

    pos = doc_starts + 4
    for ((t, w, vals), key) in plans:
        buf[pos] = t
        pos = pos + 1
        for b, kb in enumerate(key):
            buf[pos + b] = kb
        pos = pos + len(key)
        if t == T_STRING:
            # int32 strlen+1, utf8 bytes, NUL — variable width scatter
            slen = (w - 4).astype("<i4").view(np.uint8).reshape(n, 4)
            for b in range(4):
                buf[pos + b] = slen[:, b]
            data = b"".join(vals)
            flat = np.frombuffer(data, dtype=np.uint8)
            # scatter each string's bytes: build a gather index
            starts = pos + 4
            lens = w - 5
            src_off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=src_off[1:])
            idx = np.repeat(starts, lens) + (
                np.arange(int(src_off[-1])) - np.repeat(src_off[:-1], lens)
            )
            buf[idx] = flat
            # NUL terminators already zero (buf initialized to 0)
        elif t == T_BOOL:
            buf[pos] = vals.astype(np.uint8)
        else:
            width = _FIXED_WIDTH[t]
            le = np.ascontiguousarray(vals).astype(
                {T_INT32: "<i4", T_INT64: "<i8", T_DOUBLE: "<f8"}[t]
            ).view(np.uint8).reshape(n, width)
            for b in range(width):
                buf[pos + b] = le[:, b]
        pos = pos + w
    # trailing 0x00 already zero
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.astype(np.int32).tobytes()),
         pa.py_buffer(buf.tobytes())],
    )


def unpack_doc(doc: bytes):
    """One BSON document -> dict (reference ConvertBSONLogicalValue analog:
    malformed -> base64 string, empty -> {})."""
    if len(doc) == 0:
        return {}
    try:
        total = struct.unpack_from("<i", doc, 0)[0]
        if total != len(doc) or doc[-1] != 0:
            raise ValueError("bad document frame")
        out = {}
        pos = 4
        while doc[pos] != 0:
            t = doc[pos]
            end = doc.index(b"\0", pos + 1)
            key = doc[pos + 1 : end].decode("utf-8")
            pos = end + 1
            if t == T_DOUBLE:
                out[key] = struct.unpack_from("<d", doc, pos)[0]
                pos += 8
            elif t == T_INT32:
                out[key] = struct.unpack_from("<i", doc, pos)[0]
                pos += 4
            elif t == T_INT64:
                out[key] = struct.unpack_from("<q", doc, pos)[0]
                pos += 8
            elif t == T_BOOL:
                out[key] = bool(doc[pos])
                pos += 1
            elif t == T_NULL:
                out[key] = None
            elif t == T_STRING:
                slen = struct.unpack_from("<i", doc, pos)[0]
                out[key] = doc[pos + 4 : pos + 3 + slen].decode("utf-8")
                pos += 4 + slen
            else:
                raise ValueError(f"unsupported element type 0x{t:02x}")
        return out
    except (ValueError, IndexError, struct.error, UnicodeDecodeError):
        return base64.b64encode(doc).decode("ascii")


def unpack_docs(arr: pa.Array) -> list:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return [None if v is None else unpack_doc(v) for v in arr.to_pylist()]
