"""Parquet VARIANT binary format: encode, decode, shredding, and
reconstruction (reference types/variant.go:94-176,
types/variant_decode.go, types/variant_encode.go,
marshal/variant_reconstruct.go; format per the public parquet-format
VariantEncoding.md / VariantShredding.md specs).

Spark 4's VariantType uses the same open encoding, so this module is
cross-checked both ways against the JVM implementation: values produced
by ``F.parse_json`` decode here, and values encoded here are readable by
``F.variant_get`` (the apache/parquet-testing analog for this surface).

Shredding (VariantShredding.md, reference variant_reconstruct.go):
selected object fields are pulled out of the opaque binary into TYPED
columns that ride the full codec menu (dict/rans/delta/fsst) instead of
an incompressible blob — that is the 100 TB story — while a residual
``value`` column keeps everything the shredding schema doesn't cover
(absent fields, type-mismatched rows, non-object rows). Reconstruction
merges typed columns back; like the reference, it re-encodes
canonically (sorted dictionary), so equality is semantic, not
byte-level ("Decode followed by re-encode does NOT guarantee canonical
form preservation", types/variant.go:40-42).

This is the conversion path, not the token hot path: values are
variable-shape nested trees, so encode/decode walk per value exactly as
the reference does (variant_decode.go is row-at-a-time Go). The hot
path — the typed columns a shred produces — is vectorized by the chunk
codecs.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

__all__ = [
    "VariantMetadata",
    "decode_metadata",
    "decode_value",
    "encode_metadata",
    "encode_metadata_sorted",
    "encode_value",
    "encode_variant",
    "shred_rows",
    "reconstruct_rows",
    "SHRED_KINDS",
]

# basic types (2 low bits of the value-metadata byte)
_BT_PRIMITIVE, _BT_SHORT_STR, _BT_OBJECT, _BT_ARRAY = 0, 1, 2, 3

# primitive ids (6 high bits), VariantEncoding.md
_P_NULL, _P_TRUE, _P_FALSE = 0, 1, 2
_P_INT8, _P_INT16, _P_INT32, _P_INT64 = 3, 4, 5, 6
_P_DOUBLE = 7
_P_DECIMAL4, _P_DECIMAL8, _P_DECIMAL16 = 8, 9, 10
_P_DATE = 11
_P_TS_MICRO, _P_TS_NTZ_MICRO = 12, 13
_P_FLOAT = 14
_P_BINARY, _P_STRING = 15, 16
_P_TIME_NTZ, _P_TS_NANO, _P_TS_NTZ_NANO = 17, 18, 19
_P_UUID = 20

_EMPTY_METADATA = b"\x01\x00\x00"  # version 1, empty dictionary


@dataclass
class VariantMetadata:
    dictionary: list[str]
    sorted: bool = False

    def ids(self) -> dict[str, int]:
        return {s: i for i, s in enumerate(self.dictionary)}


def _read_uint(data: memoryview, pos: int, size: int) -> int:
    return int.from_bytes(data[pos : pos + size], "little")


def decode_metadata(data: bytes) -> VariantMetadata:
    """Decode the metadata dictionary (reference
    decodeVariantMetadata, types/variant.go:94-149). Accepts sorted and
    unsorted dictionaries; rejects unknown versions and truncations."""
    if len(data) == 0:
        return VariantMetadata([], False)
    mv = memoryview(data)
    header = mv[0]
    if header & 0x0F != 1:
        raise ValueError(f"unsupported variant metadata version: {header & 0x0F}")
    is_sorted = bool((header >> 4) & 1)
    # offset_size_minus_one lives at bits 6-7 (VariantEncoding.md; what
    # Spark reads/writes — header 0x41 means offset_size=2). NOTE: the
    # reference shifts by 5 here (types/variant.go:108-117), which
    # diverges from the Apache spec for any metadata over 255 bytes; we
    # follow the spec, pinned by the wide cross-checks in test_variant.
    osz = ((header >> 6) & 0x03) + 1
    pos = 1
    if pos + osz > len(mv):
        raise ValueError("variant metadata too short for dictionary size")
    n = _read_uint(mv, pos, osz)
    pos += osz
    if n > len(mv):  # each string needs >= 0 bytes but n+1 offsets must fit
        raise ValueError("variant metadata dictionary size out of bounds")
    need = (n + 1) * osz
    if pos + need > len(mv):
        raise ValueError("variant metadata too short for offsets")
    offs = [_read_uint(mv, pos + i * osz, osz) for i in range(n + 1)]
    pos += need
    out = []
    for i in range(n):
        s, e = offs[i], offs[i + 1]
        if s > e or pos + e > len(mv):
            raise ValueError("variant metadata string offset out of bounds")
        out.append(bytes(mv[pos + s : pos + e]).decode("utf-8"))
    return VariantMetadata(out, is_sorted)


def _decode_at(mv: memoryview, off: int, d: list[str], budget: list[int]):
    """-> (consumed, value). Budget bounds total operations so crafted
    overlapping offsets can't blow up (variant_decode.go:42-51)."""
    if budget[0] <= 0:
        raise ValueError("variant decode budget exceeded")
    budget[0] -= 1
    if off >= len(mv):
        raise ValueError("variant value offset out of bounds")
    vm = mv[off]
    bt, hdr = vm & 0x03, vm >> 2

    if bt == _BT_SHORT_STR:
        ln = hdr
        if off + 1 + ln > len(mv):
            raise ValueError("short string length exceeds data")
        return 1 + ln, bytes(mv[off + 1 : off + 1 + ln]).decode("utf-8")

    if bt == _BT_PRIMITIVE:
        return _decode_primitive(mv, off + 1, hdr)

    ids, offs, pos = _parse_directory(mv, off, bt, hdr)
    n = len(offs) - 1
    if bt == _BT_OBJECT:
        out = {}
        for i in range(n):
            if ids[i] >= len(d):
                raise ValueError(
                    f"field id {ids[i]} exceeds dictionary size {len(d)}"
                )
            _, out[d[ids[i]]] = _decode_at(mv, pos + offs[i], d, budget)
        return pos + offs[n] - off, out
    out = []
    for i in range(n):
        _, v = _decode_at(mv, pos + offs[i], d, budget)
        out.append(v)
    return pos + offs[n] - off, out


def _parse_directory(
    mv: memoryview, off: int, bt: int, hdr: int
) -> tuple[list[int], list[int], int]:
    """Shared object/array directory parse -> (field ids, n+1 offsets,
    values start). Bit layout per VariantEncoding.md (= Spark's reader):
    object header = offset_size-1 (bits 0-1) | id_size-1 (bits 2-3) |
    is_large (bit 4); array header = offset_size-1 (bits 0-1) |
    is_large (bit 2). NOTE: the reference swaps the object id/offset
    nibbles (types/variant_decode.go:258-261) — that diverges from the
    spec whenever id_size != offset_size; we follow the spec, pinned by
    the wide Spark cross-checks."""
    if bt == _BT_OBJECT:
        off_sz = (hdr & 0x03) + 1
        id_sz = ((hdr >> 2) & 0x03) + 1
        large = bool((hdr >> 4) & 1)
    else:
        id_sz = 0
        off_sz = (hdr & 0x03) + 1
        large = bool((hdr >> 2) & 1)
    pos = off + 1
    if large:
        if pos + 4 > len(mv):
            raise ValueError("not enough data for num_elements")
        n = _read_uint(mv, pos, 4)
        pos += 4
    else:
        if pos >= len(mv):
            raise ValueError("not enough data for num_elements")
        n = mv[pos]
        pos += 1
    ids: list[int] = []
    if bt == _BT_OBJECT:
        if pos + n * id_sz > len(mv):
            raise ValueError("not enough data for object field ids")
        ids = _read_uints(mv, pos, n, id_sz)
        pos += n * id_sz
    if pos + (n + 1) * off_sz > len(mv):
        raise ValueError("not enough data for element offsets")
    offs = _read_uints(mv, pos, n + 1, off_sz)
    pos += (n + 1) * off_sz
    return ids, offs, pos


_BULK_FMT = {2: "H", 4: "I"}


def _read_uints(mv: memoryview, pos: int, n: int, size: int) -> list[int]:
    """n little-endian uints in one C call (the per-value _read_uint loop
    dominated the shred profile at width-1/2/4; width 3 stays scalar)."""
    if size == 1:
        return list(mv[pos : pos + n])
    fmt = _BULK_FMT.get(size)
    if fmt is not None:
        return list(struct.unpack_from(f"<{n}{fmt}", mv, pos))
    return [_read_uint(mv, pos + i * size, size) for i in range(n)]


_P_FIXED = {
    _P_INT8: ("<b", 1), _P_INT16: ("<h", 2), _P_INT32: ("<i", 4),
    _P_INT64: ("<q", 8), _P_DOUBLE: ("<d", 8), _P_FLOAT: ("<f", 4),
}


def _decode_primitive(mv: memoryview, pos: int, pt: int):
    if pt == _P_NULL:
        return 1, None
    if pt == _P_TRUE:
        return 1, True
    if pt == _P_FALSE:
        return 1, False
    if pt in _P_FIXED:
        fmt, sz = _P_FIXED[pt]
        if pos + sz > len(mv):
            raise ValueError("not enough data for fixed primitive")
        return 1 + sz, struct.unpack_from(fmt, mv, pos)[0]
    if pt in (_P_STRING, _P_BINARY):
        if pos + 4 > len(mv):
            raise ValueError("not enough data for length")
        ln = _read_uint(mv, pos, 4)
        if pos + 4 + ln > len(mv):
            raise ValueError("length exceeds data")
        raw = bytes(mv[pos + 4 : pos + 4 + ln])
        return 5 + ln, raw.decode("utf-8") if pt == _P_STRING else raw
    if pt in (_P_DECIMAL4, _P_DECIMAL8):
        sz = 4 if pt == _P_DECIMAL4 else 8
        if pos + 1 + sz > len(mv):
            raise ValueError("not enough data for decimal")
        scale = mv[pos]
        unscaled = int.from_bytes(mv[pos + 1 : pos + 1 + sz], "little",
                                  signed=True)
        return 1 + sz + 1, _fmt_decimal(unscaled, scale)
    if pt == _P_DECIMAL16:
        if pos + 17 > len(mv):
            raise ValueError("not enough data for decimal16")
        scale = mv[pos]
        unscaled = int.from_bytes(mv[pos + 1 : pos + 17], "little",
                                  signed=True)
        return 18, _fmt_decimal(unscaled, scale)
    if pt == _P_DATE:
        if pos + 4 > len(mv):
            raise ValueError("not enough data for date")
        days = struct.unpack_from("<i", mv, pos)[0]
        import datetime

        try:
            d = datetime.date(1970, 1, 1) + datetime.timedelta(days=days)
        except OverflowError as e:
            raise ValueError(f"variant date out of range: {days}") from e
        return 5, d.isoformat()
    if pt in (_P_TS_MICRO, _P_TS_NTZ_MICRO, _P_TIME_NTZ, _P_TS_NANO,
              _P_TS_NTZ_NANO):
        if pos + 8 > len(mv):
            raise ValueError("not enough data for temporal primitive")
        v = struct.unpack_from("<q", mv, pos)[0]
        return 9, ("ts", pt, v)  # tagged; renderers live in logical.py
    if pt == _P_UUID:
        if pos + 16 > len(mv):
            raise ValueError("not enough data for UUID")
        b = bytes(mv[pos : pos + 16])
        return 17, (
            f"{b[:4].hex()}-{b[4:6].hex()}-{b[6:8].hex()}-"
            f"{b[8:10].hex()}-{b[10:].hex()}"
        )
    raise ValueError(f"unknown variant primitive type: {pt}")


def _fmt_decimal(unscaled: int, scale: int) -> str:
    """Reference formatDecimal (variant_decode.go:12-34): exact decimal
    string, trailing zeros trimmed."""
    if scale == 0:
        return str(unscaled)
    sign = "-" if unscaled < 0 else ""
    u = abs(unscaled)
    s = str(u).rjust(scale + 1, "0")
    out = f"{sign}{s[:-scale]}.{s[-scale:]}".rstrip("0").rstrip(".")
    return out or "0"


def decode_value(data: bytes, metadata: VariantMetadata | bytes):
    """Full variant value -> Python (dict/list/scalars); defensive
    bounds + op budget per the reference (variant_decode.go:36-56)."""
    if len(data) == 0:
        return None
    meta = (metadata if isinstance(metadata, VariantMetadata)
            else decode_metadata(metadata))
    budget = [min(max(len(data) * 16, 1024), 1_000_000)]
    _, v = _decode_at(memoryview(data), 0, meta.dictionary, budget)
    return v


# ------------------------------------------------------------------ encode

def _append_uint(buf: bytearray, v: int, size: int) -> None:
    buf += v.to_bytes(size, "little")


def encode_metadata(dictionary: list[str]) -> bytes:
    """Reference EncodeVariantMetadata (variant_encode.go:13-68):
    sorted_strings auto-detected; offset size 1/2/4 by total length."""
    if not dictionary:
        return _EMPTY_METADATA
    raw = [s.encode("utf-8") for s in dictionary]
    total = sum(len(b) for b in raw)
    # the size field and every offset share offset_size, so it must
    # cover the dictionary COUNT too (256 empty names still need 2 B)
    osz = _sizes(max(total, len(raw)))
    # offset_size_minus_one at bits 6-7 per the spec / Spark (the
    # reference writes bit 5, types/variant_encode.go:42 — divergent)
    header = 0x01 | ((osz - 1) << 6)
    if all(dictionary[i] <= dictionary[i + 1]
           for i in range(len(dictionary) - 1)):
        header |= 0x10
    out = bytearray([header])
    _append_uint(out, len(raw), osz)
    off = 0
    for b in raw:
        _append_uint(out, off, osz)
        off += len(b)
    _append_uint(out, off, osz)
    for b in raw:
        out += b
    return bytes(out)


def encode_metadata_sorted(names) -> tuple[bytes, dict[str, int]]:
    """Canonical metadata: sorted unique names -> (bytes, name->id)."""
    s = sorted(set(names))
    return encode_metadata(s), {n: i for i, n in enumerate(s)}


def _int_width(v: int) -> tuple[int, str, int]:
    if -(1 << 7) <= v < (1 << 7):
        return _P_INT8, "<b", 1
    if -(1 << 15) <= v < (1 << 15):
        return _P_INT16, "<h", 2
    if -(1 << 31) <= v < (1 << 31):
        return _P_INT32, "<i", 4
    if -(1 << 63) <= v < (1 << 63):
        return _P_INT64, "<q", 8
    raise ValueError(f"integer out of variant int64 range: {v}")


def encode_value(v, field_ids: dict[str, int] | None = None) -> bytes:
    """Python value -> variant value bytes (reference
    EncodeGoValueAsVariant, variant_go_encode.go:24-80, with minimal int
    widths). Objects need ``field_ids`` (name -> dictionary id); fields
    are emitted in id order (canonical per types/variant.go:33-35)."""
    if v is None:
        return bytes([_P_NULL << 2])
    if isinstance(v, bool):
        return bytes([(_P_TRUE if v else _P_FALSE) << 2])
    if isinstance(v, int):
        pt, fmt, _ = _int_width(v)
        return bytes([pt << 2]) + struct.pack(fmt, v)
    if isinstance(v, float):
        return bytes([_P_DOUBLE << 2]) + struct.pack("<d", v)
    if isinstance(v, str):
        raw = v.encode("utf-8")
        if len(raw) < 64:
            return bytes([_BT_SHORT_STR | (len(raw) << 2)]) + raw
        return (bytes([_BT_PRIMITIVE | (_P_STRING << 2)])
                + struct.pack("<I", len(raw)) + raw)
    if isinstance(v, (bytes, bytearray)):
        return (bytes([_BT_PRIMITIVE | (_P_BINARY << 2)])
                + struct.pack("<I", len(v)) + bytes(v))
    if isinstance(v, (list, tuple)):
        elems = [encode_value(e, field_ids) for e in v]
        return _encode_array(elems)
    if isinstance(v, dict):
        if field_ids is None:
            raise ValueError("encoding an object requires field_ids")
        try:
            items = sorted(((field_ids[k], k) for k in v))
        except KeyError as e:
            raise ValueError(f"object field {e} missing from metadata")
        ids = [i for i, _ in items]
        vals = [encode_value(v[k], field_ids) for _, k in items]
        return _encode_object(ids, vals)
    raise ValueError(f"cannot encode {type(v).__name__} as variant")


def _sizes(total: int) -> int:
    return 1 if total <= 255 else (2 if total <= 65535 else 4)


def _encode_object(ids: list[int], vals: list[bytes]) -> bytes:
    total = sum(len(b) for b in vals)
    id_sz = _sizes(max(ids)) if ids else 1
    off_sz = _sizes(total)
    large = len(ids) > 255
    # spec/Spark bit layout: offset_size-1 low, id_size-1 at bits 2-3
    # (the reference swaps these two, types/variant_encode.go:205)
    hdr = (off_sz - 1) | ((id_sz - 1) << 2) | (0x10 if large else 0)
    out = bytearray([_BT_OBJECT | (hdr << 2)])
    if large:
        out += struct.pack("<I", len(ids))
    else:
        out.append(len(ids))
    for i in ids:
        _append_uint(out, i, id_sz)
    off = 0
    for b in vals:
        _append_uint(out, off, off_sz)
        off += len(b)
    _append_uint(out, off, off_sz)
    for b in vals:
        out += b
    return bytes(out)


def _encode_array(elems: list[bytes]) -> bytes:
    total = sum(len(b) for b in elems)
    off_sz = _sizes(total)
    large = len(elems) > 255
    hdr = (off_sz - 1) | (0x04 if large else 0)
    out = bytearray([_BT_ARRAY | (hdr << 2)])
    if large:
        out += struct.pack("<I", len(elems))
    else:
        out.append(len(elems))
    off = 0
    for b in elems:
        _append_uint(out, off, off_sz)
        off += len(b)
    _append_uint(out, off, off_sz)
    for b in elems:
        out += b
    return bytes(out)


def _field_names(v, acc: set[str]) -> None:
    if isinstance(v, dict):
        for k, sub in v.items():
            acc.add(k)
            _field_names(sub, acc)
    elif isinstance(v, (list, tuple)):
        for e in v:
            _field_names(e, acc)


def encode_variant(v) -> tuple[bytes, bytes]:
    """Python value -> (metadata, value) pair with canonical sorted
    metadata (the write side of the reference's Variant struct)."""
    names: set[str] = set()
    _field_names(v, names)
    meta, ids = encode_metadata_sorted(names)
    return meta, encode_value(v, ids)


# --------------------------------------------------------------- shredding

SHRED_KINDS = (
    "int", "double", "string", "bool",
    # homogeneous arrays shred into list-typed chunks (the token-array
    # case: a variant field of token ids becomes list<int64> and rides
    # the list codec stack — rans/for_bitpack — instead of opaque bytes).
    # All-or-nothing per row: any non-conforming element keeps the whole
    # array in the residual (a legal writer choice per
    # VariantShredding.md — writers may decline to shred any value).
    "array<int>", "array<double>", "array<string>", "array<bool>",
)


def _split_object(data: bytes) -> tuple[list[int], list[bytes]] | None:
    """Parse ONLY the top-level object directory of a value and return
    (field ids, raw value slices) — field values (arbitrarily nested)
    are never decoded, just sliced. Returns None when the value is not
    an object. This keeps shredding O(top-level fields) per row instead
    of O(value tree)."""
    mv = memoryview(data)
    if not len(mv):
        return None
    vm = mv[0]
    if vm & 0x03 != _BT_OBJECT:
        return None
    ids, offs, pos = _parse_directory(mv, 0, _BT_OBJECT, vm >> 2)
    # object field OFFSETS are in directory (name-sorted) order while the
    # values region is laid out in whatever order the writer chose (Spark
    # keeps JSON insertion order), so a field's value ends at the NEXT
    # GREATER offset — not at offs[i+1]
    import bisect

    ordered = sorted(set(offs))
    end_region = offs[-1]
    slices = []
    for i in range(len(ids)):
        s = offs[i]
        j = bisect.bisect_right(ordered, s)
        e = ordered[j] if j < len(ordered) else end_region
        if s > e or pos + e > len(mv):
            raise ValueError("object field slice out of bounds")
        slices.append(bytes(mv[pos + s : pos + e]))
    return ids, slices


def _decode_scalar(data: bytes):
    """Decode one field slice only if it is a scalar the shredding
    schema could claim; nested/other values return a sentinel without
    being decoded."""
    if not data:
        raise ValueError("empty field value")
    bt = data[0] & 0x03
    if bt == _BT_SHORT_STR:
        ln = data[0] >> 2
        if 1 + ln > len(data):
            raise ValueError("short string length exceeds data")
        return bytes(data[1 : 1 + ln]).decode("utf-8")
    if bt != _BT_PRIMITIVE:
        return _NOT_SCALAR
    pt = data[0] >> 2
    if pt in (_P_TRUE, _P_FALSE):
        return pt == _P_TRUE
    if pt in _P_FIXED:
        fmt, sz = _P_FIXED[pt]
        if 1 + sz > len(data):
            raise ValueError("truncated primitive")
        return struct.unpack_from(fmt, data, 1)[0]
    if pt == _P_STRING:
        if len(data) < 5:
            raise ValueError("truncated string")
        ln = _read_uint(memoryview(data), 1, 4)
        if 5 + ln > len(data):
            raise ValueError("string length exceeds data")
        return bytes(data[5 : 5 + ln]).decode("utf-8")
    return _NOT_SCALAR


class _NotScalar:
    __slots__ = ()


_NOT_SCALAR = _NotScalar()

_INT_PRIM_WIDTH = {_P_INT8: 1, _P_INT16: 2, _P_INT32: 4, _P_INT64: 8}
_INT_NP_DTYPE = {1: "<i1", 2: "<i2", 4: "<i4", 8: "<i8"}


def _decode_array_field(data: bytes, elem_kind: str):
    """Field slice -> list of ``elem_kind`` scalars, or _NOT_SCALAR when
    the slice is not an array or any element doesn't conform. Int arrays
    take a vectorized numpy path (token arrays are the headline case):
    offsets come out of one frombuffer per width class, element payloads
    out of masked gathers — no per-element Python on conforming rows."""
    if not data or data[0] & 0x03 != _BT_ARRAY:
        return _NOT_SCALAR
    mv = memoryview(data)
    _, offs, pos = _parse_directory(mv, 0, _BT_ARRAY, mv[0] >> 2)
    n = len(offs) - 1
    if n == 0:
        return []
    if pos + offs[n] > len(mv):
        raise ValueError("array element slice out of bounds")
    if elem_kind == "int":
        if n < 256:
            # short arrays: a C-int loop beats numpy's per-call overhead
            # (~100us/row of fixed np setup dominated the shred profile
            # on 64-token arrays)
            data_b = bytes(mv[pos : pos + offs[n]])
            out_i = []
            widths = _INT_PRIM_WIDTH
            from_bytes = int.from_bytes
            for i in range(n):
                s, e = offs[i], offs[i + 1]
                h = data_b[s]
                w = widths.get(h >> 2) if (h & 0x03) == 0 else None
                if w is None or w != e - s - 1:
                    return _NOT_SCALAR
                out_i.append(from_bytes(data_b[s + 1 : e], "little",
                                        signed=True))
            return out_i
        import numpy as np

        starts = np.asarray(offs[:-1], dtype=np.int64) + pos
        widths = np.diff(np.asarray(offs, dtype=np.int64))
        buf = np.frombuffer(mv, dtype=np.uint8)
        heads = buf[starts]
        # every element must be a primitive int of width = size - 1
        prim_w = np.full(n, -1, dtype=np.int64)
        is_prim = (heads & 0x03) == 0
        pt = heads >> 2
        for p, w in _INT_PRIM_WIDTH.items():
            prim_w[is_prim & (pt == p)] = w
        if not np.array_equal(prim_w + 1, widths):
            return _NOT_SCALAR
        out = np.empty(n, dtype=np.int64)
        for w, dt in _INT_NP_DTYPE.items():
            m = prim_w == w
            if not m.any():
                continue
            s = starts[m] + 1
            idx = (s[:, None] + np.arange(w)).ravel()
            out[m] = np.frombuffer(
                buf[idx].tobytes(), dtype=dt
            ).astype(np.int64)
        return out.tolist()
    out = []
    for i in range(n):
        sl = bytes(mv[pos + offs[i] : pos + offs[i + 1]])
        sv = _decode_scalar(sl)
        if isinstance(sv, _NotScalar) or not _matches(sv, elem_kind):
            return _NOT_SCALAR
        out.append(sv)
    return out


def _matches(v, kind: str) -> bool:
    if kind == "int":
        return isinstance(v, int) and not isinstance(v, bool)
    if kind == "double":
        return isinstance(v, float)
    if kind == "string":
        return isinstance(v, str)
    if kind == "bool":
        return isinstance(v, bool)
    raise ValueError(f"unknown shred kind {kind!r}; one of {SHRED_KINDS}")


def _fields_tree(fields: dict[str, str]) -> dict[str, tuple]:
    """Dotted shred paths -> nested tree ``{head: (leaf_kind | None,
    subtree)}`` (the spec's recursive typed_value group shape). A path
    may not be both a leaf and a prefix of another path."""
    tree: dict[str, tuple] = {}
    for path, kind in fields.items():
        if kind not in SHRED_KINDS:
            raise ValueError(f"unknown shred kind {kind!r}")
        parts = path.split(".")
        node = tree
        for p in parts[:-1]:
            leaf, sub = node.setdefault(p, (None, {}))
            if leaf is not None:
                raise ValueError(
                    f"shred path {path!r} descends through leaf {p!r}"
                )
            node = sub
        last = parts[-1]
        if last in node and node[last][1]:
            raise ValueError(
                f"shred path {path!r} is a prefix of another shred path"
            )
        if last in node and node[last][0] is not None:
            raise ValueError(f"duplicate shred path {path!r}")
        node[last] = (kind, node.get(last, (None, {}))[1])
    return tree


def _extract_typed(sl: bytes, kind: str):
    if kind.startswith("array<"):
        return _decode_array_field(sl, kind[6:-1])
    sv = _decode_scalar(sl)
    if isinstance(sv, _NotScalar) or not _matches(sv, kind):
        return _NOT_SCALAR
    return sv


def _shred_value(
    val_b: bytes, tree: dict[str, tuple], d: list[str],
    prefix: str, got: dict[str, object],
) -> bytes:
    """Recursive raw-slice shred: returns the residual bytes for this
    (sub-)value and fills ``got[path]`` for every extracted leaf.
    Non-object values (or non-object inner fields) pass through
    verbatim; only the object DIRECTORIES on shred paths are parsed."""
    split = _split_object(val_b)
    if split is None:
        return val_b
    ids, slices = split
    by_name: dict[str, tuple[int, bytes]] = {}
    for fid, sl in zip(ids, slices):
        if fid >= len(d):
            raise ValueError(
                f"field id {fid} exceeds dictionary size {len(d)}"
            )
        by_name[d[fid]] = (fid, sl)
    for head, (leaf_kind, sub) in tree.items():
        hit = by_name.get(head)
        path = prefix + head
        if leaf_kind is not None:
            if hit is not None:
                sv = _extract_typed(hit[1], leaf_kind)
                if not isinstance(sv, _NotScalar):
                    got[path] = sv
                    del by_name[head]
        elif hit is not None:
            by_name[head] = (hit[0], _shred_value(
                hit[1], sub, d, path + ".", got
            ))
    # residual: remaining raw slices, fields in name order (canonical
    # when the dictionary is sorted, which Spark's writer emits)
    rest = sorted(by_name.items())
    return _encode_object(
        [fid for _, (fid, _) in rest], [sl for _, (_, sl) in rest]
    )


def shred_rows(
    metas: list[bytes | None],
    values: list[bytes | None],
    fields: dict[str, str],
) -> dict[str, list]:
    """Shred a variant column into typed columns + residual
    (VariantShredding.md; reference variant_reconstruct.go reads this
    layout back). Field paths may be dotted (``meta.lang``) — the
    spec's recursive object shredding. For each row:

    * object row, field present with the declared kind -> the TYPED
      column gets the value, the field leaves the residual object;
    * present with another type -> stays in the residual (typed null);
    * non-object row -> residual = the original value bytes verbatim.

    Returns ``{"metadata": [...], "value": [...],
    "typed_<f>": [...] per field}`` — residual ``value`` is None only
    for SQL-null input rows; an all-shredded object leaves an empty
    object residual so "object row" stays distinguishable from "null
    row" without the spec's group definition levels.

    Hot-path shape: only the object DIRECTORIES on shred paths are
    parsed and only candidate scalar/array fields are decoded — every
    other field value (arbitrarily nested) moves as a raw byte slice,
    so cost is O(shred paths) per row, not O(value tree)."""
    tree = _fields_tree(fields)
    out: dict[str, list] = {"metadata": [], "value": []}
    for f in fields:
        out[f"typed_{f}"] = []
    meta_cache: dict[bytes, list[str]] = {}
    for meta_b, val_b in zip(metas, values):
        out["metadata"].append(meta_b)
        if meta_b is None or val_b is None:
            out["value"].append(None)
            for f in fields:
                out[f"typed_{f}"].append(None)
            continue
        d = meta_cache.get(meta_b)
        if d is None:
            d = meta_cache[meta_b] = decode_metadata(meta_b).dictionary
        got: dict[str, object] = {}
        out["value"].append(_shred_value(val_b, tree, d, "", got))
        for f in fields:
            out[f"typed_{f}"].append(got.get(f))
    return out


def reconstruct_rows(
    metas: list[bytes | None],
    residuals: list[bytes | None],
    typed: dict[str, list],
) -> tuple[list[bytes | None], list[bytes | None]]:
    """Merge typed columns back into full variants (reference
    Reconstruct, variant_reconstruct.go:396-417): typed non-null wins.
    The original metadata passes through VERBATIM and residual field
    values move as raw slices — only the typed scalars are re-encoded
    (their int width may narrow, semantic equality unchanged, same
    caveat as the reference's re-encode). Returns (metadata, value)
    lists."""
    n = len(residuals)
    out_m: list[bytes | None] = []
    out_v: list[bytes | None] = []
    meta_cache: dict[bytes, VariantMetadata] = {}
    for i in range(n):
        res_b, meta_b = residuals[i], metas[i]
        t_here = {f: col[i] for f, col in typed.items() if col[i] is not None}
        if res_b is None and not t_here:
            out_m.append(None)
            out_v.append(None)
            continue
        if res_b is None:
            # fully-shredded object with no residual column (foreign
            # store): canonical re-encode is the only option
            m2, v2 = encode_variant(_nest_paths(t_here))
            out_m.append(m2)
            out_v.append(v2)
            continue
        if _split_object(res_b) is None:
            # non-object residual passes through byte-identical (typed
            # columns are all null for such rows by construction)
            out_m.append(meta_b)
            out_v.append(res_b)
            continue
        md = meta_cache.get(meta_b)
        if md is None:
            md = meta_cache[meta_b] = decode_metadata(meta_b or b"")
        out_m.append(meta_b)
        out_v.append(_merge_value(res_b, _nest_paths(t_here),
                                  md.dictionary, md.ids()))
    return out_m, out_v


def _nest_paths(t_here: dict[str, object]) -> dict:
    """{'meta.lang': v, 'n': w} -> {'meta': {'lang': v}, 'n': w}."""
    out: dict = {}
    for path, val in t_here.items():
        parts = path.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


def _merge_value(
    res_b: bytes, t_tree: dict, d: list[str], fid_of: dict[str, int]
) -> bytes:
    """Recursive raw-slice merge of typed values (possibly nested) into
    a residual object; inner slices not on a merge path move verbatim."""
    split = _split_object(res_b)
    if split is None:
        raise ValueError(
            "typed fields present under a non-object residual"
        )
    merged: list[tuple[str, int, bytes]] = []
    seen: set[str] = set()
    for fid, sl in zip(*split):
        if fid >= len(d):
            raise ValueError(
                f"field id {fid} exceeds dictionary size {len(d)}"
            )
        name = d[fid]
        sub = t_tree.get(name)
        if sub is not None and isinstance(sub, dict):
            sl = _merge_value(sl, sub, d, fid_of)
        elif sub is not None:
            raise ValueError(
                f"typed field {name!r} collides with a residual field"
            )
        seen.add(name)
        merged.append((name, fid, sl))
    for f, val in t_tree.items():
        if f in seen:
            continue
        if f not in fid_of:
            raise ValueError(
                f"typed field {f!r} missing from the row's metadata "
                "dictionary"
            )
        merged.append((
            f, fid_of[f],
            _merge_value(_encode_object([], []), val, d, fid_of)
            if isinstance(val, dict) else encode_value(val),
        ))
    merged.sort()
    return _encode_object(
        [fid for _, fid, _ in merged], [sl for _, _, sl in merged]
    )


# ---------------- real-parquet spec shredding (VariantShredding.md) ----
#
# The PGS store shreds into flat typed chunk columns (shred_rows above);
# REAL parquet files use the spec's recursive group layout instead:
#   optional group v (VARIANT) {
#     required binary metadata;
#     optional binary value;                  # top residual
#     optional group typed_value {            # present <=> object row
#       required group <field> {
#         optional binary value;              # per-FIELD residual
#         optional <typed> typed_value;
#       } ... }}
# (reference reads this back in marshal/variant_reconstruct.go:14-417).
# Scalar kinds only on this surface: the engine writer keeps lists
# under structs out of scope, and a declined array shred is a legal
# writer choice per the spec.

_SPEC_KINDS = ("int", "double", "string", "bool",
               "array<int>", "array<double>", "array<string>",
               "array<bool>")


def spec_struct_type(fields: dict[str, str]):
    """Shredding schema -> the arrow struct type of the spec layout."""
    import pyarrow as pa

    leaf_t = {"int": pa.int64(), "double": pa.float64(),
              "string": pa.string(), "bool": pa.bool_()}

    def group(tree: dict) -> "pa.DataType":
        kids = []
        for head, (leaf_kind, sub) in tree.items():
            if leaf_kind is None:
                tv = group(sub)
            elif leaf_kind.startswith("array<"):
                # spec shredded array: every element is itself a
                # {value, typed_value} shredding group
                et = leaf_t[leaf_kind[6:-1]]
                tv = pa.list_(pa.field("element", pa.struct([
                    pa.field("value", pa.binary(), True),
                    pa.field("typed_value", et, True),
                ]), False))
            else:
                tv = leaf_t[leaf_kind]
            kids.append(pa.field(head, pa.struct([
                pa.field("value", pa.binary(), True),
                pa.field("typed_value", tv, True),
            ]), False))                       # spec: field groups required
        return pa.struct(kids)

    for k in fields.values():
        if k not in _SPEC_KINDS:
            raise ValueError(
                f"spec shredding supports scalar kinds only, got {k!r}")
    tree = _fields_tree(fields)
    return pa.struct([
        pa.field("metadata", pa.binary(), False),
        pa.field("value", pa.binary(), True),
        pa.field("typed_value", group(tree), True),
    ])


def _shred_spec_node(val_b: bytes, tree: dict, d: list[str]):
    """One (sub-)value -> (residual_bytes | None, typed_group | None)
    per the spec: typed group non-null <=> this value is an object."""
    split = _split_object(val_b)
    if split is None:
        return val_b, None
    ids, slices = split
    by_name: dict[str, tuple[int, bytes]] = {}
    for fid, sl in zip(ids, slices):
        if fid >= len(d):
            raise ValueError(
                f"field id {fid} exceeds dictionary size {len(d)}")
        by_name[d[fid]] = (fid, sl)
    group: dict[str, dict] = {}
    for head, (leaf_kind, sub) in tree.items():
        hit = by_name.pop(head, None)
        fg = {"value": None, "typed_value": None}
        if hit is not None:
            if leaf_kind is not None and leaf_kind.startswith("array<"):
                elems = _split_array(hit[1])
                if elems is None:
                    fg["value"] = hit[1]      # not an array: residual
                else:
                    ek = leaf_kind[6:-1]
                    lst = []
                    for sl in elems:
                        sv = _extract_typed(sl, ek)
                        lst.append(
                            {"value": sl, "typed_value": None}
                            if isinstance(sv, _NotScalar)
                            else {"value": None, "typed_value": sv})
                    fg["typed_value"] = lst
            elif leaf_kind is not None:
                sv = _extract_typed(hit[1], leaf_kind)
                if isinstance(sv, _NotScalar):
                    fg["value"] = hit[1]      # per-field residual (spec)
                else:
                    fg["typed_value"] = sv
            else:
                fv, ftv = _shred_spec_node(hit[1], sub, d)
                fg["value"], fg["typed_value"] = fv, ftv
        group[head] = fg
    rest = sorted(by_name.items())
    residual = (_encode_object([fid for _, (fid, _) in rest],
                               [sl for _, (_, sl) in rest])
                if rest else None)            # spec: null when fully shredded
    return residual, group


def shred_spec_rows(metas, values, fields: dict[str, str]):
    """Variant rows -> python rows of the spec struct layout (feed
    ``pa.array(rows, spec_struct_type(fields))``). None input row ->
    None struct row (SQL null)."""
    tree = _fields_tree(fields)
    for k in fields.values():
        if k not in _SPEC_KINDS:
            raise ValueError(
                f"spec shredding supports scalar kinds only, got {k!r}")
    rows = []
    meta_cache: dict[bytes, list[str]] = {}
    for meta_b, val_b in zip(metas, values):
        if meta_b is None or val_b is None:
            rows.append(None)
            continue
        d = meta_cache.get(meta_b)
        if d is None:
            d = meta_cache[meta_b] = decode_metadata(meta_b).dictionary
        residual, group = _shred_spec_node(val_b, tree, d)
        rows.append({"metadata": meta_b, "value": residual,
                     "typed_value": group})
    return rows


def merge_spec_row(meta_b, value_b, typed_row, tree) -> object:
    """One spec-layout row -> python value tree (typed wins; residuals
    decode against the shared top metadata). ``typed_row`` is the
    typed_value group as a python dict (None when the row is not an
    object)."""
    if typed_row is None:
        return (decode_value(value_b, meta_b)
                if value_b is not None else None)
    obj = {} if value_b is None else decode_value(value_b, meta_b)
    if not isinstance(obj, dict):
        raise ValueError("spec residual under an object row must be "
                         "an object")
    for head, (leaf_kind, sub) in tree.items():
        fg = typed_row.get(head) or {}
        tv, fv = fg.get("typed_value"), fg.get("value")
        if leaf_kind is None:
            if tv is not None or fv is not None:
                obj[head] = merge_spec_row(meta_b, fv, tv, sub)
        elif tv is not None:
            if isinstance(tv, list) and (
                    not tv or (isinstance(tv[0], dict)
                               and "typed_value" in tv[0])):
                # shredded array: per-element {value, typed_value}
                obj[head] = [
                    e["typed_value"] if e.get("typed_value") is not None
                    else decode_value(e.get("value") or b"", meta_b)
                    for e in tv]
            else:
                obj[head] = tv
        elif fv is not None:
            obj[head] = decode_value(fv, meta_b)
    return obj


def merge_spec_rows(struct_rows, fields: dict[str, str]) -> list:
    """Spec-layout struct rows (python dicts with metadata/value/
    typed_value) -> python value trees."""
    tree = _fields_tree(fields)
    out = []
    for row in struct_rows:
        if row is None:
            out.append(None)
            continue
        out.append(merge_spec_row(row["metadata"], row.get("value"),
                                  row.get("typed_value"), tree))
    return out


def _split_array(data: bytes) -> list[bytes] | None:
    """Top-level array -> raw element slices (None when not an array);
    elements are never decoded here."""
    if not data or data[0] & 0x03 != _BT_ARRAY:
        return None
    mv = memoryview(data)
    _, offs, pos = _parse_directory(mv, 0, _BT_ARRAY, mv[0] >> 2)
    n = len(offs) - 1
    if n and pos + offs[n] > len(mv):
        raise ValueError("array element slice out of bounds")
    return [bytes(mv[pos + offs[i]: pos + offs[i + 1]])
            for i in range(n)]


def spec_tree_from_type(typed_value_type) -> dict:
    """Derive the shred tree from a decoded typed_value arrow struct
    type (reading a foreign writer's shredded file needs no declared
    schema — the footer carries it)."""
    import pyarrow as pa

    tree: dict[str, tuple] = {}
    for f in typed_value_type:
        tv = f.type.field("typed_value").type
        if pa.types.is_struct(tv):
            tree[f.name] = (None, spec_tree_from_type(tv))
        else:
            tree[f.name] = ("leaf", {})
    return tree
