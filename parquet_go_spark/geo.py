"""Geospatial WKB support: point codec, bounding-box statistics, and the
GEOMETRY/GEOGRAPHY logical annotations.

The reference ships a geospatial type layer (types/geospatial.go,
types/geometry.go, types/geography.go) whose write-side job is
(a) carrying WKB bytes through the BYTE_ARRAY column unchanged and
(b) folding per-value coordinate bounds into chunk-level
GeospatialStatistics: a bounding box plus the set of WKB geometry type
codes seen (reference BoundingBoxCalculator.AddWKB,
types/geospatial.go:107-330; stats fold internal/layout/chunk.go:219-265).

Here the WKB column is an ordinary LT_BINARY chunk (full codec menu); this
module adds the metadata math:

  * ``wkb_points`` / ``parse_points`` — vectorized numpy build/parse of
    little-endian WKB Points (the uniform fast path: one reshape, no
    per-row Python).
  * ``geo_stats`` — bbox + type codes for a WKB column. Uniform 21-byte
    point columns take the vectorized path; mixed geometries fall back to
    a per-geometry walker over Point / LineString / Polygon / MultiPoint /
    MultiLineString / MultiPolygon / GeometryCollection in either byte
    order — the same shapes the reference's AddWKB handles. The walker is
    metadata-path only (runs once per chunk at encode time, like the
    reference's per-value AddWKB), never on the decode hot path.
  * annotation constants for GEOMETRY (planar, crs) and GEOGRAPHY
    (crs + edge algorithm) recorded in the store's layout metadata.

Coordinates are XY; Z/M variants (type code + 1000/2000/3000) contribute
their XY prefix per point, matching the reference's 2-D bbox.
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pyarrow as pa

# WKB geometry type codes (OGC 06-103r4)
POINT, LINESTRING, POLYGON = 1, 2, 3
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, COLLECTION = 4, 5, 6, 7

# annotation defaults — parquet-format LogicalTypes.md geospatial defaults,
# mirrored by the reference's Geometry/Geography types
DEFAULT_CRS = "OGC:CRS84"
EDGES_PLANAR = "planar"       # GEOMETRY
EDGES_SPHERICAL = "spherical" # GEOGRAPHY default algorithm

_POINT_LE_HDR = b"\x01" + struct.pack("<I", POINT)
POINT_WKB_LEN = 21  # 1 byteorder + 4 type + 2*8 coords


# ------------------------------------------------------------ point codec

def wkb_points(x: np.ndarray, y: np.ndarray) -> pa.Array:
    """Vectorized (x, y) float64 -> little-endian WKB Point binary array."""
    n = len(x)
    out = np.empty((n, POINT_WKB_LEN), dtype=np.uint8)
    out[:, :5] = np.frombuffer(_POINT_LE_HDR, dtype=np.uint8)
    out[:, 5:13] = np.asarray(x, dtype="<f8").reshape(n, 1).view(np.uint8)
    out[:, 13:21] = np.asarray(y, dtype="<f8").reshape(n, 1).view(np.uint8)
    flat = out.reshape(-1)
    offsets = np.arange(0, (n + 1) * POINT_WKB_LEN, POINT_WKB_LEN,
                        dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(flat.tobytes())],
    )


def parse_points(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """WKB Point binary array -> (x, y) float64 arrays. Vectorized: one
    reshape over the packed 21-byte records. Raises on anything that is
    not a uniform little-endian 2-D point column."""
    arr = _dense(arr)
    data, offsets = _buffers(arr)
    lens = np.diff(offsets)
    if not np.all(lens == POINT_WKB_LEN):
        raise ValueError("parse_points: non-point or mixed-size WKB values")
    n = len(arr)
    recs = np.frombuffer(data, dtype=np.uint8)[
        offsets[0] : offsets[0] + n * POINT_WKB_LEN
    ].reshape(n, POINT_WKB_LEN)
    if not (np.all(recs[:, 0] == 1)
            and np.all(recs[:, 1:5].view("<u4").reshape(-1) == POINT)):
        raise ValueError("parse_points: not little-endian WKB points")
    x = recs[:, 5:13].copy().view("<f8").reshape(-1)
    y = recs[:, 13:21].copy().view("<f8").reshape(-1)
    return x, y


def _dense(arr: pa.Array) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.drop_null()
    return arr


def _buffers(arr: pa.Array) -> tuple[bytes, np.ndarray]:
    bufs = arr.buffers()
    off_dt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offsets = np.frombuffer(bufs[1], dtype=off_dt)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = bufs[2] if bufs[2] is not None else b""
    return data, offsets


# ------------------------------------------------------------ bbox stats

class _BBox:
    __slots__ = ("xmin", "ymin", "xmax", "ymax", "types", "ok")

    def __init__(self):
        self.xmin = self.ymin = np.inf
        self.xmax = self.ymax = -np.inf
        self.types: set[int] = set()
        self.ok = False

    def add_coords(self, xy: np.ndarray) -> None:
        if xy.size == 0:
            return
        self.xmin = min(self.xmin, float(xy[0::2].min()))
        self.xmax = max(self.xmax, float(xy[0::2].max()))
        self.ymin = min(self.ymin, float(xy[1::2].min()))
        self.ymax = max(self.ymax, float(xy[1::2].max()))
        self.ok = True


def _coords(mv: memoryview, off: int, npts: int, be: bool,
            dims: int) -> tuple[np.ndarray, int]:
    nb = npts * dims * 8
    raw = np.frombuffer(mv, dtype=">f8" if be else "<f8",
                        count=npts * dims, offset=off)
    if dims == 2:
        xy = raw
    else:  # strip Z/M: keep the XY prefix of each point
        xy = raw.reshape(npts, dims)[:, :2].reshape(-1)
    return np.asarray(xy, dtype=np.float64), off + nb


def _u32(mv: memoryview, off: int, be: bool) -> int:
    return struct.unpack_from(">I" if be else "<I", mv, off)[0]


def _walk(mv: memoryview, off: int, box: _BBox) -> int:
    """One geometry at ``off``; returns the offset past it. Mirrors the
    reference's AddWKB dispatch (types/geospatial.go:264-330) including
    nested collections and Z/M dimension stripping."""
    be = mv[off] == 0
    raw_type = _u32(mv, off + 1, be)
    base = raw_type % 1000
    # ISO dimension offsets: +1000 = Z, +2000 = M (3 coords), +3000 = ZM (4)
    if raw_type < 1000:
        dims = 2
    elif raw_type < 3000:
        dims = 3
    else:
        dims = 4
    box.types.add(base)
    off += 5
    if base == POINT:
        xy, off = _coords(mv, off, 1, be, dims)
        box.add_coords(xy)
    elif base == LINESTRING:
        npts = _u32(mv, off, be)
        xy, off = _coords(mv, off + 4, npts, be, dims)
        box.add_coords(xy)
    elif base == POLYGON:
        nrings = _u32(mv, off, be)
        off += 4
        for _ in range(nrings):
            npts = _u32(mv, off, be)
            xy, off = _coords(mv, off + 4, npts, be, dims)
            box.add_coords(xy)
    elif base in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, COLLECTION):
        nparts = _u32(mv, off, be)
        off += 4
        for _ in range(nparts):
            off = _walk(mv, off, box)
    else:
        raise ValueError(f"unsupported WKB geometry type {raw_type}")
    return off


def geo_stats(arr: pa.Array) -> dict | None:
    """Chunk-level GeospatialStatistics for a WKB binary column:
    ``{"bbox": [xmin, ymin, xmax, ymax], "types": [codes...]}`` or None
    for an all-null / empty chunk. Malformed WKB raises (the write side
    owns its data; the read side never trusts these stats for anything
    but pruning, and pruning is validated against decoded values)."""
    arr = _dense(arr)
    if len(arr) == 0:
        return None
    data, offsets = _buffers(arr)
    lens = np.diff(offsets)
    box = _BBox()
    if np.all(lens == POINT_WKB_LEN):
        n = len(arr)
        recs = np.frombuffer(data, dtype=np.uint8)[
            offsets[0] : offsets[0] + n * POINT_WKB_LEN
        ].reshape(n, POINT_WKB_LEN)
        if np.all(recs[:, 0] == 1) and np.all(
            recs[:, 1:5].view("<u4").reshape(-1) == POINT
        ):
            # vectorized uniform-point fast path
            x = recs[:, 5:13].copy().view("<f8")
            y = recs[:, 13:21].copy().view("<f8")
            box.types.add(POINT)
            box.xmin, box.xmax = float(x.min()), float(x.max())
            box.ymin, box.ymax = float(y.min()), float(y.max())
            box.ok = True
            return _stats_dict(box)
    mv = memoryview(bytes(data))
    for s, e in zip(offsets[:-1], offsets[1:]):
        if e > s:
            _walk(mv, int(s), box)
    return _stats_dict(box) if box.ok or box.types else None


def _stats_dict(box: _BBox) -> dict:
    d: dict = {"types": sorted(box.types)}
    if box.ok:
        d["bbox"] = [box.xmin, box.ymin, box.xmax, box.ymax]
    return d


def geo_stats_json(arr: pa.Array) -> str | None:
    s = geo_stats(arr)
    return None if s is None else json.dumps(s, separators=(",", ":"))


def bbox_intersects(stats_json: str | None,
                    window: tuple[float, float, float, float]) -> bool:
    """Manifest-side test: does the chunk's bbox intersect the query
    window? Chunks with no/invalid bbox are kept (no false negatives —
    the reference ignores invalid stats rather than pruning on them,
    reader/index.go:65-87)."""
    if not stats_json:
        return True
    try:
        bbox = json.loads(stats_json).get("bbox")
    except (ValueError, AttributeError):
        return True
    if not bbox or len(bbox) != 4:
        return True
    xmin, ymin, xmax, ymax = bbox
    wxmin, wymin, wxmax, wymax = window
    return not (xmax < wxmin or xmin > wxmax or ymax < wymin or ymin > wymax)


# ------------------------------------------------- GeoJSON logical surface

MAX_COORD_PRECISION = 12  # reference types/geospatial.go:308


def round_coord(v: float, precision: int) -> float:
    """Reference roundCoordinate (types/geospatial_wkb.go:12-21):
    precision < 0 leaves the value alone, >12 is capped; Go math.Round is
    half-away-from-zero, so we avoid numpy's half-even round."""
    if precision < 0:
        return v
    if precision > MAX_COORD_PRECISION:
        precision = MAX_COORD_PRECISION
    import math

    if not math.isfinite(v):
        return v  # Go: inf*pow/pow = inf, NaN stays NaN
    pow10 = 10.0 ** precision
    scaled = abs(v) * pow10
    if not math.isfinite(scaled):
        # |v| * 10^p overflowed double range (v near 1e308). Deliberate
        # divergence: Go's Round(v*pow)/pow yields +/-inf here, which its
        # JSON marshaller then rejects; keeping the (finite) coordinate
        # unchanged loses nothing — rounding at <= 12 decimals cannot
        # alter a double this large.
        return v
    return math.copysign(math.floor(scaled + 0.5), v) / pow10


def _gj_coords(mv, off: int, npts: int, be: bool, dims: int,
               precision: int) -> tuple[list[list[float]], int]:
    xy, off = _coords(mv, off, npts, be, dims)
    pts = xy.reshape(npts, 2)
    return (
        [[round_coord(float(p[0]), precision),
          round_coord(float(p[1]), precision)] for p in pts],
        off,
    )


def _gj_walk(mv, off: int, precision: int) -> tuple[dict, int]:
    """One geometry -> (GeoJSON dict, offset past it). Mirrors the
    reference's wkbToGeoJSON dispatch (types/geospatial_wkb.go:145-188)
    over all seven kinds with per-sub-geometry byte order; unlike the
    reference we honour Z/M dimension codes by keeping the XY prefix
    (the reference assumes 2-D input there; its bbox walker strips
    dims the way we do)."""
    be = mv[off] == 0
    raw_type = _u32(mv, off + 1, be)
    base = raw_type % 1000
    dims = 2 if raw_type < 1000 else (3 if raw_type < 3000 else 4)
    off += 5
    if base == POINT:
        pts, off = _gj_coords(mv, off, 1, be, dims, precision)
        return {"type": "Point", "coordinates": pts[0]}, off
    if base == LINESTRING:
        npts = _u32(mv, off, be)
        pts, off = _gj_coords(mv, off + 4, npts, be, dims, precision)
        return {"type": "LineString", "coordinates": pts}, off
    if base == POLYGON:
        nrings = _u32(mv, off, be)
        off += 4
        rings = []
        for _ in range(nrings):
            npts = _u32(mv, off, be)
            pts, off = _gj_coords(mv, off + 4, npts, be, dims, precision)
            rings.append(pts)
        return {"type": "Polygon", "coordinates": rings}, off
    if base in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, COLLECTION):
        nparts = _u32(mv, off, be)
        off += 4
        subs = []
        for _ in range(nparts):
            gj, off = _gj_walk(mv, off, precision)
            subs.append(gj)
        if base == COLLECTION:
            return {"type": "GeometryCollection", "geometries": subs}, off
        kind, inner = {
            MULTIPOINT: ("MultiPoint", "Point"),
            MULTILINESTRING: ("MultiLineString", "LineString"),
            MULTIPOLYGON: ("MultiPolygon", "Polygon"),
        }[base]
        # readSubGeomHeader's expected-type check (geospatial_wkb.go:28-41)
        for gj in subs:
            if gj["type"] != inner:
                raise ValueError(
                    f"{kind} sub-geometry is {gj['type']}, expected {inner}"
                )
        return (
            {"type": kind, "coordinates": [g["coordinates"] for g in subs]},
            off,
        )
    raise ValueError(f"unsupported WKB geometry type {raw_type}")


def wkb_to_geojson(b: bytes, precision: int = 6) -> dict | None:
    """Reference wkbToGeoJSON (types/geospatial_wkb.go:145-188): WKB ->
    GeoJSON geometry dict, or None when the bytes are not convertible
    (the reference returns ok=false and the caller falls back to a
    wkb_hex wrapper).  Converter boundary, per-value like the
    reference's — not a decode hot-path kernel."""
    if len(b) < 5:
        return None
    try:
        gj, off = _gj_walk(memoryview(b), 0, precision)
    except (ValueError, struct.error, IndexError):
        return None
    return gj if off <= len(b) else None


def convert_geospatial_value(
    b: bytes | None,
    *,
    crs: str = DEFAULT_CRS,
    algorithm: str = EDGES_SPHERICAL,
    mode: str = "geojson",
    precision: int = 6,
    as_feature: bool = False,
    hybrid_b64: bool = False,
) -> dict | None:
    """Reference ConvertGeographyLogicalValue / ConvertGeometryLogicalValue
    (types/geography.go:11-66, types/geometry.go:11): render a WKB value
    as geojson / base64 / hybrid, annotated with crs + algorithm; a WKB
    blob GeoJSON can't express falls back to the wkb_hex wrapper."""
    if b is None:
        return None
    import base64 as b64mod

    meta = {"crs": crs, "algorithm": algorithm}
    if mode == "base64":
        return {"wkb_b64": b64mod.b64encode(b).decode(), **meta}
    gj = wkb_to_geojson(b, precision)
    if gj is None:
        return {"wkb_hex": b.hex(), **meta}
    if mode == "hybrid":
        wrapped = {"geojson": gj}
        if hybrid_b64:
            wrapped["wkb_b64"] = b64mod.b64encode(b).decode()
        else:
            wrapped["wkb_hex"] = b.hex()
        return {**wrapped, **meta}
    if as_feature:
        return {"type": "Feature", "geometry": gj, "properties": meta}
    return gj


def bbox_mask(arr: pa.Array, xmin: float, ymin: float,
              xmax: float, ymax: float) -> np.ndarray:
    """Exact per-row window test for a WKB column: True where the
    geometry's own bbox intersects [xmin,xmax]x[ymin,ymax]; nulls are
    False. Vectorized lane for the uniform 21-byte point shape (the
    hot case); general WKB walks per value (conversion-path posture,
    same as the reference's bbox fold)."""
    n = len(arr)
    out = np.zeros(n, bool)
    if n == 0:
        return out
    valid = (np.asarray(arr.is_valid()) if arr.null_count
             else np.ones(n, bool))
    try:
        x, y = parse_points(arr)       # dense (nulls dropped)
        hit = (x >= xmin) & (x <= xmax) & (y >= ymin) & (y <= ymax)
        out[valid] = hit
        return out
    except Exception:
        pass
    for i in np.flatnonzero(valid):
        v = arr[int(i)].as_py()
        box = _BBox()
        try:
            _walk(memoryview(v), 0, box)
        except Exception:
            out[i] = True          # undecodable: keep (no false drops)
            continue
        if not box.ok:
            continue
        out[i] = not (box.xmax < xmin or box.xmin > xmax
                      or box.ymax < ymin or box.ymin > ymax)
    return out


def render_json(arr: pa.Array, mode: str = "geojson",
                precision: int = 6, feature: bool = False,
                hybrid_raw_base64: bool = False) -> pa.Array:
    """WKB column -> JSON-friendly strings (the reference's
    marshal.ConvertToJSONFriendly geospatial modes,
    types/geospatial.go):

    * ``hex``     — WKB as uppercase hex (the reference's GEOMETRY
                    default)
    * ``base64``  — WKB as base64
    * ``geojson`` — RFC 7946 geometry objects (GEOGRAPHY default);
                    ``feature=True`` wraps each in a Feature;
                    unconvertible WKB falls back to a {"wkb_hex": ...}
                    wrapper like the reference
    * ``hybrid``  — GeoJSON plus the raw WKB (hex, or base64 with
                    ``hybrid_raw_base64=True``)

    Converter boundary (per-value walk, same posture as the
    reference); nulls stay null."""
    import base64
    import json

    if mode not in ("hex", "base64", "geojson", "hybrid"):
        raise ValueError(f"unknown geospatial JSON mode {mode!r}")
    out = []
    for v in arr.to_pylist():
        if v is None:
            out.append(None)
            continue
        b = bytes(v)
        if mode == "hex":
            out.append(b.hex().upper())
            continue
        if mode == "base64":
            out.append(base64.b64encode(b).decode())
            continue
        gj = wkb_to_geojson(b, precision)
        if gj is None:
            gj = {"wkb_hex": b.hex().upper()}
        elif feature:
            gj = {"type": "Feature", "geometry": gj,
                  "properties": {}}
        if mode == "hybrid":
            gj = dict(gj)
            if hybrid_raw_base64:
                gj["wkb_base64"] = base64.b64encode(b).decode()
            else:
                gj["wkb_hex"] = b.hex().upper()
        out.append(json.dumps(gj, separators=(",", ":")))
    return pa.array(out, pa.string())
