"""Geospatial WKB support: point codec, bbox statistics (the reference's
BoundingBoxCalculator.AddWKB, types/geospatial.go:107-330), manifest
GeospatialStatistics, and bbox pruning end-to-end."""

from __future__ import annotations

import json
import struct

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_spark import chunk, geo


def _wkb(be: bool, type_code: int, payload: bytes) -> bytes:
    fmt = ">I" if be else "<I"
    return (b"\x00" if be else b"\x01") + struct.pack(fmt, type_code) + payload


def _pt(x, y, be=False):
    fmt = ">2d" if be else "<2d"
    return _wkb(be, geo.POINT, struct.pack(fmt, x, y))


def _ls(coords, be=False):
    fmt_i = ">I" if be else "<I"
    fmt_d = ">d" if be else "<d"
    body = struct.pack(fmt_i, len(coords)) + b"".join(
        struct.pack(fmt_d, v) for xy in coords for v in xy
    )
    return _wkb(be, geo.LINESTRING, body)


def test_point_build_parse_roundtrip():
    x = np.array([-179.5, 0.0, 12.25, 180.0])
    y = np.array([-90.0, 0.5, -33.75, 90.0])
    arr = geo.wkb_points(x, y)
    assert arr.type == pa.binary()
    # byte-level check against struct packing
    assert arr[0].as_py() == _pt(-179.5, -90.0)
    px, py = geo.parse_points(arr)
    np.testing.assert_array_equal(px, x)
    np.testing.assert_array_equal(py, y)


def test_point_fast_path_bbox():
    x = np.array([3.0, -7.5, 11.0])
    y = np.array([1.0, 9.0, -2.0])
    s = geo.geo_stats(geo.wkb_points(x, y))
    assert s["bbox"] == [-7.5, -2.0, 11.0, 9.0]
    assert s["types"] == [geo.POINT]


def test_walker_matches_fast_path_on_points():
    x = np.array([5.0, -1.0])
    y = np.array([2.0, 8.0])
    pts = geo.wkb_points(x, y)
    fast = geo.geo_stats(pts)
    # force the generic walker by appending a linestring
    mixed = pa.array(list(pts.to_pylist()) + [_ls([(5.0, 2.0), (-1.0, 8.0)])],
                     pa.binary())
    walked = geo.geo_stats(mixed)
    assert walked["bbox"] == fast["bbox"]
    assert walked["types"] == [geo.POINT, geo.LINESTRING]


def test_big_endian_and_mixed_geometries():
    vals = [
        _pt(10.0, 20.0, be=True),
        _ls([(-5.0, 1.0), (3.0, 40.0)], be=False),
    ]
    s = geo.geo_stats(pa.array(vals, pa.binary()))
    assert s["bbox"] == [-5.0, 1.0, 10.0, 40.0]
    assert set(s["types"]) == {geo.POINT, geo.LINESTRING}


def test_polygon_multi_and_collection():
    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)]
    poly = _wkb(False, geo.POLYGON,
                struct.pack("<I", 1) + struct.pack("<I", len(ring))
                + b"".join(struct.pack("<2d", *xy) for xy in ring))
    mp = _wkb(False, geo.MULTIPOINT,
              struct.pack("<I", 2) + _pt(-9.0, 2.0) + _pt(1.0, 7.0))
    coll = _wkb(False, geo.COLLECTION, struct.pack("<I", 1) + _pt(99.0, -3.0))
    s = geo.geo_stats(pa.array([poly, mp, coll], pa.binary()))
    assert s["bbox"] == [-9.0, -3.0, 99.0, 7.0]
    assert set(s["types"]) == {geo.POLYGON, geo.MULTIPOINT, geo.POINT,
                               geo.COLLECTION}


def test_zm_dimension_stripping():
    # POINT Z (code 1001): 3 doubles; bbox keeps the XY prefix
    pz = _wkb(False, 1001, struct.pack("<3d", 7.0, 8.0, 99.0))
    # POINT ZM (code 3001): 4 doubles
    pzm = _wkb(False, 3001, struct.pack("<4d", -7.0, -8.0, 1.0, 2.0))
    s = geo.geo_stats(pa.array([pz, pzm], pa.binary()))
    assert s["bbox"] == [-7.0, -8.0, 7.0, 8.0]
    assert s["types"] == [geo.POINT]


def test_unsupported_type_raises():
    bad = _wkb(False, 42, b"")
    with pytest.raises(ValueError):
        geo.geo_stats(pa.array([bad], pa.binary()))


def test_bbox_intersects_defenses():
    win = (0.0, 0.0, 10.0, 10.0)
    hit = json.dumps({"bbox": [5.0, 5.0, 20.0, 20.0], "types": [1]})
    miss = json.dumps({"bbox": [11.0, 11.0, 20.0, 20.0], "types": [1]})
    assert geo.bbox_intersects(hit, win)
    assert not geo.bbox_intersects(miss, win)
    # invalid / absent stats are kept — never a false negative
    assert geo.bbox_intersects(None, win)
    assert geo.bbox_intersects("", win)
    assert geo.bbox_intersects("not json", win)
    assert geo.bbox_intersects(json.dumps({"types": [1]}), win)
    assert geo.bbox_intersects(json.dumps({"bbox": [1.0]}), win)


def test_wkb_column_through_codec_stack():
    """WKB is an ordinary LT_BINARY chunk: encode -> decode bit-identity."""
    x = np.linspace(-170.0, 170.0, 500)
    y = np.linspace(-80.0, 80.0, 500)
    arr = geo.wkb_points(x, y)
    blob, stats = chunk.encode_chunk(arr, codec="auto", compression="zstd")
    out = chunk.decode_chunk(blob)
    assert out.cast(pa.binary()).equals(arr)
    px, py = geo.parse_points(out)
    np.testing.assert_array_equal(px, x)
    np.testing.assert_array_equal(py, y)


def test_size_stats_shapes():
    assert chunk.size_stats_of(pa.array(["ab", "cde", None])) == {
        "def_hist": [1, 2], "rep_hist": [3], "unencoded_ba_bytes": 5,
    }
    assert chunk.size_stats_of(pa.array([[1, 2], [], None, [3]])) == {
        "def_hist": [1, 1, 3], "rep_hist": [3, 1],
    }
    assert chunk.size_stats_of(pa.array([["ab"], None, ["c", "d"]])) == {
        "def_hist": [1, 0, 3], "rep_hist": [2, 1], "unencoded_ba_bytes": 4,
    }
    assert chunk.size_stats_of(pa.array([1, 2, None])) == {
        "def_hist": [1, 2], "rep_hist": [3],
    }


def test_geo_pruning_end_to_end(spark, tmp_out):
    """bbox pruning actually skips partitions and the result is exact."""
    import pandas as pd
    from pyspark.sql import functions as F

    from parquet_go_spark.operators import pruned

    n = 2000
    ids = np.arange(n)
    xs = (ids % 360 - 180 + 0.5).astype(np.float64)
    ys = (ids % 180 - 90 + 0.25).astype(np.float64)
    pdf = pd.DataFrame({"id": ids.astype(np.int32), "x": xs, "y": ys})
    df = spark.createDataFrame(pdf)

    def to_wkb(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [b.column("id"),
                 geo.wkb_points(b.column("x").to_numpy(zero_copy_only=False),
                                b.column("y").to_numpy(zero_copy_only=False))],
                names=["id", "geom"],
            )

    pts = df.mapInArrow(to_wkb, "id int, geom binary").withColumn(
        "xkey", (F.col("id") % 360).cast("double")
    )
    store = pruned.encode_generic(
        spark, pts, tmp_out, key_col="xkey", clustering="range",
        num_parts=10,
        geo_cols={"geom": {"type": "geometry", "crs": geo.DEFAULT_CRS,
                           "edges": geo.EDGES_PLANAR}},
    )
    # annotation is recorded in the store layout metadata
    assert store.meta()["geo_cols"]["geom"]["crs"] == geo.DEFAULT_CRS
    # manifest rows carry GeospatialStatistics for the geo column only
    man = store.manifest(spark).toPandas()
    grows = man[man["col"] == "geom"]
    assert grows["geo"].notna().all()
    assert man[man["col"] == "id"]["geo"].isna().all()
    assert man["size_stats"].notna().all()

    window = (-30.0, -20.0, 40.0, 50.0)
    cand = pruned.geo_candidates(spark, store, "geom", window)
    all_parts = sorted(grows["part_id"])
    assert 0 < len(cand) < len(all_parts)  # pruning really happened

    dec = pruned._decode_parts(
        spark, store, cand, ["id", "geom"], "id int, geom binary"
    ).toPandas()
    got_ids = []
    for _, r in dec.iterrows():
        px, py = geo.parse_points(pa.array([r["geom"]], pa.binary()))
        if (window[0] <= px[0] <= window[2]
                and window[1] <= py[0] <= window[3]):
            got_ids.append(r["id"])
    want = {
        int(i) for i in ids
        if window[0] <= xs[i] <= window[2] and window[1] <= ys[i] <= window[3]
    }
    assert set(got_ids) == want


# ------------------------------------------------- GeoJSON converter

def test_geojson_all_kinds():
    # point / linestring / polygon (types/geospatial_wkb.go:145-176)
    assert geo.wkb_to_geojson(_pt(1.5, -2.25)) == {
        "type": "Point", "coordinates": [1.5, -2.25]}
    assert geo.wkb_to_geojson(_ls([(0.0, 0.0), (3.0, 4.0)])) == {
        "type": "LineString", "coordinates": [[0.0, 0.0], [3.0, 4.0]]}
    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)]
    poly = _wkb(False, geo.POLYGON,
                struct.pack("<I", 1) + struct.pack("<I", len(ring))
                + b"".join(struct.pack("<2d", *xy) for xy in ring))
    assert geo.wkb_to_geojson(poly) == {
        "type": "Polygon",
        "coordinates": [[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 0.0]]]}
    # multi* collapse to coordinate arrays; collection nests geometries
    mp = _wkb(False, geo.MULTIPOINT,
              struct.pack("<I", 2) + _pt(-9.0, 2.0) + _pt(1.0, 7.0))
    assert geo.wkb_to_geojson(mp) == {
        "type": "MultiPoint", "coordinates": [[-9.0, 2.0], [1.0, 7.0]]}
    mls = _wkb(False, geo.MULTILINESTRING,
               struct.pack("<I", 1) + _ls([(1.0, 1.0), (2.0, 2.0)]))
    assert geo.wkb_to_geojson(mls) == {
        "type": "MultiLineString", "coordinates": [[[1.0, 1.0], [2.0, 2.0]]]}
    mpoly = _wkb(False, geo.MULTIPOLYGON, struct.pack("<I", 1) + poly)
    assert geo.wkb_to_geojson(mpoly) == {
        "type": "MultiPolygon",
        "coordinates": [[[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 0.0]]]]}
    coll = _wkb(False, geo.COLLECTION,
                struct.pack("<I", 2) + _pt(9.0, -3.0)
                + _ls([(0.0, 0.0), (1.0, 1.0)]))
    assert geo.wkb_to_geojson(coll) == {
        "type": "GeometryCollection",
        "geometries": [
            {"type": "Point", "coordinates": [9.0, -3.0]},
            {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0]]},
        ]}


def test_geojson_endianness_dims_and_precision():
    # big-endian and Z/M variants parse; coordinates round half-away-
    # from-zero at the requested precision (roundCoordinate semantics)
    assert geo.wkb_to_geojson(_pt(1.23456789, -2.0, be=True)) == {
        "type": "Point", "coordinates": [1.234568, -2.0]}
    pz = _wkb(False, 1001, struct.pack("<3d", 7.0, 8.0, 99.0))
    assert geo.wkb_to_geojson(pz) == {"type": "Point",
                                      "coordinates": [7.0, 8.0]}
    assert geo.round_coord(0.0000005, 6) == 0.000001   # half away from zero
    assert geo.round_coord(-0.0000005, 6) == -0.000001
    assert geo.round_coord(1.23456789, -1) == 1.23456789
    assert geo.round_coord(1.5e-12, 99) == 2e-12       # capped at 12


def test_geojson_rejects_malformed():
    assert geo.wkb_to_geojson(b"\x01\x01") is None          # short header
    assert geo.wkb_to_geojson(_wkb(False, 42, b"")) is None  # unknown kind
    truncated = _pt(1.0, 2.0)[:-4]
    assert geo.wkb_to_geojson(truncated) is None
    # multi* sub-geometry of the wrong kind is rejected
    bad_mp = _wkb(False, geo.MULTIPOINT,
                  struct.pack("<I", 1) + _ls([(0.0, 0.0), (1.0, 1.0)]))
    assert geo.wkb_to_geojson(bad_mp) is None


def test_convert_geospatial_modes():
    b = _pt(3.0, 4.0)
    gj = {"type": "Point", "coordinates": [3.0, 4.0]}
    assert geo.convert_geospatial_value(b) == gj
    feat = geo.convert_geospatial_value(
        b, as_feature=True, crs="EPSG:4326", algorithm="planar")
    assert feat == {"type": "Feature", "geometry": gj,
                    "properties": {"crs": "EPSG:4326", "algorithm": "planar"}}
    hyb = geo.convert_geospatial_value(b, mode="hybrid")
    assert hyb["geojson"] == gj and hyb["wkb_hex"] == b.hex()
    b64 = geo.convert_geospatial_value(b, mode="base64")
    assert "wkb_b64" in b64 and "geojson" not in b64
    # non-convertible WKB falls back to the hex wrapper (geography.go:45)
    bad = _wkb(False, 42, b"")
    fb = geo.convert_geospatial_value(bad)
    assert fb["wkb_hex"] == bad.hex() and fb["crs"] == geo.DEFAULT_CRS
    assert geo.convert_geospatial_value(None) is None
