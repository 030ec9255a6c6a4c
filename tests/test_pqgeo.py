"""GEOMETRY logical type + GeospatialStatistics in REAL parquet
footers (r3 verdict #6; reference internal/layout/chunk.go:124-173
folds the same bbox into chunk metadata)."""

import numpy as np
import pyarrow as pa

from parquet_go_spark import geo, pqinterop, pqwriter
from parquet_go_spark.operators import parquet_sink as psk


def _points_table(n=1000):
    x = np.arange(n, dtype=np.float64)
    y = (x * 3) % 251
    return pa.table({
        "k": pa.array(range(n), pa.int64()),
        "g": geo.wkb_points(x, y).cast(pa.binary()),
    }), x, y


def test_footer_carries_geo_stats_and_prunes(tmp_path):
    t, x, y = _points_table()
    p = str(tmp_path / "geo.parquet")
    pqwriter.write_table(t, p, row_group_rows=250,
                         logical_types={"g": "geometry"})
    meta = pqinterop.read_footer(p)
    assert len(meta[4]) == 4
    for gi, rg in enumerate(meta[4]):
        cc = next(c for c in rg[1]
                  if b".".join(c[3][3]) == b"g")[3]
        gs = cc[17]
        bb = gs[1]
        lo, hi = gi * 250, gi * 250 + 249
        assert bb[1] == float(lo) and bb[2] == float(hi)   # xmin/xmax
        assert gs[2] == [1]                                # POINT
        assert 12 not in cc      # GEOMETRY: no min/max Statistics
    # schema annotation surfaces on read
    out = pqinterop.decode_table(p)
    assert out.schema.field("g").metadata[b"pgs_logical"] == b"geometry"
    assert out.column("g").to_pylist() == t.column("g").to_pylist()
    # unit pruning: only the second row group intersects x in [300,400]
    pred = ("bbox", 300.0, 0.0, 400.0, 300.0)
    keeps = [psk._rg_stats_keep(meta, gi, "g", pred) for gi in range(4)]
    assert keeps == [False, True, False, False]


def test_bbox_mask_exact_general_wkb():
    x = np.array([1.0, 5.0, 9.0])
    y = np.array([1.0, 5.0, 9.0])
    arr = geo.wkb_points(x, y).cast(pa.binary())
    m = geo.bbox_mask(arr, 2.0, 2.0, 6.0, 6.0)
    assert m.tolist() == [False, True, False]
    # nulls are excluded; mixed/non-point WKB falls back to the walker
    vals = arr.to_pylist()
    import struct

    # linestring (type 2) from (0,0) to (3,3): bbox intersects window
    ls = (b"\x01" + struct.pack("<I", 2) + struct.pack("<I", 2)
          + struct.pack("<dddd", 0.0, 0.0, 3.0, 3.0))
    mixed = pa.array([vals[0], None, ls], pa.binary())
    m2 = geo.bbox_mask(mixed, 2.0, 2.0, 6.0, 6.0)
    assert m2.tolist() == [False, False, True]


def test_read_parquet_dir_bbox_filter(spark, tmp_path):
    t, x, y = _points_table(600)
    d = tmp_path / "geodir"
    d.mkdir()
    pqwriter.write_table(t, str(d / "a.parquet"), row_group_rows=200,
                         logical_types={"g": "geometry"})
    df = psk.read_parquet_dir(
        spark, str(d), columns=["k"],
        filters={"g": ("bbox", 100.0, 0.0, 120.0, 100.0)})
    got = sorted(r["k"] for r in df.collect())
    want = [i for i in range(600)
            if 100 <= x[i] <= 120 and 0 <= y[i] <= 100]
    assert got == want
