"""MAP columns through real Parquet interop, both directions.

Canonical encoding: optional group (MAP) > repeated key_value >
required key + optional value — two leaf chunks sharing one rep
stream (reference map marshalling: /root/reference/marshal/marshal.go
ParquetMapStruct / ParquetMap node handlers). External referees:
pyarrow + DuckDB + Spark's JVM reader decode engine-written maps;
the engine decodes pyarrow-written maps.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_spark import pqinterop as P
from parquet_go_spark import pqwriter


def _map_table(n=3000, seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 11 == 0:
            rows.append(None)
        elif i % 7 == 0:
            rows.append({})
        else:
            rows.append({f"k{j}": None if (i + j) % 5 == 0 else i * 10 + j
                         for j in range(rng.integers(1, 5))})
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "m": pa.array(rows, pa.map_(pa.string(), pa.int64())),
    })


def _norm(tbl):
    return [(r["id"], None if r["m"] is None else
             sorted((k, v) for k, v in r["m"])) for r in tbl.to_pylist()]


@pytest.fixture(scope="module")
def written(tmp_path_factory):
    d = tmp_path_factory.mktemp("pqmap")
    t = _map_table()
    p = str(d / "m.parquet")
    pqwriter.write_table(t, p, compression="zstd", page_rows=500)
    return p, t


def test_pyarrow_reads_engine_maps(written):
    path, t = written
    assert _norm(pq.read_table(path)) == _norm(t)


def test_duckdb_reads_engine_maps(written):
    import duckdb

    path, t = written
    n_nonnull = sum(1 for r in t.column("m").to_pylist() if r is not None)
    got = duckdb.sql(
        f"SELECT count(*) FROM '{path}' WHERE m IS NOT NULL"
    ).fetchall()[0][0]
    assert got == n_nonnull
    # value-level referee through duckdb's own map functions
    got2 = duckdb.sql(
        f"SELECT id, m['k0'] FROM '{path}' WHERE id IN (1, 2, 3) "
        "ORDER BY id").fetchall()
    want = {}
    for r in t.slice(1, 3).to_pylist():
        d = dict(r["m"] or [])
        want[r["id"]] = [d["k0"]] if "k0" in d else []
    assert {i: v for i, v in got2} == want


def test_engine_reads_own_maps(written):
    path, t = written
    assert _norm(P.decode_table(path)) == _norm(t)


def test_engine_reads_pyarrow_maps(tmp_path):
    t = _map_table(seed=9)
    p = str(tmp_path / "pa.parquet")
    pq.write_table(t, p, data_page_size=4096)
    assert _norm(P.decode_table(p)) == _norm(t)


def test_map_row_ranges(written):
    path, t = written
    sub = P.decode_table(path, row_ranges={0: [(100, 200), (2900, 3000)]})
    want = pa.concat_tables([t.slice(100, 100), t.slice(2900, 100)])
    assert _norm(sub) == _norm(want)


def test_map_column_projection(written):
    path, t = written
    sub = P.decode_table(path, columns=["m"])
    assert sub.column_names == ["m"]
    assert ([None if r is None else sorted(dict(r).items())
             for r in sub.column("m").to_pylist()]
            == [None if r is None else sorted(dict(r).items())
                for r in t.column("m").to_pylist()])


def test_map_multi_row_group(tmp_path):
    t = _map_table(4000, seed=13)
    p = str(tmp_path / "rg.parquet")
    pqwriter.write_table(t, p, row_group_rows=1000, page_rows=300)
    assert _norm(P.decode_table(p)) == _norm(t)
    assert _norm(P.decode_table(p, row_groups=[2])) == \
        _norm(t.slice(2000, 1000))


def test_map_int_keys_float_values(tmp_path):
    rows = [None if i % 9 == 0 else
            {j: float(i + j) / 4 for j in range(i % 4)}
            for i in range(1000)]
    t = pa.table({"m": pa.array(rows, pa.map_(pa.int32(), pa.float64()))})
    p = str(tmp_path / "intmap.parquet")
    pqwriter.write_table(t, p)
    got = P.decode_table(p)
    assert got.column("m").to_pylist() == t.column("m").to_pylist()
    assert _map_norm_eq(pq.read_table(p), t)


def _map_norm_eq(a, b):
    na = [None if r is None else sorted(dict(r).items())
          for r in a.column("m").to_pylist()]
    nb = [None if r is None else sorted(dict(r).items())
          for r in b.column("m").to_pylist()]
    return na == nb


def test_non_nullable_map_field(tmp_path):
    """A non-nullable arrow map field must still write the canonical
    optional outer group (the level streams are built against the
    0/1/2(/3) thresholds) — pins the required-outer misdecode."""
    t = pa.table({"m": pa.array(
        [{"a": i, "b": i + 1} for i in range(500)],
        pa.map_(pa.string(), pa.int64()))})
    t = t.cast(pa.schema([pa.field(
        "m", pa.map_(pa.string(), pa.int64()), nullable=False)]))
    p = str(tmp_path / "req.parquet")
    pqwriter.write_table(t, p, page_rows=100)
    got = P.decode_table(p)
    assert _map_norm_eq(got, t)
    assert _map_norm_eq(pq.read_table(p), t)


def test_spark_jvm_reads_engine_maps(spark, written):
    path, t = written
    df = spark.read.parquet(path)
    got = df.selectExpr("id", "m['k0'] as v").orderBy("id").collect()
    want = [(r["id"], (dict(r["m"]) if r["m"] is not None else {})
             .get("k0")) for r in t.to_pylist()]
    assert [(r["id"], r["v"]) for r in got] == want
