"""Parquet PageIndex (ColumnIndex + OffsetIndex) — write, read, prune.

The reference writes both index structures in WriteStop
(/root/reference/writer/ops.go:28-117) and consults them for seeks;
here the engine writer emits them (pqwriter._write_page_index), the
engine reader parses them (pqinterop.read_column_index /
read_offset_index) and prunes page-granular row ranges
(predicate_row_ranges + decode_table(row_ranges=...)).

External referees:
  * pyarrow's writer (write_page_index=True) — its ColumnIndex/
    OffsetIndex must decode exactly through the engine kernels;
  * Spark's JVM vectorized reader — it applies parquet-mr's
    ColumnIndexFilter to engine-written files when filters push down,
    so a malformed or lying index produces wrong rows there.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_spark import pqinterop as P
from parquet_go_spark import pqwriter


def _table(n=10000, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.integers(0, 50, n, dtype=np.int32)),
        "s": pa.array([f"row{i:06d}" for i in range(n)]),
        "f": pa.array(rng.normal(size=n)),
        "opt": pa.array([None if i % 7 == 0 else i * 2
                         for i in range(n)], pa.int64()),
    })


@pytest.fixture(scope="module")
def written(tmp_path_factory):
    d = tmp_path_factory.mktemp("pidx")
    t = _table()
    p = str(d / "t.parquet")
    pqwriter.write_table(t, p, compression="zstd", page_rows=1000)
    return p, t


def _chunks(path):
    return P.column_chunks(P.read_footer(path))[0]


def test_offset_index_matches_page_walk(written):
    path, _ = written
    data = open(path, "rb").read()
    for cc in _chunks(path):
        oi = P.read_offset_index(path, cc)
        assert oi is not None and len(oi) == 10
        # walk the chunk's pages independently; data pages must line up
        pos = cc.first_page_offset
        end = pos + cc.total_compressed
        walk = []
        mv = memoryview(data)
        while pos < end:
            hdr, body = P._read_struct(mv, pos)
            nxt = body + hdr[3]
            if hdr[1] != P.PG_DICT:
                walk.append((pos, nxt - pos))
            pos = nxt
        assert [(o, s) for o, s, _ in oi] == walk
        firsts = [fri for _, _, fri in oi]
        assert firsts == list(range(0, 10000, 1000))


def test_column_index_per_page_bounds(written):
    path, t = written
    for cc in _chunks(path):
        ci = P.read_column_index(path, cc)
        assert ci is not None, cc.name
        full = P.decode_column(path, cc.name)
        oi = P.read_offset_index(path, cc)
        exts = P._page_extents(oi, cc.num_rows)
        for (lo, hi), mn, mx, npg, nc in zip(
                exts, ci["mins"], ci["maxs"], ci["null_pages"],
                ci["null_counts"]):
            seg = [v for v in full[lo:hi] if v is not None]
            assert nc == (hi - lo) - len(seg)
            assert npg == (not seg)
            if seg:
                assert mn == min(seg) and mx == max(seg)
        # sorted column declares ASC; engine must agree with the data
        if cc.name == "k":
            assert ci["boundary_order"] == 1


def test_boundary_order_desc_and_unordered(tmp_path):
    n = 4000
    t = pa.table({
        "d": pa.array(np.arange(n, 0, -1, dtype=np.int64)),
        "u": pa.array(np.r_[np.arange(2000, dtype=np.int64),
                            np.arange(2000, 0, -1)]),
    })
    p = str(tmp_path / "bo.parquet")
    pqwriter.write_table(t, p, page_rows=500, compression="none")
    cc = {c.name: c for c in _chunks(p)}
    assert P.read_column_index(p, cc["d"])["boundary_order"] == 2
    assert P.read_column_index(p, cc["u"])["boundary_order"] == 0


def test_exact_or_absent(tmp_path):
    # NaN floats and >128 B strings poison the ColumnIndex (absent),
    # but the OffsetIndex must survive — locations are always exact
    t = pa.table({
        "nanf": pa.array([1.0, float("nan"), 3.0] * 100),
        "long": pa.array((["x" * 200] + ["ok"] * 2) * 100),
        "fine": pa.array(np.arange(300, dtype=np.int32)),
    })
    p = str(tmp_path / "poison.parquet")
    pqwriter.write_table(t, p, page_rows=100, compression="none")
    cc = {c.name: c for c in _chunks(p)}
    assert P.read_column_index(p, cc["nanf"]) is None
    assert P.read_column_index(p, cc["long"]) is None
    assert P.read_column_index(p, cc["fine"]) is not None
    for c in cc.values():
        assert P.read_offset_index(p, c) is not None


def test_page_index_optional(tmp_path):
    t = _table(500)
    p = str(tmp_path / "noidx.parquet")
    pqwriter.write_table(t, p, page_index=False)
    for cc in _chunks(p):
        assert cc.ci_off is None and cc.oi_off is None
        assert P.read_column_index(p, cc) is None


def test_external_readers_still_green(written):
    import duckdb

    path, t = written
    got = pq.read_table(path)
    assert got.to_pydict() == t.to_pydict()
    n = duckdb.sql(
        f"SELECT count(*) FROM '{path}'").fetchall()[0][0]
    assert n == t.num_rows


def test_pyarrow_page_index_decodes(tmp_path):
    """Referee (read direction): parquet-cpp's PageIndex bitstream."""
    rng = np.random.default_rng(3)
    n = 20000
    t = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "s": pa.array([f"doc{i:07d}" for i in range(n)]),
        "x": pa.array(rng.normal(size=n).astype(np.float32)),
        "opt": pa.array([None if i % 5 == 0 else i
                         for i in range(n)], pa.int64()),
    })
    p = str(tmp_path / "pa.parquet")
    pq.write_table(t, p, write_page_index=True, data_page_size=8192,
                   use_dictionary=False, compression="snappy")
    for cc in _chunks(p):
        oi = P.read_offset_index(p, cc)
        ci = P.read_column_index(p, cc)
        assert oi is not None and ci is not None, cc.name
        full = P.decode_column(p, cc.name)
        exts = P._page_extents(oi, cc.num_rows)
        assert exts[0][0] == 0 and exts[-1][1] == n
        for (lo, hi), mn, mx, npg in zip(exts, ci["mins"], ci["maxs"],
                                         ci["null_pages"]):
            seg = [v for v in full[lo:hi] if v is not None]
            if npg:
                assert not seg
                continue
            if isinstance(mn, float):
                assert abs(mn - float(min(seg))) < 1e-6
                assert abs(mx - float(max(seg))) < 1e-6
            else:
                assert mn == min(seg) and mx == max(seg)
    sub = P.decode_table(p, row_ranges={0: [(123, 456)]})
    assert sub.to_pydict() == t.slice(123, 333).to_pydict()


def test_ranged_decode_equals_sliced_full(written):
    path, t = written
    ranges = [(0, 1), (1500, 1800), (7777, 8888), (9999, 10000)]
    sub = P.decode_table(path, row_ranges={0: ranges})
    want = pa.concat_tables([t.slice(lo, hi - lo) for lo, hi in ranges])
    assert sub.to_pydict() == want.to_pydict()


def test_pruned_pages_never_read(written, tmp_path):
    """The scale contract: a page outside the wanted row ranges is
    never read off disk — proven by corrupting every byte of the
    non-kept pages and decoding successfully anyway."""
    path, t = written
    data = bytearray(open(path, "rb").read())
    keep_rows = [(3000, 3500)]          # falls entirely in page 3
    for cc in _chunks(path):
        oi = P.read_offset_index(path, cc)
        exts = P._page_extents(oi, cc.num_rows)
        for (off, size, _), (lo, hi) in zip(oi, exts):
            if hi <= 3000 or lo >= 3500:
                data[off:off + size] = b"\xde" * size
    p2 = str(tmp_path / "scorched.parquet")
    open(p2, "wb").write(bytes(data))
    sub = P.decode_table(p2, row_ranges={0: keep_rows})
    assert sub.to_pydict() == t.slice(3000, 500).to_pydict()
    # and the full decode of the scorched file must fail (the
    # corruption is real; the pruned read just never touched it)
    with pytest.raises(Exception):
        P.decode_table(p2)


def test_predicate_row_ranges(written):
    path, _ = written
    meta = P.read_footer(path)
    r, pruned = P.predicate_row_ranges(
        path, meta, 0, {"k": ("range", 2500, 2600)})
    assert pruned and r == [(2000, 3000)]
    r, pruned = P.predicate_row_ranges(
        path, meta, 0, {"k": ("eq", 4321)})
    assert pruned and r == [(4000, 5000)]
    r, pruned = P.predicate_row_ranges(
        path, meta, 0, {"s": ("eq", "row009999")})
    assert pruned and r == [(9000, 10000)]
    # intersection across two indexed columns
    r, pruned = P.predicate_row_ranges(
        path, meta, 0, {"k": ("range", 0, 9999),
                        "s": ("eq", "row005000")})
    assert pruned and r == [(5000, 6000)]
    # out-of-domain probe prunes everything
    r, pruned = P.predicate_row_ranges(
        path, meta, 0, {"k": ("eq", 123456)})
    assert pruned and r == []


def test_list_column_row_ranges(tmp_path):
    rng = np.random.default_rng(11)
    rows = [None if i % 13 == 0 else
            rng.integers(0, 1000, rng.integers(0, 6)).tolist()
            for i in range(2000)]
    t = pa.table({"k": pa.array(np.arange(2000, dtype=np.int64)),
                  "emb": pa.array(rows, pa.list_(pa.int32()))})
    p = str(tmp_path / "lists.parquet")
    pqwriter.write_table(t, p, page_rows=250)
    sub = P.decode_table(p, row_ranges={0: [(300, 400), (1750, 1800)]})
    want = pa.concat_tables([t.slice(300, 100), t.slice(1750, 50)])
    assert sub.to_pydict() == want.to_pydict()


def test_multi_row_group_ranges(tmp_path):
    t = _table(6000, seed=23)
    p = str(tmp_path / "rg.parquet")
    pqwriter.write_table(t, p, row_group_rows=2000, page_rows=500)
    # rg 1 sliced, rg 2 full, rg 0 skipped entirely
    sub = P.decode_table(p, row_groups=[1, 2],
                         row_ranges={1: [(100, 300)]})
    want = pa.concat_tables([t.slice(2100, 200), t.slice(4000, 2000)])
    assert sub.to_pydict() == want.to_pydict()


def test_page_crc_verified_before_parse(written, tmp_path):
    """Read-side CRC: flip ONE byte inside a compressed page body —
    the engine must refuse with a CRC mismatch before decompressing
    (the reference's page_read.go CRC-before-parse posture)."""
    path, _ = written
    data = bytearray(open(path, "rb").read())
    cc = next(c for c in _chunks(path) if c.name == "k")
    off, size, _ = P.read_offset_index(path, cc)[0]
    data[off + size - 1] ^= 0xFF          # last byte of the body
    p2 = str(tmp_path / "flip.parquet")
    open(p2, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="CRC mismatch"):
        P.decode_column(p2, "k")


def test_sorting_columns_roundtrip(tmp_path):
    t = _table(1000)
    p = str(tmp_path / "sorted.parquet")
    pqwriter.write_table(
        t, p, sorting_columns=[("k", False, False), ("v", True, True)])
    got = P.sorting_columns(P.read_footer(p))
    assert got == [("k", False, False), ("v", True, True)]
    # external referee: parquet-cpp parses the declaration identically
    md = pq.ParquetFile(p).metadata.row_group(0).sorting_columns
    assert [(s.column_index, s.descending, s.nulls_first) for s in md] \
        == [(0, False, False), (1, True, True)]
    # and the reverse: a pyarrow-written declaration reads back
    p2 = str(tmp_path / "pa_sorted.parquet")
    pq.write_table(t, p2, sorting_columns=[
        pq.SortingColumn(2), pq.SortingColumn(0, descending=True)])
    assert P.sorting_columns(P.read_footer(p2)) == [
        ("s", False, False), ("k", True, False)]


def test_spark_jvm_reader_uses_our_index(spark, written, tmp_path):
    """Referee (write direction): Spark's vectorized reader applies
    parquet-mr's ColumnIndexFilter to pushed-down filters; a lying
    ColumnIndex or broken OffsetIndex surfaces as wrong rows here."""
    path, t = written
    df = spark.read.parquet(path)
    got = (df.filter("k >= 2500 and k < 2600").orderBy("k")
           .select("k", "s", "opt").collect())
    assert [r["k"] for r in got] == list(range(2500, 2600))
    assert got[0]["s"] == "row002500"
    got2 = df.filter("s = 'row007777'").collect()
    assert len(got2) == 1 and got2[0]["k"] == 7777


def test_read_parquet_dir_page_pruned(spark, written, tmp_path):
    from parquet_go_spark.operators.parquet_sink import read_parquet_dir

    path, t = written
    df = read_parquet_dir(spark, path, columns=["k", "s", "v"],
                          filters={"k": ("range", 2500, 2599)})
    rows = sorted(df.collect(), key=lambda r: r["k"])
    assert [r["k"] for r in rows] == list(range(2500, 2600))
    assert rows[-1]["s"] == "row002599"


# --- encoding_stats + dictionary pruning (DictionaryFilter analog) ------

def _dict_file(tmp_path, name="d.parquet"):
    n = 5000
    t = pa.table({
        "cat": pa.array([f"c{i % 20}" for i in range(n)]),
        "k": pa.array(np.arange(n, dtype=np.int64)),
    })
    p = str(tmp_path / name)
    pqwriter.write_table(t, p, compression="snappy", page_rows=1000)
    return p, t


def test_encoding_stats_and_fully_dict(tmp_path):
    p, t = _dict_file(tmp_path)
    ccs = {c.name: c for c in _chunks(p)}
    assert P.chunk_fully_dict(ccs["cat"])          # dict + RLE_DICTIONARY
    assert not P.chunk_fully_dict(ccs["k"])        # DELTA_BINARY_PACKED
    d = P.read_dictionary(p, ccs["cat"])
    assert sorted(set(d)) == sorted({f"c{i}".encode() for i in range(20)})
    # parquet-cpp's encoding_stats parse through the same kernel
    import pyarrow.parquet as pqmod

    p2 = str(tmp_path / "pa.parquet")
    pqmod.write_table(t, p2, use_dictionary=["cat"])
    ccs2 = {c.name: c for c in _chunks(p2)}
    assert P.chunk_fully_dict(ccs2["cat"])
    assert not P.chunk_fully_dict(ccs2["k"])


def test_rowgroup_metadata_completeness(tmp_path):
    p, t = _dict_file(tmp_path)
    meta = P.read_footer(p)
    rg = meta[4][0]
    assert rg.get(7) == 0                          # ordinal
    assert rg.get(5) == 4                          # first page after magic
    ccs = _chunks(p)
    assert rg.get(6) == sum(c.total_compressed for c in ccs)
    # parquet-cpp parses the file intact with these fields present
    import pyarrow.parquet as pqmod

    md = pqmod.ParquetFile(p).metadata.row_group(0)
    assert md.num_rows == rg.get(3)


def test_dictionary_pruning_drops_units(spark, tmp_path):
    """eq probe on a value absent from every dictionary must read NO
    data pages: scorch all data-page bytes; only dict pages + footer
    stay intact, and the pruned read still answers."""
    from parquet_go_spark.operators.parquet_sink import (
        read_parquet_dir, write_parquet_dir)

    n = 4000
    t = pa.table({
        "cat": pa.array([f"c{i % 16}" for i in range(n)]),
        "k": pa.array(np.arange(n, dtype=np.int64)),
    })
    out = str(tmp_path / "dirs")
    df = spark.createDataFrame(t.to_pandas())
    write_parquet_dir(df.coalesce(2), out, compression="snappy",
                      encodings={"k": "dict"})
    import glob

    for f in glob.glob(out + "/*.parquet"):
        data = bytearray(open(f, "rb").read())
        for cc in P.column_chunks(P.read_footer(f))[0]:
            s = cc.data_page_offset
            e = cc.first_page_offset + cc.total_compressed
            data[s:e] = b"\xa5" * (e - s)
        open(f, "wb").write(bytes(data))
    got = read_parquet_dir(spark, out,
                           filters={"cat": ("eq", "nope")}).collect()
    assert got == []


def test_in_predicate_prunes_all_layers(spark, tmp_path):
    """IN-list probes prune through stats, blooms, dictionaries, and
    the ColumnIndex — and the exact isin re-applies in Spark."""
    from parquet_go_spark.operators.parquet_sink import (
        read_parquet_dir, write_parquet_dir)

    n = 8000
    t = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "cat": pa.array([f"c{i % 16}" for i in range(n)]),
    })
    out = str(tmp_path / "d")
    df = spark.createDataFrame(t.to_pandas()).orderBy("k")
    write_parquet_dir(df.coalesce(1), out, row_group_rows=1 << 20,
                      page_rows=500, bloom_columns=["k"],
                      sorting_columns=["k"])
    rows = read_parquet_dir(
        spark, out, filters={"k": ("in", [5, 4321, 7999])}).collect()
    assert sorted(r["k"] for r in rows) == [5, 4321, 7999]
    # page ranges: the three values fall in pages 0, 8, 15
    import glob

    f = glob.glob(out + "/*.parquet")[0]
    meta = P.read_footer(f)
    r, pruned = P.predicate_row_ranges(
        f, meta, 0, {"k": ("in", [5, 4321, 7999])})
    assert pruned and r == [(0, 500), (4000, 4500), (7500, 8000)]
    # dictionary layer on the categorical column
    rows2 = read_parquet_dir(
        spark, out, filters={"cat": ("in", ["nope", "never"])}).collect()
    assert rows2 == []
