"""Pluggable byte sources for the real-parquet surface (pqsource.py):
the reference ships 12 storage backends behind source/source.go's
seekable interface; the engine's reader/writer routes ALL IO through
open_source/write_all, proven here over the in-process memory store
(source/mem analog), the cross-process mock:// scheme, and a custom
registered scheme."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from parquet_go_spark import pqinterop as P
from parquet_go_spark import pqsource
from parquet_go_spark import pqwriter as W


@pytest.fixture(autouse=True)
def _clean_memfs():
    pqsource.memfs_clear()
    yield
    pqsource.memfs_clear()


def _table(n=2000):
    return pa.table({
        "k": pa.array(range(n), pa.int64()),
        "s": pa.array([f"row-{i % 61}" for i in range(n)]),
    })


def test_memory_scheme_roundtrip():
    """write_table -> memory:// -> footer/decode entirely in-process,
    mirroring the reference's source/mem backend."""
    t = _table()
    url = "memory://bucket/t.parquet"
    W.write_table(t, url, compression="zstd", row_group_rows=700)
    meta = P.read_footer(url)
    assert meta[3] == t.num_rows
    assert P.decode_table(url).to_pydict() == t.to_pydict()
    # ranged primitives behave like a file
    src = pqsource.open_source(url)
    assert src.size() == len(src.read_all())
    assert src.read_range(0, 4) == b"PAR1"
    pqsource.memfs_delete(url)
    with pytest.raises(FileNotFoundError):
        P.read_footer(url)


def test_memory_scheme_directory_listing():
    t = _table(100)
    W.write_table(t, "memory://d/a.parquet")
    W.write_table(t, "memory://d/b.parquet")
    pqsource.memfs_put("memory://d/notes.txt", b"x")
    assert pqsource.list_parquet("memory://d") == [
        "memory://d/a.parquet", "memory://d/b.parquet"]
    assert pqsource.is_dir("memory://d")
    assert not pqsource.is_dir("memory://other")


def test_mock_scheme_single_process(tmp_path):
    """mock:// looks like a foreign URL but resolves locally — the
    scheme proves every reader path goes through the abstraction."""
    t = _table()
    url = f"mock://{tmp_path}/t.parquet"
    W.write_table(t, url, compression="snappy")
    # the bytes really landed via the source layer, readable as a file
    assert os.path.exists(tmp_path / "t.parquet")
    assert P.decode_table(url).to_pydict() == t.to_pydict()
    assert P.decode_column(url, "k")[:3] == [0, 1, 2]
    assert P.read_range(url, 0, 4) == b"PAR1"


def test_unknown_scheme_message(tmp_path):
    with pytest.raises(ValueError, match="fsspec"):
        pqsource.open_source("s3://bucket/key.parquet")


def test_register_scheme_handler(tmp_path):
    t = _table(50)
    p = str(tmp_path / "x.parquet")
    W.write_table(t, p)
    calls = []

    def factory(url):
        calls.append(url)
        return pqsource.LocalSource(url.split("://", 1)[1])

    pqsource.register_scheme("unittest", factory)
    try:
        got = P.decode_table(f"unittest://{p}")
        assert got.to_pydict() == t.to_pydict()
        assert calls and calls[0].startswith("unittest://")
    finally:
        pqsource._SCHEMES.pop("unittest", None)


def test_distributed_reader_and_writer_over_mock(spark, tmp_path):
    """read_parquet_dir + write_parquet_dir over a non-local URL:
    executors resolve mock:// themselves (no shared driver state) —
    the shape an fsspec s3:// backend would take."""
    from parquet_go_spark.operators.parquet_sink import (
        describe_parquet_dir, fsck_parquet_dir, read_parquet_dir,
        write_parquet_dir)

    src = spark.range(0, 5000).selectExpr(
        "id AS k", "concat('v', cast(id % 37 AS string)) AS s")
    out = f"mock://{tmp_path}/pqdir"
    manifest = write_parquet_dir(src.repartition(3), out,
                                 compression="zstd")
    assert sum(m["rows"] for m in manifest) == 5000
    assert len(pqsource.list_parquet(out)) == 3
    back = read_parquet_dir(spark, out)
    assert back.count() == 5000
    assert src.exceptAll(back).count() == 0
    assert back.exceptAll(src).count() == 0
    # pruned read over the URL scheme too
    few = read_parquet_dir(spark, out, columns=["k"],
                           filters={"k": ("range", 100, 110)})
    assert few.count() == 11
    d = describe_parquet_dir(out)
    assert d["rows"] == 5000 and d["files"] == 3
    assert fsck_parquet_dir(out) == []


def test_http_scheme_ranged_reads(tmp_path):
    """http:// through stdlib urllib with Range requests (the
    reference's source/http backend analog): footer-only reads fetch
    byte ranges, not the file; full decode matches; write refuses."""
    import http.server
    import threading

    t = _table(3000)
    f = tmp_path / "t.parquet"
    W.write_table(t, str(f), compression="zstd")
    data = f.read_bytes()
    got_ranges = []

    class RangeHandler(http.server.BaseHTTPRequestHandler):
        def _common(self, send_body):
            rng = self.headers.get("Range")
            if rng:
                got_ranges.append(rng)
                lo, hi = rng.split("=")[1].split("-")
                body = data[int(lo):int(hi) + 1]
                self.send_response(206)
            else:
                body = data
                self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if send_body:
                self.wfile.write(body)

        def do_GET(self):
            self._common(True)

        def do_HEAD(self):
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), RangeHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/t.parquet"
        src = pqsource.open_source(url)
        assert src.size() == len(data)
        assert src.read_range(0, 4) == b"PAR1"
        meta = P.read_footer(url)            # footer = ranged tail read
        assert meta[3] == t.num_rows
        assert got_ranges and all("bytes=" in r for r in got_ranges)
        assert P.decode_table(url).to_pydict() == t.to_pydict()
        assert pqsource.list_parquet(url) == [url]
        assert not pqsource.is_dir(url)
        with pytest.raises(ValueError, match="read-only"):
            pqsource.write_all(url, b"x")
    finally:
        srv.shutdown()
