"""Pluggable seekable byte sources for the real-parquet surface.

The reference ships 12 storage backends (source/s3v2/s3.go,
source/gcs/gcs.go, source/azblob/, source/http/http_reader.go, ...)
behind one seekable-clone interface (source/source.go ParquetFileReader).
The engine's reader needs exactly three read primitives — size(),
read_range(offset, length), read_all() — because the footer, PageIndex,
bloom, and page paths already read by offset; the writer needs one
(write_all). This module is that interface:

- plain local paths take a direct-os fast path (zero overhead);
- ``memory://name`` is an in-process byte store mirroring the
  reference's source/mem (tests, single-process tools);
- ``mock://<local-path>`` routes a real local file THROUGH the ranged
  interface while looking like a foreign URL — the cross-process test
  scheme (Spark executors resolve it without shared driver state);
- ``http://`` / ``https://`` read through stdlib urllib with Range
  requests (source/http/http_reader.go analog, read-only);
- any other ``scheme://`` resolves through fsspec when that optional
  dependency is installed (s3://, gs://, abfs:// ... for free), or
  through a factory registered with ``register_scheme``.

The PGS store side (Spark/Hadoop FS) never needed this — Spark handles
any URI there; this is for the engine's OWN .parquet reader/writer.
"""

from __future__ import annotations

import os
import threading
from typing import Callable

# ----------------------------------------------------------- registry

_SCHEMES: dict[str, Callable[[str], "ByteSource"]] = {}


def register_scheme(scheme: str,
                    factory: Callable[[str], "ByteSource"]) -> None:
    """Install a handler for ``scheme://...`` paths. The factory gets
    the full URL and returns a ByteSource."""
    _SCHEMES[scheme.lower()] = factory


def _scheme_of(path: str) -> str | None:
    i = path.find("://")
    # windows drive letters aside (not this platform), any :// marks a URL
    return path[:i].lower() if i > 0 else None


# ------------------------------------------------------------ sources

class ByteSource:
    """Seekable read-only byte source (ParquetFileReader analog)."""

    def size(self) -> int:
        raise NotImplementedError

    def read_range(self, offset: int, length: int) -> bytes:
        raise NotImplementedError

    def read_all(self) -> bytes:
        return self.read_range(0, self.size())


class LocalSource(ByteSource):
    def __init__(self, path: str):
        self.path = path

    def size(self) -> int:
        return os.path.getsize(self.path)

    def read_range(self, offset: int, length: int) -> bytes:
        with open(self.path, "rb") as fh:
            fh.seek(offset)
            return fh.read(length)

    def read_all(self) -> bytes:
        with open(self.path, "rb") as fh:
            return fh.read()


class MemSource(ByteSource):
    def __init__(self, data: bytes):
        self._data = data

    def size(self) -> int:
        return len(self._data)

    def read_range(self, offset: int, length: int) -> bytes:
        return bytes(self._data[offset:offset + length])

    def read_all(self) -> bytes:
        return bytes(self._data)


class HttpSource(ByteSource):
    """http:// / https:// via stdlib urllib with Range requests — the
    reference's source/http/http_reader.go analog, no extra deps.
    Servers that ignore Range (return 200 + full body) still read
    correctly; they just lose the ranged-IO savings."""

    def __init__(self, url: str):
        self.url = url
        self._size: int | None = None

    def _open(self, headers: dict | None = None, method: str = "GET"):
        import urllib.request

        req = urllib.request.Request(self.url, headers=headers or {},
                                     method=method)
        return urllib.request.urlopen(req)          # noqa: S310

    def size(self) -> int:
        if self._size is None:
            with self._open(method="HEAD") as r:
                cl = r.headers.get("Content-Length")
            if cl is not None:
                self._size = int(cl)
            else:
                self._size = len(self.read_all())
        return self._size

    def read_range(self, offset: int, length: int) -> bytes:
        if length <= 0:
            return b""
        hdr = {"Range": f"bytes={offset}-{offset + length - 1}"}
        with self._open(hdr) as r:
            data = r.read()
            if r.status == 200 and len(data) != length:
                return data[offset:offset + length]   # Range ignored
        return data

    def read_all(self) -> bytes:
        with self._open() as r:
            return r.read()


class FsspecSource(ByteSource):
    """Any fsspec-resolvable URL (s3://, gs://, http://, ...)."""

    def __init__(self, path: str):
        import fsspec

        self._fs, self._p = fsspec.core.url_to_fs(path)

    def size(self) -> int:
        return self._fs.size(self._p)

    def read_range(self, offset: int, length: int) -> bytes:
        with self._fs.open(self._p, "rb") as fh:
            fh.seek(offset)
            return fh.read(length)

    def read_all(self) -> bytes:
        return self._fs.cat_file(self._p)


# ----------------------------------------------- in-process memory fs

_MEMFS: dict[str, bytes] = {}
_MEMLOCK = threading.Lock()


def memfs_put(url: str, data: bytes) -> None:
    with _MEMLOCK:
        _MEMFS[url] = bytes(data)


def memfs_delete(url: str) -> None:
    with _MEMLOCK:
        _MEMFS.pop(url, None)


def memfs_clear() -> None:
    with _MEMLOCK:
        _MEMFS.clear()


def _mem_source(url: str) -> MemSource:
    with _MEMLOCK:
        data = _MEMFS.get(url)
    if data is None:
        raise FileNotFoundError(f"memory file {url!r} not found")
    return MemSource(data)


# ------------------------------------------------------------- lookup

def open_source(path: str) -> ByteSource:
    scheme = _scheme_of(path)
    if scheme is None:
        return LocalSource(path)
    if scheme in _SCHEMES:
        return _SCHEMES[scheme](path)
    if scheme == "memory":
        return _mem_source(path)
    if scheme == "mock":
        return LocalSource(path[len("mock://"):])
    if scheme in ("http", "https"):
        return HttpSource(path)
    try:
        return FsspecSource(path)
    except ImportError:
        raise ValueError(
            f"path {path!r} needs the optional fsspec dependency (or a "
            f"register_scheme({scheme!r}, ...) handler)") from None


def write_all(path: str, data: bytes) -> None:
    """Writer counterpart: local file, memory://, mock://, or an
    fsspec URL."""
    scheme = _scheme_of(path)
    if scheme is None:
        with open(path, "wb") as fh:
            fh.write(data)
        return
    if scheme == "memory":
        memfs_put(path, data)
        return
    if scheme == "mock":
        with open(path[len("mock://"):], "wb") as fh:
            fh.write(data)
        return
    if scheme in ("http", "https"):
        raise ValueError("http(s) sources are read-only")
    try:
        import fsspec

        with fsspec.open(path, "wb") as fh:
            fh.write(data)
    except ImportError:
        raise ValueError(
            f"path {path!r} needs the optional fsspec dependency") from None


def size(path: str) -> int:
    return open_source(path).size()


def is_dir(path: str) -> bool:
    scheme = _scheme_of(path)
    if scheme is None:
        return os.path.isdir(path)
    if scheme == "memory":
        prefix = path.rstrip("/") + "/"
        with _MEMLOCK:
            return any(k.startswith(prefix) for k in _MEMFS)
    if scheme == "mock":
        return os.path.isdir(path[len("mock://"):])
    if scheme in ("http", "https"):
        return False          # http sources address single files
    import fsspec

    fs, p = fsspec.core.url_to_fs(path)
    return fs.isdir(p)


def list_parquet(path: str) -> list[str]:
    """Sorted *.parquet members when ``path`` is a directory, else
    [path] when it denotes a file that exists — the directory-scan
    primitive read_parquet_dir plans from."""
    import glob as globmod

    scheme = _scheme_of(path)
    if scheme is None:
        if os.path.isdir(path):
            return sorted(globmod.glob(os.path.join(path, "*.parquet")))
        return [path] if os.path.exists(path) else []
    if scheme == "memory":
        prefix = path.rstrip("/") + "/"
        with _MEMLOCK:
            if path in _MEMFS:
                return [path]
            return sorted(k for k in _MEMFS
                          if k.startswith(prefix) and k.endswith(".parquet"))
    if scheme == "mock":
        local = path[len("mock://"):]
        if os.path.isdir(local):
            return sorted(
                "mock://" + f
                for f in globmod.glob(os.path.join(local, "*.parquet")))
        return [path] if os.path.exists(local) else []
    if scheme in ("http", "https"):
        return [path]         # no listing protocol; single file
    import fsspec

    fs, p = fsspec.core.url_to_fs(path)
    if fs.isdir(p):
        pre = path[:len(path) - len(p)] if path.endswith(p) else ""
        return sorted(pre + f for f in fs.glob(p.rstrip("/") + "/*.parquet"))
    return [path] if fs.exists(p) else []
