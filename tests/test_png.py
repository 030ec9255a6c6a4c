"""Pure-stdlib PNG codec (png.py): spec roundtrip, cross-decoder
filter coverage, external-writer interop via a hand-built filtered
stream, and defensive rejection. No Spark needed."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from parquet_go_spark import png


def _img(h=40, w=56, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w), dtype=np.uint8)


def test_roundtrip_gray8():
    img = _img()
    blob = png.encode_gray8(img)
    assert blob[:8] == png.SIGNATURE
    out = png.decode_gray8(blob)
    assert out.dtype == np.uint8 and np.array_equal(out, img)
    # gradient + constant images too (degenerate filter inputs)
    for im in (np.tile(np.arange(64, dtype=np.uint8), (16, 1)),
               np.full((9, 7), 200, np.uint8),
               np.zeros((1, 1), np.uint8)):
        assert np.array_equal(png.decode_gray8(png.encode_gray8(im)), im)


def _manual_png(img: np.ndarray, filters: list[int]) -> bytes:
    """Build a spec-valid PNG applying the given filter per scanline —
    the decoder must reverse what OTHER writers emit, not just our
    filter-0 encoder."""
    h, w = img.shape
    lines = []
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        cur = img[y].astype(np.int64)
        t = filters[y % len(filters)]
        if t == 0:
            f = cur
        elif t == 1:
            f = cur - np.concatenate(([0], cur[:-1]))
        elif t == 2:
            f = cur - prev
        elif t == 3:
            left = np.concatenate(([0], cur[:-1]))
            f = cur - (left + prev) // 2
        else:  # Paeth
            left = np.concatenate(([0], cur[:-1]))
            ul = np.concatenate(([0], prev[:-1]))
            p = left + prev - ul
            pa_, pb, pc = abs(p - left), abs(p - prev), abs(p - ul)
            pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                            np.where(pb <= pc, prev, ul))
            f = cur - pred
        lines.append(bytes([t]) + (f & 0xFF).astype(np.uint8).tobytes())
        prev = img[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    return (png.SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_decode_all_filter_types(filters):
    img = _img(23, 31, seed=sum(filters) + 1)
    assert np.array_equal(png.decode_gray8(_manual_png(img, filters)), img)


def test_decode_rejects_corruption():
    blob = bytearray(png.encode_gray8(_img(8, 8)))
    with pytest.raises(ValueError, match="signature"):
        png.decode_gray8(b"GIF89a" + bytes(blob))
    # flip a byte inside IDAT: chunk CRC must catch it
    bad = bytearray(blob)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|chunk|scanline"):
        png.decode_gray8(bytes(bad))
    with pytest.raises(ValueError, match="truncated|missing"):
        png.decode_gray8(bytes(blob[:-8]))
    # RGB color type refuses (scope is grayscale-8)
    ih = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    rgb = (png.SIGNATURE + chunk(b"IHDR", ih)
           + chunk(b"IDAT", zlib.compress(b"\0" * (4 * 13)))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported"):
        png.decode_gray8(rgb)


def test_decode_media_png_path():
    """decode_media(fmt='png') is a real decode now, not a stub; other
    real-world formats still declare the stub loudly."""
    from parquet_go_spark.operators import multimodal as mm

    img = _img(17, 29)
    out = mm.decode_media(png.encode_gray8(img), "png", 29, 17)
    assert out.shape == (1, 17, 29) and np.array_equal(out[0], img)
    with pytest.raises(ValueError, match="unknown media format"):
        mm.decode_media(b"\x00\x00\x01", "h264", 8, 8)
