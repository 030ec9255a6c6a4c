"""Baseline JPEG codec (jpeg.py) — self-consistency + the JDK referee.

The container has no Python image libraries, but Java 17 ships a real
JPEG codec (javax.imageio). Spark's py4j gateway makes it an external
referee: ImageIO must decode engine-encoded JPEGs, and the engine must
decode ImageIO-encoded ones, pixel-close (JPEG decoders may legally
differ by a few levels: IDCT precision + chroma upsampling choice).
"""

from __future__ import annotations

import numpy as np
import pytest

from parquet_go_spark import jpeg, png


def _smooth_gray(h=64, w=48):
    yy, xx = np.mgrid[0:h, 0:w]
    g = 128 + 80 * np.sin(yy / 9.0) * np.cos(xx / 7.0)
    return np.clip(g, 0, 255).astype(np.uint8)


def _smooth_rgb(h=48, w=40):
    yy, xx = np.mgrid[0:h, 0:w]
    r = 128 + 70 * np.sin(yy / 10.0)
    g = 128 + 70 * np.cos(xx / 8.0)
    b = 128 + 50 * np.sin((xx + yy) / 12.0)
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)


def test_gray_q100_near_lossless():
    img = _smooth_gray()
    dec = jpeg.decode(jpeg.encode(img, quality=100))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_gray_quality_ladder():
    img = _smooth_gray()
    last = None
    for q in (95, 75, 50):
        blob = jpeg.encode(img, quality=q)
        if last is not None:
            assert len(blob) < last        # lower quality, smaller file
        last = len(blob)
        dec = jpeg.decode(blob)
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.mean() < 2.5


def test_color_444_and_420_roundtrip_odd_sizes():
    for (h, w) in ((48, 40), (45, 37), (16, 16), (9, 11)):
        img = _smooth_rgb(h, w)
        for sub in ("444", "420"):
            dec = jpeg.decode(jpeg.encode(img, quality=92,
                                          subsampling=sub))
            assert dec.shape == img.shape, (h, w, sub)
            err = np.abs(dec.astype(int) - img.astype(int))
            assert err.mean() < 4, (h, w, sub, err.mean())


def test_gray_constant_tiny():
    img = np.full((8, 8), 77, np.uint8)
    dec = jpeg.decode(jpeg.encode(img, quality=90))
    assert np.abs(dec.astype(int) - 77).max() <= 1


def _imageio(spark):
    return spark._jvm.javax.imageio.ImageIO


def _bytes_in(spark, blob: bytes):
    return spark._jvm.java.io.ByteArrayInputStream(bytearray(blob))


def test_imageio_decodes_engine_gray(spark):
    """Referee direction 1: the JDK codec reads engine JPEG bytes and
    sees (almost) the same image the engine decoder sees."""
    img = _smooth_gray(40, 32)
    blob = jpeg.encode(img, quality=95)
    bimg = _imageio(spark).read(_bytes_in(spark, blob))
    assert bimg is not None, "ImageIO rejected engine JPEG"
    assert bimg.getWidth() == 32 and bimg.getHeight() == 40
    # NOTE: getRGB on TYPE_BYTE_GRAY gamma-converts linear->sRGB;
    # the raw raster is the comparable surface
    ras = bimg.getRaster()
    got = np.zeros((40, 32), np.int64)
    for y in range(40):
        for x in range(32):
            got[y, x] = ras.getSample(x, y, 0)
    ours = jpeg.decode(blob).astype(np.int64)
    assert np.abs(got - ours).max() <= 4          # IDCT latitude
    assert np.abs(got - img.astype(np.int64)).mean() < 6


def test_imageio_decodes_engine_color(spark):
    img = _smooth_rgb(32, 32)
    for sub in ("444", "420"):
        blob = jpeg.encode(img, quality=95, subsampling=sub)
        bimg = _imageio(spark).read(_bytes_in(spark, blob))
        assert bimg is not None
        got = np.zeros((32, 32, 3), np.int64)
        for y in range(32):
            for x in range(32):
                v = bimg.getRGB(x, y)
                got[y, x] = ((v >> 16) & 0xFF, (v >> 8) & 0xFF,
                             v & 0xFF)
        err = np.abs(got - img.astype(np.int64))
        assert err.mean() < 8, (sub, err.mean())


def test_engine_decodes_imageio_jpeg(spark):
    """Referee direction 2: a JPEG written by the JDK codec (gray via
    the engine's own PNG as the lossless bridge) decodes through the
    engine to (almost) what ImageIO itself sees."""
    jvm = spark._jvm
    img = _smooth_gray(40, 32)
    bimg = _imageio(spark).read(
        _bytes_in(spark, png.encode_gray8(img)))
    baos = jvm.java.io.ByteArrayOutputStream()
    assert _imageio(spark).write(bimg, "jpg", baos)
    blob = bytes(baos.toByteArray())
    ours = jpeg.decode(blob)
    assert ours.shape == (40, 32)
    ref = _imageio(spark).read(_bytes_in(spark, blob))
    ras = ref.getRaster()
    theirs = np.zeros((40, 32), np.int64)
    for y in range(40):
        for x in range(32):
            theirs[y, x] = ras.getSample(x, y, 0)
    assert np.abs(ours.astype(np.int64) - theirs).max() <= 4
    assert np.abs(ours.astype(np.int64)
                  - img.astype(np.int64)).mean() < 8


def test_multimodal_jpeg_container(spark):
    from parquet_go_spark.operators import multimodal as mm

    sf = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf}/documents.parquet").limit(40)
    out = mm.attach_media(df, container="jpeg").collect()
    n_img = 0
    for r in out:
        if r["fmt"] != "jpeg":
            continue
        n_img += 1
        dec = mm.decode_media(bytes(r["media"]), r["fmt"],
                              r["width"], r["height"])
        assert dec.shape == (1, r["height"], r["width"])
    assert n_img > 0


def test_jpeg_fuzz_never_hangs():
    """Truncations and byte flips raise clean errors in bounded time —
    never hang, overallocate, or crash (frame.py fuzz discipline)."""
    import struct as structmod
    import time

    img = _smooth_gray(32, 24)
    blob = jpeg.encode(img, quality=80)
    ok = (ValueError, KeyError, IndexError, OverflowError,
          structmod.error, ZeroDivisionError)
    t0 = time.time()
    for cut in range(0, len(blob), 7):
        try:
            jpeg.decode(blob[:cut])
        except ok:
            pass
    rng = np.random.default_rng(4)
    for _ in range(300):
        mut = bytearray(blob)
        i = int(rng.integers(2, len(mut)))
        mut[i] ^= int(rng.integers(1, 256))
        try:
            out = jpeg.decode(bytes(mut))
            assert out.ndim in (2, 3)      # or decodes to SOME image
        except ok:
            pass
    assert time.time() - t0 < 60


def test_jpeg_lying_sof_refused():
    img = _smooth_gray(16, 16)
    blob = bytearray(jpeg.encode(img, quality=80))
    i = blob.find(b"\xff\xc0")
    # SOF payload: len(2) prec(1) h(2) w(2) — lie about h and w
    blob[i + 5:i + 9] = b"\xff\xff\xff\xff"
    with pytest.raises(ValueError, match="implausible"):
        jpeg.decode(bytes(blob))
