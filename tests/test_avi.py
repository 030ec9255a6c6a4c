"""MJPEG-in-AVI container codec (avi.py) + the multimodal avi lane."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_spark import avi, jpeg


def _frames(nf=5, h=48, w=64):
    base = np.linspace(0, 255, w, dtype=np.uint8)[None, :].repeat(h, 0)
    return np.stack([np.clip(base.astype(int) + 5 * i, 0, 255)
                     .astype(np.uint8) for i in range(nf)])


def test_roundtrip_and_probe():
    f = _frames()
    blob = avi.encode_mjpeg(f, fps=10, quality=95)
    assert avi.probe(blob) == {"width": 64, "height": 48,
                               "frames": 5, "fps": 10}
    out = avi.decode_mjpeg(blob)
    assert out.shape == f.shape
    assert np.abs(out.astype(int) - f.astype(int)).max() <= 2
    # frame sampling decodes ONLY kept frames
    s = avi.decode_mjpeg(blob, every=2)
    assert s.shape == (3, 48, 64)
    assert np.array_equal(s, out[::2])
    m = avi.decode_mjpeg(blob, max_frames=2)
    assert m.shape == (2, 48, 64)


def test_container_is_structurally_avi():
    blob = avi.encode_mjpeg(_frames(2), fps=25)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
    assert b"MJPG" in blob[:300] and b"movi" in blob and b"idx1" in blob
    # each frame chunk is a standalone baseline JPEG
    pos = blob.index(b"00dc")
    import struct
    (size,) = struct.unpack_from("<I", blob, pos + 4)
    frame = blob[pos + 8:pos + 8 + size]
    assert frame[:2] == b"\xff\xd8" and frame[-2:] == b"\xff\xd9"
    img = jpeg.decode(frame)
    assert img.shape == (48, 64)


def test_refuses_garbage():
    with pytest.raises(ValueError):
        avi.decode_mjpeg(b"not an avi at all")
    with pytest.raises(ValueError):
        avi.probe(b"RIFFxxxxWAVE")
    # truncated container refuses instead of over-reading
    blob = avi.encode_mjpeg(_frames(3))
    with pytest.raises(ValueError):
        avi.decode_mjpeg(blob[:40] + b"\x00" * 4)


def test_multimodal_avi_lane(spark):
    from parquet_go_spark.operators import multimodal as mm

    df = spark.range(40).selectExpr(
        "id AS doc_id", "CAST(17 + id * 13 AS BIGINT) AS n_chars")
    out = mm.attach_media(df, container="avi").collect()
    saw_avi = 0
    for r in out:
        if r["fmt"] == "avi":
            saw_avi += 1
            dec = mm.decode_media(bytes(r["media"]), "avi",
                                  r["width"], r["height"])
            assert dec.shape == (r["frames"], r["height"], r["width"])
            meta = avi.probe(bytes(r["media"]))
            assert meta["width"] == r["width"]
            assert meta["height"] == r["height"]
            assert meta["frames"] == r["frames"]
        else:
            assert r["fmt"] == "jpeg"
    assert saw_avi > 0
    with pytest.raises(ValueError):
        mm.decode_media(b"xx", "mp4", 1, 1)


def test_thumbnail_query_decodes_avi(spark):
    """The thumbnail lane must decode AVI containers, not reshape the
    compressed bytes (review finding r4)."""
    from parquet_go_spark.operators.multimodal import thumbnail_query

    rows = thumbnail_query(spark, "/root/testdata/sf0.001",
                           container="avi").limit(20).collect()
    assert rows
    for r in rows:
        assert len(r["thumb"]) == r["thumb_frames"] * 64
