"""MJPEG-in-AVI container codec — pure numpy/stdlib RIFF walk.

Closes the last multimodal stub (r3 verdict #8): video payloads get a
real container instead of a raw reshape. Format per the public RIFF /
AVI 1.0 spec (msdn AVIMAINHEADER/AVISTREAMHEADER/BITMAPINFOHEADER
layouts); each frame is a baseline JPEG produced/consumed by the
engine's own jpeg.py (itself refereed against JDK imageio in
tests/test_jpeg.py), so the only new surface here is the container
walk. The reference has no video codec at all — this is engine-side
scope beyond parity, sized for the mapInPandas/mapInArrow media lanes
(multimodal.py): encode and decode are per-value by nature (variable-
size compressed frames), vectorization lives inside the JPEG kernels.
"""

from __future__ import annotations

import struct

import numpy as np

from . import jpeg as jpegmod


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode_mjpeg(frames: np.ndarray, fps: int = 25,
                 quality: int = 90) -> bytes:
    """(F, H, W) uint8 grayscale -> MJPEG AVI bytes (one keyframe JPEG
    per '00dc' chunk, idx1 index, AVIF_HASINDEX)."""
    if frames.ndim != 3:
        raise ValueError("encode_mjpeg expects (frames, h, w)")
    nf, h, w = frames.shape
    jpgs = [jpegmod.encode(frames[i], quality) for i in range(nf)]
    avih = struct.pack(
        "<10I", 1_000_000 // max(fps, 1), 0, 0, 0x10, nf, 0, 1,
        max((len(j) for j in jpgs), default=0), w, h) + b"\x00" * 16
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, max(fps, 1), 0, nf, 0,
                                            0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_body = bytearray()
    idx = bytearray()
    for j in jpgs:
        # idx1 offsets are relative to the 'movi' fourcc position
        off = 4 + len(movi_body)
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        movi_body += _chunk(b"00dc", j)
    movi = _list(b"movi", bytes(movi_body))
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(mv: memoryview, pos: int, end: int):
    while pos + 8 <= end:
        fourcc = bytes(mv[pos:pos + 4])
        (size,) = struct.unpack_from("<I", mv, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError("AVI: chunk exceeds container")
        yield fourcc, body, size
        pos = body + size + (size & 1)


def decode_mjpeg(data: bytes, max_frames: int | None = None,
                 every: int = 1) -> np.ndarray:
    """MJPEG AVI bytes -> (F, H, W) uint8. ``every`` samples every n-th
    frame WITHOUT decoding the skipped ones (the container walk is
    metadata-scale; only kept JPEG payloads hit the codec)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    mv = memoryview(data)
    (riff_size,) = struct.unpack_from("<I", mv, 4)
    end = min(len(data), 8 + riff_size)
    frames = []
    seen = 0
    for fourcc, body, size in _iter_chunks(mv, 12, end):
        if fourcc != b"LIST" or bytes(mv[body:body + 4]) != b"movi":
            continue
        for cc, b2, s2 in _iter_chunks(mv, body + 4, body + size):
            if cc not in (b"00dc", b"00db"):
                continue
            if seen % every == 0:
                frames.append(jpegmod.decode(bytes(mv[b2:b2 + s2])))
                if max_frames is not None and len(frames) >= max_frames:
                    break
            seen += 1
        break
    if not frames:
        raise ValueError("AVI: no video frames found")
    first = frames[0]
    if any(f.shape != first.shape for f in frames):
        raise ValueError("AVI: frame size changes mid-stream")
    return np.stack(frames)


def probe(data: bytes) -> dict:
    """Container metadata WITHOUT decoding any frame: width/height/
    frame count/fps from avih (one header read, the 100 TB posture
    for metadata extraction)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    mv = memoryview(data)
    for fourcc, body, size in _iter_chunks(mv, 12, len(data)):
        if fourcc == b"LIST" and bytes(mv[body:body + 4]) == b"hdrl":
            for cc, b2, s2 in _iter_chunks(mv, body + 4, body + size):
                if cc == b"avih" and s2 >= 40:
                    us, _, _, flags, nf, _, _, _, w, h = \
                        struct.unpack_from("<10I", mv, b2)
                    return {"width": w, "height": h, "frames": nf,
                            "fps": round(1_000_000 / us) if us else 0}
    raise ValueError("AVI: no avih header")
