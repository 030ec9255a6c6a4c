"""Minimal pure-stdlib PNG codec (grayscale, 8-bit, non-interlaced).

Closes the multimodal decode_media stub without new dependencies: zlib
is in the stdlib, and PNG's container is just length-tagged CRC'd
chunks around a DEFLATE stream of filtered scanlines (RFC 2083). The
encoder writes filter 0 (None) scanlines; the decoder is a real spec
decoder for the grayscale-8 subset — it verifies the signature, every
chunk CRC, the IHDR geometry, and reverses all five scanline filters
(None/Sub/Up/Average/Paeth), so PNGs from other writers decode too.

Scope (deliberate): color type 0, bit depth 8, no interlace, no
ancillary-chunk interpretation (they are CRC-checked and skipped).
Anything else raises ValueError — same defensive posture as frame.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"
MAX_DIM = 1 << 16  # defensive cap, same spirit as frame.py's count caps


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload)))


def encode_gray8(img: np.ndarray, level: int = 6) -> bytes:
    """(h, w) uint8 -> PNG bytes (filter 0 scanlines)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError(f"expected (h, w), got shape {img.shape}")
    h, w = img.shape
    if not (0 < w <= MAX_DIM and 0 < h <= MAX_DIM):
        raise ValueError(f"unsupported dimensions {w}x{h}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    scan = np.zeros((h, w + 1), dtype=np.uint8)
    scan[:, 1:] = img  # leading 0 = filter type None per scanline
    idat = zlib.compress(scan.tobytes(), level)
    return (SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def _unfilter(raw: np.ndarray, h: int, w: int) -> np.ndarray:
    """Reverse per-scanline filters for bpp=1 (grayscale 8)."""
    rows = raw.reshape(h, w + 1)
    out = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        t = int(rows[y, 0])
        line = rows[y, 1:].copy()
        if t == 0:
            cur = line
        elif t == 1:  # Sub: running sum along x, mod 256
            cur = np.add.accumulate(line, dtype=np.uint8)
        elif t == 2:  # Up
            cur = line + prev
        elif t == 3:  # Average — sequential in x
            cur = np.empty(w, dtype=np.uint8)
            left = 0
            for x in range(w):
                left = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
                cur[x] = left
        elif t == 4:  # Paeth — sequential in x
            cur = np.empty(w, dtype=np.uint8)
            left = 0
            for x in range(w):
                up = int(prev[x])
                ul = int(prev[x - 1]) if x else 0
                p = left + up - ul
                pa_, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa_ <= pb and pa_ <= pc) else (
                    up if pb <= pc else ul)
                left = (int(line[x]) + pred) & 0xFF
                cur[x] = left
        else:
            raise ValueError(f"unknown scanline filter {t}")
        out[y] = cur
        prev = cur
    return out


def decode_gray8(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w) uint8. Verifies signature, chunk CRCs, and
    the grayscale-8 IHDR contract; reverses all five filters."""
    if data[:8] != SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat, ended = 8, None, [], False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4: pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError("truncated chunk body")
        payload = data[pos + 8: pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != zlib.crc32(tag + payload):
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = payload
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None or not idat or not ended:
        raise ValueError("missing IHDR/IDAT/IEND")
    w, h, depth, ctype, comp, filt, ilace = struct.unpack(">IIBBBBB", ihdr)
    if (depth, ctype, comp, filt, ilace) != (8, 0, 0, 0, 0):
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={ctype}, "
            f"interlace={ilace}); this decoder covers grayscale-8 only")
    if not (0 < w <= MAX_DIM and 0 < h <= MAX_DIM):
        raise ValueError(f"unsupported dimensions {w}x{h}")
    raw = zlib.decompress(b"".join(idat), bufsize=h * (w + 1))
    if len(raw) != h * (w + 1):
        raise ValueError(
            f"scanline payload is {len(raw)} bytes, expected {h * (w + 1)}")
    return _unfilter(np.frombuffer(raw, dtype=np.uint8), h, w)
