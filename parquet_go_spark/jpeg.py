"""Baseline JPEG (ITU-T T.81 / ISO 10918-1), pure stdlib + numpy.

Closes the media-codec stub the same way png.py did for PNG: a real
spec codec with no external image libraries. Scope is baseline
sequential DCT (SOF0) — the profile every JPEG decoder must support:

  * encoder: grayscale (1 component) and YCbCr 4:2:0 / 4:4:4 colour,
    Annex-K quantization tables scaled by the IJG quality formula,
    per-image OPTIMAL Huffman tables (two-pass, length-limited to 16
    bits with the IJG adjust procedure, all-ones code reserved) emitted
    via DHT — smaller files than the fixed Annex-K code tables;
  * decoder: any baseline SOF0 stream — DQT/DHT/SOF0/SOS/DRI/RSTn,
    interleaved MCUs, arbitrary sampling factors up to 2x2, byte
    unstuffing, dequant + IDCT + chroma upsampling + BT.601 to RGB.

DCT/IDCT ride numpy matrix products; entropy coding is per-symbol
Python (correct-first — thumbnails are small and batch through
mapInPandas; the hot token path never touches media).

External referee (tests/test_jpeg.py): the JDK's javax.imageio codec
via Spark's py4j gateway decodes engine-encoded JPEGs (pixel-close,
lossy codec) and engine decodes ImageIO-encoded ones.

Reference scope note: hangxie/parquet-go stores media as opaque BYTE_
ARRAY payloads; this codec exists for the multimodal operator family
(operators/multimodal.py), not for parity with a reference feature.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 quantization tables (raster order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int64)


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int64)


def _dct_mat() -> np.ndarray:
    x = np.arange(8)
    d = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    d[0] *= np.sqrt(0.5)
    return d * 0.5


_D = _dct_mat()


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) multiple-of-8 plane -> (n, 8, 8) blocks, raster order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _unblocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (blocks.reshape(h // 8, w // 8, 8, 8)
            .transpose(0, 2, 1, 3).reshape(h, w))


def _pad_to8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


# ------------------------------------------------------------ bit I/O

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)       # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.put(0x7F, 8 - self.n)      # pad with 1-bits


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: truncated entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                m = self.data[self.pos] if self.pos < len(self.data) \
                    else 0
                if m == 0x00:
                    self.pos += 1           # stuffed FF
                else:
                    raise _MarkerHit(m)
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.n = 0


class _MarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# --------------------------------------------------- optimal Huffman

def _huff_lengths(freq: dict[int, int]) -> dict[int, int]:
    """Symbol -> code length, limited to 16 bits (IJG adjust). A
    pseudo-symbol (256) reserves the all-ones code."""
    f = dict(freq)
    f[256] = 1
    if len(f) == 1:
        return {s: 1 for s in f}
    heap = [(n, i, (s,)) for i, (s, n) in enumerate(sorted(f.items()))]
    heapq.heapify(heap)
    depth: dict[int, int] = {s: 0 for s in f}
    while len(heap) > 1:
        n1, _, s1 = heapq.heappop(heap)
        n2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (n1 + n2, id(s1), s1 + s2))
    # length-limit to 16 (move overflowing pairs down, IJG K.2 style)
    counts = [0] * 33
    for s, li in depth.items():
        counts[min(li, 32)] += 1
    for li in range(32, 16, -1):
        while counts[li] > 0:
            j = li - 2
            while counts[j] == 0:
                j -= 1
            counts[li] -= 2
            counts[li - 1] += 1
            counts[j] -= 1
            counts[j + 1] += 2
    # reassign lengths: longest codes to rarest symbols; the pseudo-
    # symbol 256 sorts rarest-of-all so it owns the longest code (and
    # with it the all-ones pattern, which real symbols must never use)
    order = sorted(depth, key=lambda s: (f[s], 0 if s == 256 else 1, s))
    out: dict[int, int] = {}
    it = iter(order)
    for length in range(16, 0, -1):
        for _ in range(counts[length]):
            out[next(it)] = length
    return out


def _canonical(lengths: dict[int, int]):
    """-> (bits[1..16] counts, symbol list, {sym: (code, len)}).
    The pseudo-symbol 256 sorts last at its length, taking the
    all-ones code, and is dropped from the emitted table."""
    bysym = sorted(lengths.items(), key=lambda kv: (kv[1],
                                                    kv[0] == 256,
                                                    kv[0]))
    code = 0
    prev_len = 0
    codes: dict[int, tuple[int, int]] = {}
    bits = [0] * 17
    symbols = []
    for s, li in bysym:
        code <<= (li - prev_len)
        prev_len = li
        if s != 256:
            codes[s] = (code, li)
            bits[li] += 1
            symbols.append(s)
        code += 1
    return bits, symbols, codes


# --------------------------------------------------------- encoding

def _encode_block_syms(q: np.ndarray, pred: int):
    """Quantized zigzag block -> (dc_sym, dc_bits, [(ac_sym, bits)])."""
    dc = int(q[0]) - pred
    s = _category(dc)
    dc_extra = dc if dc >= 0 else dc + (1 << s) - 1
    acs = []
    run = 0
    nz = np.flatnonzero(q[1:])
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, 0, 0))        # ZRL
            run -= 16
        sz = _category(v)
        extra = v if v >= 0 else v + (1 << sz) - 1
        acs.append(((run << 4) | sz, extra, sz))
        run = 0
    if last < 63:
        acs.append((0x00, 0, 0))            # EOB
    return (s, dc_extra), acs


def _plane_blocks_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    b = _blocks(plane.astype(np.float64) - 128.0)
    coeffs = np.einsum("ux,nxy,vy->nuv", _D, b, _D)
    q = np.round(coeffs.reshape(-1, 64) / qt[None, :])
    return q[:, ZIGZAG].astype(np.int64)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht(tc: int, th: int, bits, symbols) -> bytes:
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits[1:17])
                + bytes(symbols))


def _dqt(tq: int, table_raster: np.ndarray) -> bytes:
    return _seg(0xDB, bytes([tq]) + bytes(int(x) for x in
                                          table_raster[ZIGZAG]))


def encode(img: np.ndarray, quality: int = 85,
           subsampling: str = "420") -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB -> baseline JPEG."""
    img = np.asarray(img, np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qt_l = _quality_scale(QT_LUMA, quality)
    if gray:
        planes = [(_pad_to8(img), qt_l, 0, (1, 1))]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        qt_c = _quality_scale(QT_CHROMA, quality)
        if subsampling == "420":
            ph = _pad_to8(np.clip(np.round(y), 0, 255))
            # pad luma to 16x16 MCU grid
            ph = np.pad(ph, ((0, -ph.shape[0] % 16),
                             (0, -ph.shape[1] % 16)), mode="edge")
            cbs = cb[::2, ::2]
            crs = cr[::2, ::2]
            # average 2x2 for fidelity when shape allows
            if h % 2 == 0 and w % 2 == 0:
                cbs = cb.reshape(h // 2, 2, w // 2, 2).mean((1, 3))
                crs = cr.reshape(h // 2, 2, w // 2, 2).mean((1, 3))
            cbp = _pad_to8(np.clip(np.round(cbs), 0, 255))
            crp = _pad_to8(np.clip(np.round(crs), 0, 255))
            # chroma must cover luma/2
            need_h, need_w = ph.shape[0] // 2, ph.shape[1] // 2
            cbp = np.pad(cbp, ((0, need_h - cbp.shape[0]),
                               (0, need_w - cbp.shape[1])), mode="edge")
            crp = np.pad(crp, ((0, need_h - crp.shape[0]),
                               (0, need_w - crp.shape[1])), mode="edge")
            planes = [(ph, qt_l, 0, (2, 2)), (cbp, qt_c, 1, (1, 1)),
                      (crp, qt_c, 1, (1, 1))]
        else:
            planes = [
                (_pad_to8(np.clip(np.round(y), 0, 255)), qt_l, 0,
                 (1, 1)),
                (_pad_to8(np.clip(np.round(cb), 0, 255)), qt_c, 1,
                 (1, 1)),
                (_pad_to8(np.clip(np.round(cr), 0, 255)), qt_c, 1,
                 (1, 1))]

    qblocks = [_plane_blocks_quant(p, qt) for p, qt, _, _ in planes]

    # MCU-ordered block sequence per component
    def mcu_order(ci):
        p, _, _, (sh, sv) = planes[ci]
        bh, bw = p.shape[0] // 8, p.shape[1] // 8
        if sh == 1 and sv == 1 and len(planes) > 1 and ci == 0 and \
                subsampling == "420":
            raise AssertionError
        if len(planes) == 1 or subsampling != "420":
            idx = np.arange(bh * bw)
            return qblocks[ci][idx]
        if ci == 0:                          # 2x2 luma: 4 per MCU
            mh, mw = bh // 2, bw // 2
            order = []
            for my in range(mh):
                for mx in range(mw):
                    for dy in range(2):
                        for dx in range(2):
                            order.append((my * 2 + dy) * bw
                                         + mx * 2 + dx)
            return qblocks[ci][np.array(order)]
        return qblocks[ci]

    ordered = [mcu_order(ci) for ci in range(len(planes))]

    # two passes: symbol stats -> optimal tables -> emit
    dc_freq = [dict() for _ in range(2)]
    ac_freq = [dict() for _ in range(2)]
    comp_syms = []
    for ci, q in enumerate(ordered):
        tbl = planes[ci][2]
        pred = 0
        syms = []
        for blk in q:
            (s, extra), acs = _encode_block_syms(blk, pred)
            pred = int(blk[0])
            dc_freq[tbl][s] = dc_freq[tbl].get(s, 0) + 1
            for sym, _, _ in acs:
                ac_freq[tbl][sym] = ac_freq[tbl].get(sym, 0) + 1
            syms.append(((s, extra), acs))
        comp_syms.append(syms)

    n_tbl = 2 if len(planes) > 1 else 1
    dc_tabs, ac_tabs = [], []
    for t in range(n_tbl):
        dc_tabs.append(_canonical(_huff_lengths(dc_freq[t] or {0: 1})))
        ac_tabs.append(_canonical(_huff_lengths(ac_freq[t] or {0: 1})))

    out = bytearray(b"\xff\xd8")                      # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt(0, qt_l)
    if len(planes) > 1:
        out += _dqt(1, _quality_scale(QT_CHROMA, quality))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci, (_, _, tq, (sh, sv)) in enumerate(planes):
        sof += bytes([ci + 1, (sh << 4) | sv, tq])
    out += _seg(0xC0, sof)
    for t in range(n_tbl):
        out += _dht(0, t, dc_tabs[t][0], dc_tabs[t][1])
        out += _dht(1, t, ac_tabs[t][0], ac_tabs[t][1])
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        t = planes[ci][2]
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)

    bw_ = _BitWriter()
    n_mcus = (len(ordered[0]) // (4 if (len(planes) > 1 and
                                       subsampling == "420") else 1))
    per_mcu = [(4 if (len(planes) > 1 and subsampling == "420"
                      and ci == 0) else 1)
               for ci in range(len(planes))]
    pos = [0] * len(planes)
    for _ in range(n_mcus):
        for ci in range(len(planes)):
            t = planes[ci][2]
            dc_codes = dc_tabs[t][2]
            ac_codes = ac_tabs[t][2]
            for _ in range(per_mcu[ci]):
                (s, extra), acs = comp_syms[ci][pos[ci]]
                pos[ci] += 1
                c, li = dc_codes[s]
                bw_.put(c, li)
                if s:
                    bw_.put(extra, s)
                for sym, ex, sz in acs:
                    c, li = ac_codes[sym]
                    bw_.put(c, li)
                    if sz:
                        bw_.put(ex, sz)
    bw_.flush()
    out += bw_.out
    out += b"\xff\xd9"                                # EOI
    return bytes(out)


# --------------------------------------------------------- decoding

def _parse_dht(payload: bytes, tabs: dict) -> None:
    pos = 0
    while pos < len(payload):
        tc_th = payload[pos]
        bits = payload[pos + 1: pos + 17]
        n = sum(bits)
        symbols = payload[pos + 17: pos + 17 + n]
        pos += 17 + n
        lut = {}
        code = 0
        k = 0
        for li in range(1, 17):
            for _ in range(bits[li - 1]):
                lut[(li, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1
        tabs[(tc_th >> 4, tc_th & 0x0F)] = lut


def _read_sym(br: _BitReader, lut: dict) -> int:
    code = 0
    for li in range(1, 17):
        code = (code << 1) | br.bit()
        s = lut.get((li, code))
        if s is not None:
            return s
    raise ValueError("jpeg: invalid huffman code")


def decode(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 (H, W) or (H, W, 3) RGB array."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict = {}
    comps = None
    h = w = 0
    restart = 0
    while True:
        if pos + 4 > len(data):
            raise ValueError("jpeg: truncated before SOS")
        if data[pos] != 0xFF:
            raise ValueError("jpeg: bad marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:
            raise ValueError("jpeg: no scan data")
        ln = struct.unpack(">H", data[pos + 2: pos + 4])[0]
        payload = data[pos + 4: pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq:
                    t = np.frombuffer(payload[p:p + 128],
                                      ">u2").astype(np.int64)
                    p += 128
                else:
                    t = np.frombuffer(payload[p:p + 64],
                                      np.uint8).astype(np.int64)
                    p += 64
                raster = np.empty(64, np.int64)
                raster[ZIGZAG] = t
                qts[tq] = raster
        elif marker == 0xC4:
            _parse_dht(payload, huff)
        elif marker == 0xC0 or marker == 0xC1:
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError("jpeg: only 8-bit baseline supported")
            # defensive bound (frame.py discipline): a lying SOF must
            # fail BEFORE any allocation sized by it
            if not (0 < h and 0 < w and h * w <= (1 << 26)):
                raise ValueError(f"jpeg: implausible dimensions "
                                 f"{w}x{h}")
            if not (1 <= nc <= 4):
                raise ValueError(f"jpeg: implausible component count "
                                 f"{nc}")
            comps = []
            for ci in range(nc):
                cid, sf, tq = payload[6 + ci * 3: 9 + ci * 3]
                sh, sv = sf >> 4, sf & 0x0F
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    raise ValueError(
                        f"jpeg: implausible sampling {sh}x{sv}")
                comps.append({"id": cid, "sh": sh, "sv": sv,
                              "tq": tq})
        elif marker in (0xC2, 0xC3) or 0xC5 <= marker <= 0xCF and \
                marker != 0xC8 and marker != 0xC4:
            raise ValueError(
                f"jpeg: non-baseline frame 0xFF{marker:02X} unsupported")
        elif marker == 0xDD:
            restart = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:
            if comps is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = payload[0]
            scan = []
            for i in range(ns):
                cid, tt = payload[1 + 2 * i: 3 + 2 * i]
                c = next((c for c in comps if c["id"] == cid), None)
                if c is None:
                    raise ValueError(f"jpeg: SOS names unknown "
                                     f"component {cid}")
                c["td"], c["ta"] = tt >> 4, tt & 0x0F
                scan.append(c)
            break
    hmax = max(c["sh"] for c in comps)
    vmax = max(c["sv"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["sh"]
        c["bh"] = mcuy * c["sv"]
        c["blocks"] = np.zeros((c["bh"] * c["bw"], 8, 8), np.float64)
        c["pred"] = 0
    br = _BitReader(data, pos)
    mcu = 0
    total = mcux * mcuy
    while mcu < total:
        try:
            my, mx = divmod(mcu, mcux)
            for c in comps:
                lut_d = huff[(0, c["td"])]
                lut_a = huff[(1, c["ta"])]
                qt = qts[c["tq"]]
                for dy in range(c["sv"]):
                    for dx in range(c["sh"]):
                        zz = np.zeros(64, np.int64)
                        s = _read_sym(br, lut_d)
                        diff = _extend(br.bits(s), s) if s else 0
                        c["pred"] += diff
                        zz[0] = c["pred"]
                        k = 1
                        while k < 64:
                            sym = _read_sym(br, lut_a)
                            if sym == 0x00:
                                break
                            if sym == 0xF0:
                                k += 16
                                continue
                            k += sym >> 4
                            sz = sym & 0x0F
                            if k > 63:
                                raise ValueError("jpeg: AC overflow")
                            zz[k] = _extend(br.bits(sz), sz)
                            k += 1
                        coeff = np.empty(64, np.float64)
                        coeff[ZIGZAG] = zz          # un-zigzag first,
                        coeff *= qt                 # dequant in raster
                        blk = _D.T @ coeff.reshape(8, 8) @ _D
                        bi = ((my * c["sv"] + dy) * c["bw"]
                              + mx * c["sh"] + dx)
                        c["blocks"][bi] = blk
            mcu += 1
            if restart and mcu % restart == 0 and mcu < total:
                br.align()
                if br.pos + 2 <= len(data) and \
                        data[br.pos] == 0xFF and \
                        0xD0 <= data[br.pos + 1] <= 0xD7:
                    br.pos += 2
                for c in comps:
                    c["pred"] = 0
        except _MarkerHit as mh:
            if 0xD0 <= mh.marker <= 0xD7:       # RSTn
                br.pos += 1                      # past the marker byte
                br.align()
                for c in comps:
                    c["pred"] = 0
                continue
            if mh.marker == 0xD9:
                break
            raise ValueError(f"jpeg: unexpected marker {mh.marker:02x}")
    planes = []
    for c in comps:
        p = _unblocks(c["blocks"], c["bh"] * 8, c["bw"] * 8) + 128.0
        # upsample to full resolution
        ry, rx = vmax // c["sv"], hmax // c["sh"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
