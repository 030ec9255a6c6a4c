"""Interleaved rANS entropy coder over small-range integers.

The reference's encoding menu (PLAIN / dict / RLE / delta — SURVEY §2.1)
tops out at the block compressor's entropy stage: parquet-go never codes
values below their bit width, so skewed-but-high-cardinality columns
(token ids under a Zipf law) stay ~1.5 bits/value above their Shannon
floor even after zstd. This codec closes that gap with range-variant ANS
(Duda, "Asymmetric numeral systems", arXiv:1311.2540), in the 64-bit
state / 32-bit renormalization layout popularized by the public-domain
ryg_rans implementation — re-derived here as a *lane-interleaved* numpy
kernel: L independent rANS streams advance in lockstep down the rows of
a (rows, L) reshape of the value array, so every state update, gather,
and renormalization is one vectorized operation across lanes ("no
per-row Python", per the input hint). The same interleaving is what
SIMD/GPU rANS coders use; here the "SIMD width" is the lane count.

Layout of one encoded blob (all little-endian):

    header  : k, freq_bit_width, L, n, vmin, nfreq, stream_words (32 B)
    freqs   : nfreq quantized frequencies, bit-packed at freq_bit_width
    states  : L x u64 final encoder states (decoder starts from these)
    stream  : stream_words x u32 renormalization words, in decoder order

Frequencies are quantized to sum exactly 2**k (largest-remainder with a
>=1 floor for present symbols); absent symbols keep frequency 0 and get
no slots. Values are shifted by vmin so the alphabet is 0..nfreq-1; the
codec applies to any integer chunk whose span fits MAX_NFREQ.

Invariants (checked by construction, verified in tests):
  * state x always lies in [2**31, 2**63), so renormalization emits or
    consumes at most ONE 32-bit word per symbol per lane — the encode
    and decode masks are single conditionals, not loops;
  * encoder walks rows last->first and the emitted words are reversed
    row-blocks, so the decoder reads the stream strictly forward;
  * decoder's final states must equal the encoder's initial states
    (RANS_L) — a free end-to-end integrity check.

Defensive decode mirrors the reference's validateCount/page-cap rules
(/root/reference/internal/encoding/encodingread.go:9-27): bounds on k,
L, nfreq and n, frequency-sum check, and truncated-stream detection.
"""

from __future__ import annotations

import struct

import numpy as np

from . import bitpack

RANS_L = np.uint64(1 << 31)          # lower bound of the state interval
_MASK32 = np.uint64(0xFFFFFFFF)
MAX_NFREQ = 1 << 17                  # alphabet-span gate
MAX_LANES = 1 << 15
MAX_ROWS = 1 << 14   # with MAX_LANES this admits 536M values per blob —
                     # far above what frame.MAX_PAYLOAD can hold, but it
                     # bounds the decode loop against corrupted counts
MIN_K, MAX_K = 10, 20

_HDR = struct.Struct("<BBHIQqII")    # k fbw pad L n vmin nfreq stream_words


def applicable(vmin: int, vmax: int, n: int) -> bool:
    return n > 0 and (vmax - vmin) < MAX_NFREQ


def _pick_k(nfreq: int) -> int:
    return int(np.clip(max(nfreq - 1, 1).bit_length() + 4, MIN_K, MAX_K))


def _pick_lanes(n: int) -> int:
    # Every lane flushes an 8-byte final state, so lane count is pure
    # size overhead: n//1024 cost 0.0625 bits/value — ~0.7% of the token
    # store. n//8192 cuts that 8x (measured -0.043 bits/value on a Zipf
    # alphabet; C encode got FASTER, decode unchanged). The floor keeps
    # rows within MAX_ROWS; the numpy fallback's vector width shrinks
    # accordingly (the C twin is the production path). Lane count is
    # self-described in the header, so blobs written under any previous
    # policy keep decoding.
    if n < 4:
        return max(n, 1)
    floor_lanes = -(-n // MAX_ROWS)
    return int(np.clip(max(n // 8192, floor_lanes), 4, MAX_LANES))


def quantize_freqs(counts: np.ndarray, k: int) -> np.ndarray:
    """Scale counts to sum exactly 2**k; present symbols keep freq >= 1."""
    m = 1 << k
    total = int(counts.sum())
    present = counts > 0
    npresent = int(np.count_nonzero(present))
    if npresent == 0:
        raise ValueError("cannot quantize empty distribution")
    if npresent > m:
        raise ValueError("alphabet larger than quantization range")
    f = np.zeros(len(counts), dtype=np.int64)
    scaled = counts[present].astype(np.float64) * (m / total)
    fp = np.maximum(np.floor(scaled).astype(np.int64), 1)
    diff = m - int(fp.sum())
    if diff > 0:
        # hand surplus to the largest remainders (they lose the most)
        order = np.argsort(-(scaled - fp))
        fp[order[:diff]] += 1
    elif diff < 0:
        # reclaim from the largest frequencies, never below 1
        need = -diff
        order = np.argsort(-fp)
        avail = fp[order] - 1
        cum = np.cumsum(avail)
        full = int(np.searchsorted(cum, need))
        fp[order[:full]] = 1
        taken = int(cum[full - 1]) if full else 0
        if need > taken:
            fp[order[full]] -= need - taken
    f[present] = fp
    return f


def _encode_lanes(
    padded: np.ndarray, freqs: np.ndarray, k: int, lanes: int
) -> tuple[np.ndarray, np.ndarray]:
    """Core interleaved encoder: (rows, L) symbols -> (states, stream).
    Dispatches to the C twin (native.py) when available — byte-identical
    output, pinned by tests — else the vectorized numpy kernel."""
    from .. import native

    if native.HAVE:
        return _encode_lanes_c(padded, freqs, k, lanes)
    return _encode_lanes_np(padded, freqs, k, lanes)


def _encode_lanes_c(
    padded: np.ndarray, freqs: np.ndarray, k: int, lanes: int
) -> tuple[np.ndarray, np.ndarray]:
    from .. import native

    rows = len(padded) // lanes
    syms = np.ascontiguousarray(padded, dtype=np.int64)
    f64 = freqs.astype(np.uint64)
    cum = np.zeros(len(freqs), dtype=np.uint64)
    np.cumsum(f64[:-1], out=cum[1:])
    pk = f64 | (cum << np.uint64(21))
    states = np.empty(lanes, dtype=np.uint64)
    cap = rows * lanes  # at most one word per symbol (state invariant)
    stream_buf = np.empty(cap + 1, dtype=np.uint32)  # +1: dead-slot slack
    p = native.lib.pgs_rans_encode(
        syms.ctypes.data, rows, lanes, pk.ctypes.data,
        k, states.ctypes.data, stream_buf.ctypes.data, cap,
    )
    return states, stream_buf[p : cap + 1].copy()


def _encode_lanes_np(
    padded: np.ndarray, freqs: np.ndarray, k: int, lanes: int
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized numpy kernel — the canonical implementation."""
    rows = len(padded) // lanes
    grid = padded.reshape(rows, lanes)
    f64 = freqs.astype(np.uint64)
    cum = np.zeros(len(freqs), dtype=np.uint64)
    np.cumsum(f64[:-1], out=cum[1:])
    # one packed per-symbol table instead of three: f in the low 21 bits
    # (f <= 2^MAX_K), cum above it (cum < 2^MAX_K); the renormalization
    # threshold ((L>>k)*f) << 32 is just f << (63-k), derived on the fly
    pk = f64 | (cum << np.uint64(21))
    shift_xmax = np.uint64(63 - k)
    mask21 = np.uint64((1 << 21) - 1)
    u21 = np.uint64(21)
    uk = np.uint64(k)
    u32 = np.uint64(32)
    x = np.full(lanes, RANS_L, dtype=np.uint64)
    emitted: list[np.ndarray] = []
    for r in range(rows - 1, -1, -1):
        g = pk[grid[r]]
        f = g & mask21
        mask = x >= (f << shift_xmax)
        if mask.any():
            emitted.append((x[mask] & _MASK32).astype(np.uint32))
            # branchless masked shift: 2x faster than x[mask] >>= 32
            # (boolean-index scatter is the loop's hottest op)
            x = x >> (mask * u32)
        q = x // f
        x = (q << uk) + (x - q * f) + (g >> u21)
    if emitted:
        stream = np.concatenate(emitted[::-1])
    else:
        stream = np.empty(0, dtype=np.uint32)
    return x, stream


def _decode_lanes(
    states: np.ndarray,
    stream: np.ndarray,
    freqs: np.ndarray,
    k: int,
    rows: int,
    lanes: int,
    vmin: int,
    out_dtype=np.int64,
) -> np.ndarray:
    """Decode to a flat int array with the frame's vmin already
    re-applied (fused into the C kernel's output store)."""
    from .. import native

    if native.HAVE:
        return _decode_lanes_c(
            states, stream, freqs, k, rows, lanes, vmin, out_dtype
        )
    out = _decode_lanes_np(states, stream, freqs, k, rows, lanes, vmin)
    return out.astype(out_dtype, copy=False)


def _decode_lanes_c(
    states: np.ndarray,
    stream: np.ndarray,
    freqs: np.ndarray,
    k: int,
    rows: int,
    lanes: int,
    vmin: int,
    out_dtype=np.int64,
) -> np.ndarray:
    from .. import native

    f64 = np.ascontiguousarray(freqs, dtype=np.uint64)
    cum = np.zeros(len(freqs), dtype=np.uint64)
    np.cumsum(f64[:-1], out=cum[1:])
    symtab = np.repeat(
        np.arange(len(freqs), dtype=np.uint32), freqs.astype(np.int64)
    )
    st = np.ascontiguousarray(states, dtype=np.uint64).copy()
    sm = np.ascontiguousarray(stream, dtype=np.uint32)
    out_dtype = np.dtype(out_dtype)
    out = np.empty(rows * lanes, dtype=out_dtype)
    fn = (
        native.lib.pgs_rans_decode_i32
        if out_dtype.itemsize == 4
        else native.lib.pgs_rans_decode
    )
    rc = fn(
        st.ctypes.data, sm.ctypes.data, len(sm), symtab.ctypes.data,
        f64.ctypes.data, cum.ctypes.data, k, vmin, rows, lanes,
        out.ctypes.data,
    )
    if rc == 1:
        raise ValueError("truncated rANS stream")
    if rc == 2:
        raise ValueError("rANS stream not fully consumed")
    if rc == 3:
        raise ValueError("rANS state mismatch after decode")
    return out


def _decode_lanes_np(
    states: np.ndarray,
    stream: np.ndarray,
    freqs: np.ndarray,
    k: int,
    rows: int,
    lanes: int,
    vmin: int,
) -> np.ndarray:
    f64 = freqs.astype(np.uint64)
    cum = np.zeros(len(freqs), dtype=np.uint64)
    np.cumsum(f64[:-1], out=cum[1:])
    # one slot-indexed table holding everything the step needs — symbol in
    # the low 17 bits (nfreq < 2^17), its frequency in the next 21, its
    # cumulative base above that — so each decode step is a single gather
    # instead of slot->symbol then symbol->(f, cum)
    sym = np.repeat(np.arange(len(freqs), dtype=np.uint64), freqs.astype(np.int64))
    slotab = sym | (f64[sym] << np.uint64(17)) | (cum[sym] << np.uint64(38))
    mask17 = np.uint64((1 << 17) - 1)
    mask21 = np.uint64((1 << 21) - 1)
    u17 = np.uint64(17)
    u38 = np.uint64(38)
    uk = np.uint64(k)
    u32 = np.uint64(32)
    mmask = np.uint64((1 << k) - 1)
    x = states.copy()
    out = np.empty((rows, lanes), dtype=np.uint32)
    ptr = 0
    ns = len(stream)
    for r in range(rows):
        slot = x & mmask
        g = slotab[slot]
        out[r] = (g & mask17).astype(np.uint32)
        x = ((g >> u17) & mask21) * (x >> uk) + slot - (g >> u38)
        mask = x < RANS_L
        cnt = int(np.count_nonzero(mask))
        if cnt:
            if ptr + cnt > ns:
                raise ValueError("truncated rANS stream")
            # branchless masked fill (mirror of the encoder's shift): one
            # scatter for the words, arithmetic select for the shift
            w = np.zeros(lanes, dtype=np.uint64)
            w[mask] = stream[ptr : ptr + cnt]
            x = (x << (mask * u32)) | w
            ptr += cnt
    if ptr != ns:
        raise ValueError("rANS stream not fully consumed")
    if not np.all(x == RANS_L):
        raise ValueError("rANS state mismatch after decode")
    res = np.empty(rows * lanes, dtype=np.int64)
    np.add(out.reshape(-1), vmin, out=res, casting="unsafe")
    return res


def encode_ints(vals: np.ndarray) -> bytes:
    """Encode an integer array whose span fits MAX_NFREQ."""
    n = len(vals)
    if n == 0:
        return _HDR.pack(MIN_K, 0, 0, 0, 0, 0, 0, 0)
    if vals.dtype.kind != "i":
        vals = vals.astype(np.int64)
    from .. import native

    if (
        native.HAVE
        and vals.dtype.itemsize in (4, 8)
        and vals.flags.c_contiguous
    ):
        # fused C path: one-pass min/max, in-table histogram, and an
        # encoder that reads the raw values directly (vmin applied via
        # the pk index, pad synthesized past n) — the padded int64 grid
        # and its four memory sweeps never materialize. Byte-identical
        # to the numpy path below (pinned by tests).
        return _encode_ints_fused(vals, n)
    vmin = int(vals.min())
    span = int(vals.max()) - vmin
    if span >= MAX_NFREQ:
        raise ValueError("value span too large for rANS")
    nfreq = span + 1
    lanes = _pick_lanes(n)
    rows = -(-n // lanes)
    if rows > MAX_ROWS:
        raise ValueError("chunk too large for one rANS blob")
    # single fused pass builds the shifted+padded lane grid directly (no
    # astype / subtract / concatenate intermediates — those copies used to
    # cost more than the C kernel itself); span < 2^17 rules out overflow
    # in the input dtype's subtract
    padded = np.empty(rows * lanes, dtype=np.int64)
    np.subtract(vals, vmin, out=padded[:n])
    counts = np.bincount(padded[:n], minlength=nfreq)
    k = _pick_k(nfreq)
    freqs = quantize_freqs(counts, k)
    if rows * lanes > n:
        padded[n:] = int(np.argmax(counts))
    states, stream = _encode_lanes(padded, freqs, k, lanes)
    fbw = max(int(freqs.max()).bit_length(), 1)
    header = _HDR.pack(k, fbw, 0, lanes, n, vmin, nfreq, len(stream))
    return (
        header
        + bitpack.pack(freqs.astype(np.uint64), fbw)
        + states.tobytes()
        + stream.tobytes()
    )


def _encode_ints_fused(vals: np.ndarray, n: int) -> bytes:
    """C-accelerated encode_ints body — same decisions, same blob bytes."""
    from .. import native

    vmin, vmax = native.minmax(vals)
    span = vmax - vmin
    if span >= MAX_NFREQ:
        raise ValueError("value span too large for rANS")
    nfreq = span + 1
    lanes = _pick_lanes(n)
    rows = -(-n // lanes)
    if rows > MAX_ROWS:
        raise ValueError("chunk too large for one rANS blob")
    counts = native.hist(vals, vmin, nfreq)
    k = _pick_k(nfreq)
    freqs = quantize_freqs(counts, k)
    pad = int(np.argmax(counts))
    f64 = freqs.astype(np.uint64)
    cum = np.zeros(len(freqs), dtype=np.uint64)
    np.cumsum(f64[:-1], out=cum[1:])
    pk = f64 | (cum << np.uint64(21))
    states = np.empty(lanes, dtype=np.uint64)
    cap = rows * lanes
    stream_buf = np.empty(cap + 1, dtype=np.uint32)
    fn = (
        native.lib.pgs_rans_encode32
        if vals.dtype.itemsize == 4
        else native.lib.pgs_rans_encode64
    )
    p = fn(
        vals.ctypes.data, n, rows, lanes, pk.ctypes.data, vmin, pad,
        k, states.ctypes.data, stream_buf.ctypes.data, cap,
    )
    stream = stream_buf[p : cap + 1]
    fbw = max(int(freqs.max()).bit_length(), 1)
    header = _HDR.pack(k, fbw, 0, lanes, n, vmin, nfreq, len(stream))
    return (
        header
        + bitpack.pack(freqs.astype(np.uint64), fbw)
        + states.tobytes()
        + stream.tobytes()
    )


def decode_ints(buf: bytes, out_dtype=np.int64) -> np.ndarray:
    """Decode a blob from encode_ints -> int array of ``out_dtype``.

    ``out_dtype`` of int32 is only valid when the encoded value range fits
    (the caller knows the column's logical type); the C kernel then writes
    the final dtype directly, skipping the int64 intermediate + astype."""
    if len(buf) < _HDR.size:
        raise ValueError("truncated rANS header")
    k, fbw, _pad, lanes, n, vmin, nfreq, stream_words = _HDR.unpack_from(buf)
    if n == 0:
        # an empty blob is exactly one header — trailing bytes mean the
        # count field was corrupted, not that the input was empty
        if len(buf) != _HDR.size or lanes or stream_words:
            raise ValueError("invalid empty rANS blob")
        return np.empty(0, dtype=out_dtype)
    if not (MIN_K <= k <= MAX_K) or nfreq > MAX_NFREQ or nfreq < 1:
        raise ValueError("invalid rANS parameters")
    # lanes is self-described, so validate it against structural bounds
    # (1..MAX_LANES here, ceil(n/lanes) <= MAX_ROWS below) rather than the
    # *current* _pick_lanes policy — requiring exact equality would make
    # every already-written frame undecodable the moment the lane heuristic
    # is retuned (storage-format durability). The spin defense is intact:
    # the decode loop runs exactly ceil(n/lanes) iterations, and both
    # factors are capped, so a corrupted (huge n, tiny lanes) pair is
    # rejected by the MAX_ROWS check instead of spinning.
    if not (1 <= lanes <= MAX_LANES) or fbw < 1 or fbw > 32:
        raise ValueError("invalid rANS parameters")
    pos = _HDR.size
    end_freq = pos + (nfreq * fbw + 7) // 8
    if len(buf) < end_freq:
        raise ValueError("truncated rANS frequency table")
    freqs = bitpack.unpack(buf[pos:end_freq], nfreq, fbw).astype(np.int64)
    if int(freqs.sum()) != 1 << k:
        raise ValueError("rANS frequencies do not sum to 2^k")
    pos = end_freq
    if len(buf) < pos + 8 * lanes + 4 * stream_words:
        raise ValueError("truncated rANS body")
    states = np.frombuffer(buf, dtype="<u8", count=lanes, offset=pos).astype(
        np.uint64
    )
    pos += 8 * lanes
    stream = np.frombuffer(
        buf, dtype="<u4", count=stream_words, offset=pos
    )
    rows = -(-n // lanes)
    if rows > MAX_ROWS:
        raise ValueError("rANS row count exceeds decode cap")
    out = _decode_lanes(states, stream, freqs, k, rows, lanes, vmin, out_dtype)
    return out[:n]


def split_fixed(blob: bytes) -> tuple[bytes, bytes]:
    """Split an encoded blob into (header+freq table, states+stream).

    The first part amortizes over the whole chunk while the second scales
    with row count — the split the cost model's scaled trials need."""
    if len(blob) < _HDR.size:
        raise ValueError("truncated rANS header")
    _k, fbw, _pad, _lanes, n, _vmin, nfreq, _sw = _HDR.unpack_from(blob)
    if n == 0:
        return blob, b""
    end_freq = _HDR.size + (nfreq * fbw + 7) // 8
    return blob[:end_freq], blob[end_freq:]


def estimate_bits_per_value(counts: np.ndarray) -> float:
    """Empirical Shannon entropy of a count vector (for the cost model)."""
    total = counts.sum()
    if total == 0:
        return 0.0
    p = counts[counts > 0] / total
    return float(-(p * np.log2(p)).sum())
