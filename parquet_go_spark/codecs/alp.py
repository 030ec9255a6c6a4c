"""ALP-style lossless floating-point compression (decimal-scaled integers).

Doubles that are "really" decimals — prices, rates, measurements printed
with a fixed number of fraction digits — waste most of their 64 bits on a
mantissa the data never uses. The ALP scheme (Afroozeh & Boncz, "ALP:
Adaptive Lossless floating-Point compression", SIGMOD 2024 — public) maps
each value to an integer ``round(v * 10^e)``, verifies the mapping is
exactly invertible in IEEE arithmetic, and stores the integers (which the
engine's existing int codec menu — FOR/bit-pack, delta, rANS, dict —
compresses far below 64 bits/value) plus a patch list of *exceptions*:
positions whose value doesn't survive the decimal roundtrip (NaN, ±inf,
-0.0, values needing the full mantissa). A second factor ``10^f`` strips
common trailing zeros from the scaled integers (whole-dollar prices at
e=2 are all multiples of 100).

The reference has no analog — this extends its encoding set the same way
FSST and rANS do (beyond-reference, public-knowledge additions mandated
by the engine's size goal). Exactness contract: ``decode(encode(v))`` is
**bit-identical** for every IEEE value including NaN payloads, ±inf and
-0.0, because the encoder verifies each value's roundtrip at its own bit
pattern and demotes failures to raw exceptions.

This module holds the pure float<->int transform and the patch-list
framing; the enclosing chunk layer picks the inner integer codec (so ALP
composes with the whole int menu and its sampled cost selection).
"""

from __future__ import annotations

import numpy as np

# |scaled| must stay well under 2^63 so the int64 cast and the 10^f
# multiply on decode are exact; 2^62 leaves one headroom bit.
_CAP = float(2**62)
_MAX_E = {4: 10, 8: 16}   # float32 / float64 exponent search range
_MAX_F = 18
_HDR = 8                  # e u8, f u8, inner_cid u8, inner_bw u8, n_exc u32
MIN_HIT = 0.5             # below this, ALP is not offered to auto-selection


def _ibits(dtype: np.dtype) -> np.dtype:
    return np.dtype(np.uint32 if dtype.itemsize == 4 else np.uint64)


def _recon(stored: np.ndarray, e: int, f: int, dtype: np.dtype) -> np.ndarray:
    """The decode-side transform — encode verifies against exactly this."""
    with np.errstate(over="ignore"):
        iv = stored * np.int64(10**f)
    r = iv.astype(np.float64) / np.float64(10.0**e)
    return r.astype(dtype, copy=False)


def split(
    vals: np.ndarray, e: int, f: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """vals -> (stored int64, exc_pos uint32, exc_vals raw dtype).

    Exception slots in ``stored`` are filled with the first surviving
    integer (keeps the frame-of-reference span tight instead of dragging
    in a 0)."""
    dtype = vals.dtype
    v64 = vals.astype(np.float64, copy=False)
    with np.errstate(invalid="ignore", over="ignore"):
        iv_f = np.round(v64 * np.float64(10.0**e))
    ok = np.isfinite(iv_f) & (np.abs(iv_f) < _CAP)
    iv = np.where(ok, iv_f, 0.0).astype(np.int64)
    if f:
        d = np.int64(10**f)
        q = iv // d
        ok &= q * d == iv
        iv = np.where(ok, q, 0)
    # bit-exact roundtrip check at each value's own pattern
    ib = _ibits(dtype)
    recon = _recon(iv, e, f, dtype)
    ok &= recon.view(ib) == vals.view(ib)
    exc_pos = np.flatnonzero(~ok).astype(np.uint32)
    exc_vals = vals[~ok]
    if len(exc_pos):
        good = np.flatnonzero(ok)
        fill = iv[good[0]] if len(good) else np.int64(0)
        iv = np.where(ok, iv, fill)
    return iv, exc_pos, exc_vals


def merge(
    stored: np.ndarray,
    e: int,
    f: int,
    exc_pos: np.ndarray,
    exc_vals: np.ndarray,
    dtype: np.dtype,
) -> np.ndarray:
    out = _recon(stored.astype(np.int64, copy=False), e, f, dtype)
    if len(exc_pos):
        out = np.ascontiguousarray(out)
        out[exc_pos] = exc_vals
    return out


def choose_params(sample: np.ndarray) -> tuple[int, int] | None:
    """Pick (e, f) on a sample, or None when the column isn't decimal-ish.

    Scores each exponent by projected bytes: survivors cost the
    frame-of-reference bit width of their scaled ints, exceptions cost a
    position + a raw value. Requires ≥ MIN_HIT survivors."""
    n = len(sample)
    if n == 0:
        return None
    if n > 16384:
        # 16k values bound the 17-exponent sweep to ~2 ms; exactness-hit
        # estimation converges long before that (exceptions on the full
        # chunk are handled by split regardless of what we estimate here)
        step = n // 16384
        sample = sample[:: step]
        n = len(sample)
    dtype = sample.dtype
    itemsize = dtype.itemsize
    ib = _ibits(dtype)
    v64 = sample.astype(np.float64, copy=False)
    bits = sample.view(ib)
    best: tuple[float, int, int] | None = None
    for e in range(_MAX_E[itemsize] + 1):
        with np.errstate(invalid="ignore", over="ignore"):
            iv_f = np.round(v64 * np.float64(10.0**e))
        ok = np.isfinite(iv_f) & (np.abs(iv_f) < _CAP)
        if not ok.any():
            continue
        iv = np.where(ok, iv_f, 0.0).astype(np.int64)
        recon = _recon(iv, e, 0, dtype)
        ok &= recon.view(ib) == bits
        hits = int(ok.sum())
        if hits < MIN_HIT * n:
            continue
        good = iv[ok]
        # strip common trailing decimal zeros
        f = 0
        g = good
        while f < min(e, _MAX_F):
            if np.any(g % 10):
                break
            g = g // 10
            f += 1
        span = int(g.max()) - int(g.min()) if len(g) else 0
        bw = max(span.bit_length(), 1)
        est = hits * bw / 8.0 + (n - hits) * (4 + itemsize)
        if best is None or est < best[0] or (est == best[0] and e < best[1]):
            best = (est, e, f)
    if best is None:
        return None
    # only worth it if clearly below the raw width
    if best[0] >= n * itemsize:
        return None
    return best[1], best[2]


def pack_header(
    e: int, f: int, inner_cid: int, inner_bw: int,
    exc_pos: np.ndarray, exc_vals: np.ndarray,
) -> bytes:
    return (
        bytes([e, f, inner_cid, inner_bw])
        + len(exc_pos).to_bytes(4, "little")
        + exc_pos.astype("<u4", copy=False).tobytes()
        + exc_vals.tobytes()
    )


def parse_header(
    sect: bytes, n: int, dtype: np.dtype
) -> tuple[int, int, int, int, np.ndarray, np.ndarray]:
    if len(sect) < _HDR:
        raise ValueError("truncated ALP header")
    e, f, inner_cid, inner_bw = sect[0], sect[1], sect[2], sect[3]
    n_exc = int.from_bytes(sect[4:8], "little")
    if n_exc > n:
        raise ValueError("ALP exception count exceeds row count")
    need = _HDR + n_exc * (4 + dtype.itemsize)
    if len(sect) < need:
        raise ValueError("truncated ALP exception list")
    exc_pos = np.frombuffer(sect, dtype="<u4", count=n_exc, offset=_HDR)
    exc_vals = np.frombuffer(
        sect, dtype=dtype, count=n_exc, offset=_HDR + 4 * n_exc
    )
    if n_exc and int(exc_pos.max()) >= n:
        raise ValueError("ALP exception position out of range")
    return e, f, inner_cid, inner_bw, exc_pos, exc_vals
