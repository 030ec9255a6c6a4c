"""Optional C fast path for the rANS lane loops.

The numpy kernels in codecs/rans.py are the canonical implementation (and
the only one tests treat as ground truth); this module compiles a small C
twin of the two lane loops at first use — same state machine, same
emission order, byte-identical blobs — because the per-row numpy step
costs ~30 ns/value in interpreter+dispatch overhead while the scalar C
loop runs at the hardware's integer-divide speed.

Deployment shape: no pip, no build system — one `cc -O3 -shared -fPIC`
invocation against a source string, cached under the system temp dir
keyed by the SHA-1 of the source, loaded with ctypes. Every Spark Python
worker process compiles at most once per source revision (the cache file
is shared per host and the build is atomic via rename). Anything failing
— no compiler, sandboxed exec, odd libc — downgrades silently to the
numpy path; `PGS_NO_NATIVE=1` forces the downgrade.

The C code follows the same public layout as the numpy kernel (Duda's
rANS in the ryg_rans 64/32 formulation); see codecs/rans.py for the
format documentation and invariants.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_SRC = r"""
#include <stdint.h>

/* Interleaved rANS encode. Walks rows last->first, lanes last->first,
   filling the stream buffer from the END so that reading forward from
   the returned offset yields rows ascending / lanes ascending — exactly
   the numpy kernel's concat(emitted[::-1]) order.

   Two measured micro-optimizations over the obvious loop (~2x total):
   branchless renormalization (the ~50%-taken emit branch mispredicts on
   entropy-coded data — always store to the dead slot below the live
   region, then conditionally claim it), and a single packed per-symbol
   gather (f | cum<<21, the numpy kernel's pk layout) instead of two
   table reads. A reciprocal-multiply division was tried and measured
   SLOWER than the hardware divide (the extra 16-byte gather costs more
   than the div; out-of-order execution hides div latency across
   independent lanes).

   stream_buf must have cap+1 slots; p starts at cap+1 so the dead-slot
   store at p-1 is always in bounds.
   Returns the start offset of the stream within stream_buf. */
int64_t pgs_rans_encode(const int64_t *syms, int64_t rows, int64_t lanes,
                        const uint64_t *pk, int k,
                        uint64_t *states, uint32_t *stream_buf, int64_t cap)
{
    const uint64_t L = 1ULL << 31;
    const int shift_xmax = 63 - k;
    const uint64_t m21 = (1ULL << 21) - 1;
    int64_t p = cap + 1;
    for (int64_t l = 0; l < lanes; l++) states[l] = L;
    for (int64_t r = rows - 1; r >= 0; r--) {
        const int64_t *row = syms + r * lanes;
        for (int64_t l = lanes - 1; l >= 0; l--) {
            uint64_t g = pk[row[l]];
            uint64_t fr = g & m21;
            uint64_t x = states[l];
            int c = x >= (fr << shift_xmax);
            stream_buf[p - 1] = (uint32_t)x;   /* dead slot unless c */
            p -= c;
            x >>= 32 * c;
            uint64_t q = x / fr;
            states[l] = (q << k) + (x - q * fr) + (g >> 21);
        }
    }
    return p;
}

/* Interleaved rANS decode. Forward over rows/lanes, consuming the stream
   strictly forward — the mirror of the encoder above. Writes the final
   values directly (symbol + vmin), fusing the un-shift pass the Python
   wrapper would otherwise run over the whole output; the int32 twin also
   fuses the int64->int32 astype the caller would need for int32 columns
   (caller guarantees vmin..vmin+nfreq fits the output type).
   Returns 0 ok, 1 truncated stream, 2 stream not fully consumed,
   3 final-state mismatch. */
#define PGS_DECODE(NAME, OTYPE)                                             \
int NAME(uint64_t *states, const uint32_t *stream, int64_t ns,              \
         const uint32_t *symtab, const uint64_t *f,                         \
         const uint64_t *cum, int k, int64_t vmin,                          \
         int64_t rows, int64_t lanes, OTYPE *out)                           \
{                                                                           \
    const uint64_t L = 1ULL << 31;                                          \
    const uint64_t m = (1ULL << k) - 1;                                     \
    int64_t ptr = 0;                                                        \
    for (int64_t r = 0; r < rows; r++) {                                    \
        OTYPE *orow = out + r * lanes;                                      \
        for (int64_t l = 0; l < lanes; l++) {                               \
            uint64_t x = states[l];                                         \
            uint64_t slot = x & m;                                          \
            uint32_t s = symtab[slot];                                      \
            x = f[s] * (x >> k) + slot - cum[s];                            \
            if (x < L) {                                                    \
                if (ptr >= ns) return 1;                                    \
                x = (x << 32) | (uint64_t)stream[ptr++];                    \
            }                                                               \
            states[l] = x;                                                  \
            orow[l] = (OTYPE)((int64_t)s + vmin);                           \
        }                                                                   \
    }                                                                       \
    if (ptr != ns) return 2;                                                \
    for (int64_t l = 0; l < lanes; l++)                                     \
        if (states[l] != L) return 3;                                       \
    return 0;                                                               \
}

PGS_DECODE(pgs_rans_decode, int64_t)
PGS_DECODE(pgs_rans_decode_i32, int32_t)

/* ---- fused prepare + direct encode ------------------------------------
   The Python wrapper around pgs_rans_encode used to spend more time in
   memory passes than the coder itself: min, max, subtract-into-padded-
   grid, bincount — four full sweeps of the input. These kernels fold the
   whole prepare stage into two cache-friendly passes and let the encoder
   read the RAW values (vmin applied via the pk table index, padding
   synthesized for idx >= n), so the int64 grid copy never exists. */

void pgs_minmax32(const int32_t *v, int64_t n, int64_t *out)
{
    int32_t lo = v[0], hi = v[0];
    for (int64_t i = 1; i < n; i++) {
        int32_t x = v[i];
        if (x < lo) lo = x;
        if (x > hi) hi = x;
    }
    out[0] = lo; out[1] = hi;
}

void pgs_minmax64(const int64_t *v, int64_t n, int64_t *out)
{
    int64_t lo = v[0], hi = v[0];
    for (int64_t i = 1; i < n; i++) {
        int64_t x = v[i];
        if (x < lo) lo = x;
        if (x > hi) hi = x;
    }
    out[0] = lo; out[1] = hi;
}

/* counts[v - vmin]++ ; caller guarantees every value is in [vmin,
   vmin + nfreq) (from pgs_minmax*) and counts is zeroed. nfreq is
   bounded by the rANS span gate (2^17) so the table lives in L2. */
void pgs_hist32(const int32_t *v, int64_t n, int64_t vmin, int64_t *counts)
{
    for (int64_t i = 0; i < n; i++) counts[v[i] - vmin]++;
}

void pgs_hist64(const int64_t *v, int64_t n, int64_t vmin, int64_t *counts)
{
    for (int64_t i = 0; i < n; i++) counts[v[i] - vmin]++;
}

/* Direct-input encoder twins of pgs_rans_encode: walk the virtual padded
   (rows x lanes) grid backward as a flat descending index (identical
   visit order: rows desc, lanes desc), reading sym = v[idx] - vmin for
   idx < n and the pad symbol above. Emission order and therefore the
   output stream are byte-identical to pgs_rans_encode over the padded
   grid. The lane counter decrements with wraparound — no per-element
   modulo. */
#define PGS_ENC_DIRECT(NAME, TYPE)                                          \
int64_t NAME(const TYPE *v, int64_t n, int64_t rows, int64_t lanes,         \
             const uint64_t *pk, int64_t vmin, int64_t pad,                 \
             int k, uint64_t *states, uint32_t *stream_buf, int64_t cap)    \
{                                                                           \
    const uint64_t L = 1ULL << 31;                                          \
    const int shift_xmax = 63 - k;                                          \
    const uint64_t m21 = (1ULL << 21) - 1;                                  \
    const uint64_t gpad = pk[pad];                                          \
    int64_t p = cap + 1;                                                    \
    int64_t total = rows * lanes;                                           \
    for (int64_t l = 0; l < lanes; l++) states[l] = L;                      \
    int64_t l = lanes - 1;                                                  \
    for (int64_t idx = total - 1; idx >= 0; idx--) {                        \
        uint64_t g = (idx < n) ? pk[(int64_t)v[idx] - vmin] : gpad;         \
        uint64_t fr = g & m21;                                              \
        uint64_t x = states[l];                                             \
        int c = x >= (fr << shift_xmax);                                    \
        stream_buf[p - 1] = (uint32_t)x;                                    \
        p -= c;                                                             \
        x >>= 32 * c;                                                       \
        uint64_t q = x / fr;                                                \
        states[l] = (q << k) + (x - q * fr) + (g >> 21);                    \
        l = l ? l - 1 : lanes - 1;                                          \
    }                                                                       \
    return p;                                                               \
}

PGS_ENC_DIRECT(pgs_rans_encode32, int32_t)
PGS_ENC_DIRECT(pgs_rans_encode64, int64_t)

/* ---- FSST merge replay / payload emission / decode ---------------------
   Twins of the numpy kernels in codecs/fsst.py. Replay semantics: for
   each ranked merge, leftmost-first non-overlapping replacement of
   (a, b) adjacencies — provably identical to _merge_pass's run-parity
   selection (a greedy left-to-right scan consumes exactly the
   even-offset members of every run of adjacent hits). The prescan
   avoids the compaction write pass entirely for merges that no longer
   occur in the chunk (common for late-ranked symbols). */

int64_t pgs_fsst_replay(uint32_t *codes, int64_t n,
                        const int64_t *ma, const int64_t *mb,
                        const int64_t *mc, int64_t m)
{
    for (int64_t i = 0; i < m; i++) {
        uint32_t a = (uint32_t)ma[i], b = (uint32_t)mb[i];
        uint32_t nc = (uint32_t)mc[i];
        int64_t f = -1;
        for (int64_t r = 0; r + 1 < n; r++)
            if (codes[r] == a && codes[r + 1] == b) { f = r; break; }
        if (f < 0) continue;
        int64_t w = f, r = f;
        while (r < n) {
            if (r + 1 < n && codes[r] == a && codes[r + 1] == b) {
                codes[w++] = nc; r += 2;
            } else {
                codes[w++] = codes[r++];
            }
        }
        n = w;
    }
    return n;
}

/* Fused whole-chunk encode: per string, copy its bytes into an
   L1-resident uint16 scratch, run every ranked merge over just that
   string (SEP sentinels made the global passes per-segment anyway, so
   per-string replay is exactly equivalent), then emit payload bytes.
   Memory traffic is one read of data + one write of payload — the
   separate build/replay/emit sweeps of the numpy formulation touched
   the full uint32 code stream ~64 times. lut[byte] >= 0 names a
   single-byte symbol code; scratch needs max-string-length capacity;
   payload needs 2*total_bytes. */
int64_t pgs_fsst_encode_all(const uint8_t *data, const int64_t *offsets,
                            int64_t ns,
                            const int64_t *ma, const int64_t *mb,
                            const int64_t *mc, int64_t m,
                            const int16_t *lut, uint16_t *scratch,
                            uint8_t *payload, int64_t *enc_lengths)
{
    int64_t p = 0;
    for (int64_t s = 0; s < ns; s++) {
        int64_t start = offsets[s], len = offsets[s + 1] - start;
        uint64_t seen[8] = {0, 0, 0, 0, 0, 0, 0, 0};  /* codes 0..511 */
        for (int64_t i = 0; i < len; i++) {
            uint8_t c = data[start + i];
            scratch[i] = c;
            seen[c >> 6] |= 1ULL << (c & 63);
        }
        int64_t n = len;
        for (int64_t i = 0; i < m; i++) {
            uint16_t a = (uint16_t)ma[i], b = (uint16_t)mb[i];
            uint16_t nc = (uint16_t)mc[i];
            /* conservative presence gate: a merge whose inputs never
               appeared in this string (e.g. a child of a merge that
               never fired) is skipped without scanning */
            if (!(seen[a >> 6] >> (a & 63) & 1) ||
                !(seen[b >> 6] >> (b & 63) & 1))
                continue;
            int64_t f = -1;
            for (int64_t r = 0; r + 1 < n; r++)
                if (scratch[r] == a && scratch[r + 1] == b) { f = r; break; }
            if (f < 0) continue;
            seen[nc >> 6] |= 1ULL << (nc & 63);
            int64_t w = f, r = f;
            while (r < n) {
                if (r + 1 < n && scratch[r] == a && scratch[r + 1] == b) {
                    scratch[w++] = nc; r += 2;
                } else {
                    scratch[w++] = scratch[r++];
                }
            }
            n = w;
        }
        int64_t ps = p;
        for (int64_t i = 0; i < n; i++) {
            uint16_t c = scratch[i];
            if (c >= 256) payload[p++] = (uint8_t)(c - 256);
            else {
                int16_t v = lut[c];
                if (v >= 0) payload[p++] = (uint8_t)v;
                else { payload[p++] = 255; payload[p++] = (uint8_t)c; }
            }
        }
        enc_lengths[s] = p - ps;
    }
    return p;
}

/* Decoded-size + validity pass: returns total output bytes, or -1 on a
   dangling escape / out-of-range code (the wrapper then falls back to
   the numpy path so malformed blobs keep its exact error surface). */
int64_t pgs_fsst_dsize(const uint8_t *payload, const int64_t *enc_off,
                       int64_t ns, const int64_t *sym_lens, int64_t n_sym)
{
    int64_t total = 0;
    for (int64_t s = 0; s < ns; s++) {
        int64_t p = enc_off[s], e = enc_off[s + 1];
        while (p < e) {
            uint8_t c = payload[p];
            if (c == 255) { if (p + 1 >= e) return -1; total += 1; p += 2; }
            else { if (c >= n_sym) return -1; total += sym_lens[c]; p += 1; }
        }
    }
    return total;
}

/* ---- DELTA_BYTE_ARRAY (front coding) twins ----------------------------
   codecs/deltaba.py's numpy prefix pass materializes a full pairwise
   comparison grid (~500 MB of temporaries for a 1M-row id column); the
   scalar loop with early exit touches only the compared bytes. */

void pgs_dba_prefixes(const uint8_t *data, const int64_t *offsets,
                      int64_t n, int64_t *prefixes)
{
    prefixes[0] = 0;
    for (int64_t i = 1; i < n; i++) {
        const uint8_t *a = data + offsets[i - 1];
        const uint8_t *b = data + offsets[i];
        int64_t la = offsets[i] - offsets[i - 1];
        int64_t lb = offsets[i + 1] - offsets[i];
        int64_t ml = la < lb ? la : lb;
        int64_t j = 0;
        while (j < ml && a[j] == b[j]) j++;
        prefixes[i] = j;
    }
}

/* Sequential front-coding reconstruction (inherently order-dependent —
   the numpy path is a Python loop over a bytearray). out must have
   sum(prefixes) + sum(suffix lengths) capacity, computed by the caller.
   Returns total output bytes, or -1 when a prefix over-references the
   previous value (wrapper falls back to numpy for its error surface). */
int64_t pgs_dba_reconstruct(const uint8_t *suf, const int64_t *suf_off,
                            const int64_t *prefixes, int64_t n,
                            uint8_t *out, int64_t *out_off)
{
    int64_t o = 0, prev = 0, prev_len = 0;
    out_off[0] = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t pl = prefixes[i];
        if (pl > prev_len) return -1;
        for (int64_t j = 0; j < pl; j++) out[o + j] = out[prev + j];
        int64_t sl = suf_off[i + 1] - suf_off[i];
        const uint8_t *sp = suf + suf_off[i];
        for (int64_t j = 0; j < sl; j++) out[o + pl + j] = sp[j];
        prev = o;
        prev_len = pl + sl;
        o += prev_len;
        out_off[i + 1] = o;
    }
    return o;
}

/* Fill pass (inputs validated by pgs_fsst_dsize): expand symbols /
   escaped literals per string, recording per-string output offsets. */
int64_t pgs_fsst_decode(const uint8_t *payload, const int64_t *enc_off,
                        int64_t ns, const uint8_t *sym_flat,
                        const int64_t *sym_off, const int64_t *sym_lens,
                        uint8_t *out, int64_t *offsets)
{
    int64_t o = 0;
    offsets[0] = 0;
    for (int64_t s = 0; s < ns; s++) {
        int64_t p = enc_off[s], e = enc_off[s + 1];
        while (p < e) {
            uint8_t c = payload[p];
            if (c == 255) { out[o++] = payload[p + 1]; p += 2; }
            else {
                const uint8_t *sp = sym_flat + sym_off[c];
                int64_t L = sym_lens[c];
                for (int64_t j = 0; j < L; j++) out[o + j] = sp[j];
                o += L; p += 1;
            }
        }
        offsets[s + 1] = o;
    }
    return o;
}
"""


def _build() -> ctypes.CDLL:
    h = hashlib.sha1(_SRC.encode()).hexdigest()[:16]
    d = os.path.join(tempfile.gettempdir(), f"pgs_native_{os.getuid()}")
    os.makedirs(d, exist_ok=True)
    so = os.path.join(d, f"rans_{h}.so")
    if not os.path.exists(so):
        src = os.path.join(d, f"rans_{h}.c")
        with open(src, "w") as fh:
            fh.write(_SRC)
        tmp = f"{so}.tmp.{os.getpid()}"
        subprocess.run(
            ["cc", "-O3", "-shared", "-fPIC", "-o", tmp, src],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, so)  # atomic publish; racers converge on one file
    return ctypes.CDLL(so)


lib = None
if not os.environ.get("PGS_NO_NATIVE"):
    try:
        lib = _build()
        lib.pgs_rans_encode.restype = ctypes.c_int64
        lib.pgs_rans_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        for _f in (lib.pgs_rans_decode, lib.pgs_rans_decode_i32):
            _f.restype = ctypes.c_int
            _f.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ]
        for _f in (lib.pgs_minmax32, lib.pgs_minmax64):
            _f.restype = None
            _f.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        for _f in (lib.pgs_hist32, lib.pgs_hist64):
            _f.restype = None
            _f.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p,
            ]
        for _f in (lib.pgs_rans_encode32, lib.pgs_rans_encode64):
            _f.restype = ctypes.c_int64
            _f.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ]
        lib.pgs_fsst_replay.restype = ctypes.c_int64
        lib.pgs_fsst_replay.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.pgs_fsst_encode_all.restype = ctypes.c_int64
        lib.pgs_fsst_encode_all.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.pgs_dba_prefixes.restype = None
        lib.pgs_dba_prefixes.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.pgs_dba_reconstruct.restype = ctypes.c_int64
        lib.pgs_dba_reconstruct.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.pgs_fsst_dsize.restype = ctypes.c_int64
        lib.pgs_fsst_dsize.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.pgs_fsst_decode.restype = ctypes.c_int64
        lib.pgs_fsst_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
    except Exception:
        lib = None

HAVE = lib is not None


def minmax(vals) -> tuple[int, int]:
    """One-pass C min/max of a contiguous int32/int64 array."""
    import numpy as np

    out = np.empty(2, dtype=np.int64)
    fn = lib.pgs_minmax32 if vals.dtype.itemsize == 4 else lib.pgs_minmax64
    fn(vals.ctypes.data, len(vals), out.ctypes.data)
    return int(out[0]), int(out[1])


def hist(vals, vmin: int, nfreq: int):
    """C bincount of (vals - vmin); every value must be in [vmin, vmin+nfreq)."""
    import numpy as np

    counts = np.zeros(nfreq, dtype=np.int64)
    fn = lib.pgs_hist32 if vals.dtype.itemsize == 4 else lib.pgs_hist64
    fn(vals.ctypes.data, len(vals), vmin, counts.ctypes.data)
    return counts
