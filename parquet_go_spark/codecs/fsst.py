"""FSST-style string/symbol compression (sample-trained symbol table).

Not present in the reference (mandated on top of parquet-go's encodings by
the north rule); derived from the published FSST design (Boncz, Neumann,
Leis — "FSST: Fast Random Access String Compression", VLDB 2020): up to 255
symbols of <= 8 bytes each map to 1-byte codes, byte 255 is the escape code
followed by one literal byte.

Symbol table construction here is a vectorized iterative pair-merge over a
sample (BPE-flavored, which the FSST paper notes is the same family): each
round counts adjacent code pairs with numpy, merges the most frequent pair
into a new symbol (respecting the 8-byte cap and non-overlap), and records
the merge order. Encoding replays the merges over the full chunk with the
same vectorized kernel; decoding is a gather through the flattened symbol
table. No per-value Python anywhere.
"""

from __future__ import annotations

import numpy as np

from . import delta

ESCAPE = 255
SEP = np.uint32(1 << 20)  # string-boundary sentinel, never merged
MAX_SYMBOL_LEN = 8
DEFAULT_MAX_SYMBOLS = 64  # <= 255; paper: most gain in the first symbols
MIN_PAIR_COUNT = 4
FIRST_SYMBOL_CODE = 256  # codes < 256 are literal bytes; >= 256 are symbols


def _nonoverlapping(positions: np.ndarray) -> np.ndarray:
    """Greedy left-to-right selection of non-adjacent positions (for 'aaaa')."""
    if len(positions) <= 1:
        return positions
    run_start = np.flatnonzero(np.diff(positions) > 1)
    starts = np.concatenate(([0], run_start + 1))
    within = np.arange(len(positions)) - np.repeat(
        starts, np.diff(np.concatenate((starts, [len(positions)])))
    )
    return positions[within % 2 == 0]


def _merge_pass(codes: np.ndarray, a: int, b: int, new_code: int) -> np.ndarray:
    """Replace non-overlapping (a, b) adjacencies with new_code (vectorized)."""
    hits = np.flatnonzero((codes[:-1] == a) & (codes[1:] == b))
    hits = _nonoverlapping(hits)
    if len(hits) == 0:
        return codes
    codes[hits] = new_code
    keep = np.ones(len(codes), dtype=bool)
    keep[hits + 1] = False
    return codes[keep]


def _replay(codes: np.ndarray, triples: list[tuple[int, int, int]]) -> np.ndarray:
    """Apply ranked (a, b, new_code) merges in order. Dispatches to the C
    twin (native.pgs_fsst_replay) when available — the greedy left-to-right
    scan there consumes exactly the even-offset members of every run of
    adjacent hits, i.e. the same selection _nonoverlapping makes, so the
    surviving code sequence (and therefore the blob) is byte-identical."""
    if not triples:
        return codes
    from .. import native

    if native.HAVE and len(codes):
        if not (codes.flags.c_contiguous and codes.flags.writeable):
            codes = np.ascontiguousarray(codes)
        t = np.asarray(triples, dtype=np.int64)
        ma, mb, mc = (np.ascontiguousarray(t[:, j]) for j in range(3))
        n2 = native.lib.pgs_fsst_replay(
            codes.ctypes.data, len(codes),
            ma.ctypes.data, mb.ctypes.data, mc.ctypes.data, len(t),
        )
        return codes[:n2]
    for a, b, nc in triples:
        codes = _merge_pass(codes, a, b, nc)
    return codes


def train(
    data: bytes,
    offsets: np.ndarray,
    max_symbols: int = DEFAULT_MAX_SYMBOLS,
    sample_bytes: int = 1 << 16,
) -> tuple[list[tuple[int, int]], list[bytes]]:
    """Build (merges, symbols) from a sample of the column chunk.

    merges[i] = (code_a, code_b) producing code FIRST_SYMBOL_CODE + i;
    symbols[i] = the expanded byte string of that code.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    arr = np.frombuffer(data, dtype=np.uint8)
    # sample whole strings from the head up to sample_bytes (deterministic)
    end_row = int(np.searchsorted(offsets, offsets[0] + sample_bytes)) or 1
    end_row = min(max(end_row, 1), n)
    lengths = np.diff(offsets[: end_row + 1])
    total = int(lengths.sum())
    codes = np.empty(total + end_row, dtype=np.uint32)
    # interleave SEP after each string
    dst = np.arange(total, dtype=np.int64) + np.repeat(
        np.arange(end_row, dtype=np.int64), lengths
    )
    codes[:] = SEP
    codes[dst] = arr[int(offsets[0]) : int(offsets[end_row])]

    merges: list[tuple[int, int]] = []
    symbols: list[bytes] = []
    sym_len = {c: 1 for c in range(256)}

    while len(merges) < min(max_symbols, 255) and len(codes) > 1:
        left, right = codes[:-1], codes[1:]
        valid = (left != SEP) & (right != SEP)
        if not valid.any():
            break
        pair_keys = left[valid].astype(np.uint64) * np.uint64(1 << 21) + right[
            valid
        ].astype(np.uint64)
        uniq, counts = np.unique(pair_keys, return_counts=True)
        # filter pairs whose merged symbol would exceed 8 bytes
        ua = (uniq >> np.uint64(21)).astype(np.int64)
        ub = (uniq & np.uint64((1 << 21) - 1)).astype(np.int64)
        la = np.array([sym_len[int(x)] for x in ua])
        lb = np.array([sym_len[int(x)] for x in ub])
        ok = (la + lb) <= MAX_SYMBOL_LEN
        if not ok.any():
            break
        uniq, counts, ua, ub, la, lb = (
            uniq[ok], counts[ok], ua[ok], ub[ok], la[ok], lb[ok],
        )
        best = int(np.argmax(counts))
        if counts[best] < MIN_PAIR_COUNT:
            break
        a, b = int(ua[best]), int(ub[best])
        new_code = FIRST_SYMBOL_CODE + len(merges)

        def expand(c: int) -> bytes:
            return bytes([c]) if c < 256 else symbols[c - FIRST_SYMBOL_CODE]

        sym = expand(a) + expand(b)
        merges.append((a, b))
        symbols.append(sym)
        sym_len[new_code] = len(sym)
        codes = _replay(codes, [(a, b, new_code)])

    # fill the remaining code space with frequent single bytes (real FSST
    # tables are mostly 1-byte symbols): a covered byte costs 1 output byte
    # instead of the 2-byte (ESCAPE, byte) literal
    room = 255 - len(merges)
    if room > 0:
        raw = codes[codes < 256]
        if len(raw):
            counts1 = np.bincount(raw.astype(np.int64), minlength=256)
            order = np.argsort(-counts1, kind="stable")
            for byte in order[:room]:
                if counts1[byte] < MIN_PAIR_COUNT:
                    break
                merges.append((int(byte), -1))  # -1 marks single-byte symbol
                symbols.append(bytes([int(byte)]))
    return merges, symbols


def encode(
    data: bytes,
    offsets: np.ndarray,
    merges: list[tuple[int, int]],
    symbols: list[bytes],
) -> bytes:
    """Apply the trained merges to the full chunk and serialize.

    Blob layout: u16 n_symbols | n_symbols * u8 sym_len | concat(symbol bytes)
                 | u32 enc_len_blob | delta(encoded-bytes-per-string) | payload
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    arr = np.frombuffer(data, dtype=np.uint8)
    lengths = np.diff(offsets)
    total = int(lengths.sum())

    lut = np.full(256, -1, dtype=np.int64)  # byte -> single-byte symbol code
    triples = []
    for i, (a, b) in enumerate(merges):
        if b == -1:
            lut[a] = i
        else:
            triples.append((a, b, FIRST_SYMBOL_CODE + i))

    from .. import native

    if native.HAVE and n:
        # fused per-string C encode: the merge passes run over one string
        # at a time in an L1-resident scratch, so the chunk is touched
        # exactly twice (read data, write payload) instead of ~64 full
        # sweeps of a uint32 code stream
        t = (np.asarray(triples, dtype=np.int64).reshape(-1, 3)
             if triples else np.zeros((0, 3), dtype=np.int64))
        ma, mb, mc = (np.ascontiguousarray(t[:, j]) for j in range(3))
        lut16 = lut.astype(np.int16)
        max_len = int(lengths.max()) if n else 0
        scratch = np.empty(max(max_len, 1), dtype=np.uint16)
        payload_buf = np.empty(2 * max(total, 1), dtype=np.uint8)
        enc_lengths = np.empty(n, dtype=np.int64)
        plen = native.lib.pgs_fsst_encode_all(
            arr.ctypes.data, offsets.ctypes.data, n,
            ma.ctypes.data, mb.ctypes.data, mc.ctypes.data, len(t),
            lut16.ctypes.data, scratch.ctypes.data,
            payload_buf.ctypes.data, enc_lengths.ctypes.data,
        )
        payload = payload_buf[:plen]
        head = len(symbols).to_bytes(2, "little")
        head += bytes(len(s) for s in symbols)
        head += b"".join(symbols)
        len_blob = delta.encode(enc_lengths, itemsize=4)
        return (head + len(len_blob).to_bytes(4, "little") + len_blob
                + payload.tobytes())

    codes = np.empty(total + n, dtype=np.uint32)
    dst = np.arange(total, dtype=np.int64) + np.repeat(
        np.arange(n, dtype=np.int64), lengths
    )
    codes[:] = SEP
    codes[dst] = arr[int(offsets[0]) : int(offsets[-1])]
    codes = _replay(codes, triples)

    is_sep = codes == SEP
    is_sym = (codes >= FIRST_SYMBOL_CODE) & ~is_sep
    is_raw = codes < 256
    lut_vals = lut[np.minimum(codes, 255).astype(np.int64)]
    mapped = is_raw & (lut_vals >= 0)        # 1-byte single-byte symbol
    unmapped = is_raw & (lut_vals < 0)       # 2-byte (ESCAPE, byte) literal
    out_len = np.where(
        is_sep, 0, np.where(is_sym | mapped, 1, 2)
    )
    out_off = np.zeros(len(codes) + 1, dtype=np.int64)
    np.cumsum(out_len, out=out_off[1:])
    payload = np.empty(int(out_off[-1]), dtype=np.uint8)
    sym_pos = np.flatnonzero(is_sym)
    payload[out_off[sym_pos]] = (codes[sym_pos] - FIRST_SYMBOL_CODE).astype(np.uint8)
    map_pos = np.flatnonzero(mapped)
    payload[out_off[map_pos]] = lut_vals[map_pos].astype(np.uint8)
    raw_pos = np.flatnonzero(unmapped)
    payload[out_off[raw_pos]] = ESCAPE
    payload[out_off[raw_pos] + 1] = codes[raw_pos].astype(np.uint8)

    # encoded byte-length per string: segment sums of out_len between SEPs
    sep_pos = np.flatnonzero(is_sep)
    seg_starts = np.concatenate(([0], sep_pos + 1))[:n]
    enc_lengths = out_off[np.concatenate((sep_pos, [len(codes)]))[:n]] - out_off[seg_starts]

    head = len(symbols).to_bytes(2, "little")
    head += bytes(len(s) for s in symbols)
    head += b"".join(symbols)
    len_blob = delta.encode(enc_lengths.astype(np.int64), itemsize=4)
    return head + len(len_blob).to_bytes(4, "little") + len_blob + payload.tobytes()


def decode(buf: bytes) -> tuple[bytes, np.ndarray]:
    """Decode an FSST blob -> (data, offsets)."""
    if len(buf) < 2:
        raise ValueError("truncated FSST header")
    n_sym = int.from_bytes(buf[:2], "little")
    if n_sym > 255:
        raise ValueError("FSST symbol count > 255")
    pos = 2
    if pos + n_sym > len(buf):
        raise ValueError("truncated FSST symbol lengths")
    sym_lens = np.frombuffer(buf, dtype=np.uint8, count=n_sym, offset=pos).astype(
        np.int64
    )
    pos += n_sym
    sym_total = int(sym_lens.sum())
    if pos + sym_total + 4 > len(buf):
        raise ValueError("truncated FSST symbol table")
    sym_flat = np.frombuffer(buf, dtype=np.uint8, count=sym_total, offset=pos)
    sym_off = np.zeros(n_sym + 1, dtype=np.int64)
    np.cumsum(sym_lens, out=sym_off[1:])
    pos += sym_total
    lb = int.from_bytes(buf[pos : pos + 4], "little")
    pos += 4
    if pos + lb > len(buf):
        raise ValueError("truncated FSST length section")
    enc_lengths = delta.decode(buf[pos : pos + lb], itemsize=4).astype(np.int64)
    if len(enc_lengths) and enc_lengths.min() < 0:
        raise ValueError("negative encoded length")
    pos += lb
    payload = np.frombuffer(buf, dtype=np.uint8, offset=pos)
    if int(enc_lengths.sum()) != len(payload):
        raise ValueError("FSST payload size mismatch")

    from .. import native

    if native.HAVE and len(enc_lengths):
        enc_off = np.zeros(len(enc_lengths) + 1, dtype=np.int64)
        np.cumsum(enc_lengths, out=enc_off[1:])
        total = native.lib.pgs_fsst_dsize(
            payload.ctypes.data, enc_off.ctypes.data, len(enc_lengths),
            sym_lens.ctypes.data, n_sym,
        )
        if total >= 0:
            out = np.empty(total, dtype=np.uint8)
            offsets = np.empty(len(enc_lengths) + 1, dtype=np.int64)
            native.lib.pgs_fsst_decode(
                payload.ctypes.data, enc_off.ctypes.data, len(enc_lengths),
                sym_flat.ctypes.data, sym_off.ctypes.data,
                sym_lens.ctypes.data, out.ctypes.data, offsets.ctypes.data,
            )
            return out.tobytes(), offsets
        # dangling escape / out-of-range code under the strict per-string
        # C rules: fall through so malformed blobs keep the numpy path's
        # exact error surface

    # classify positions: escapes always come in (ESCAPE, literal) pairs and
    # literals can be ESCAPE themselves — resolve via runs of 255
    is_esc_byte = payload == ESCAPE
    starts = np.zeros(0, dtype=np.int64)
    if is_esc_byte.any():
        epos = np.flatnonzero(is_esc_byte)
        starts = _nonoverlapping(epos)  # escape markers; odd ones are literals
    is_code = np.ones(len(payload), dtype=bool)
    if len(starts):
        is_code[starts] = False          # escape marker byte
        lit_mask = np.zeros(len(payload), dtype=bool)
        lit_mask[starts + 1] = True      # following literal byte
        is_code &= ~lit_mask
        # but a literal byte is output as-is, handle below
    code_pos = np.flatnonzero(is_code)
    codes = payload[code_pos].astype(np.int64)
    if len(codes) and (n_sym == 0 or codes.max() >= n_sym):
        raise ValueError("FSST code out of range")
    out_lens_codes = sym_lens[codes] if len(codes) else np.zeros(0, np.int64)

    # build per-payload-position output length: codes expand, escape markers 0,
    # escaped literals 1
    out_len = np.zeros(len(payload), dtype=np.int64)
    out_len[code_pos] = out_lens_codes
    if len(starts):
        out_len[starts + 1] = 1
    out_off = np.zeros(len(payload) + 1, dtype=np.int64)
    np.cumsum(out_len, out=out_off[1:])
    total_out = int(out_off[-1])
    out = np.empty(total_out, dtype=np.uint8)
    # scatter symbol expansions via repeat/gather
    if len(code_pos):
        within = np.arange(int(out_lens_codes.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(out_lens_codes)[:-1])), out_lens_codes
        )
        gather = within + np.repeat(sym_off[codes], out_lens_codes)
        dst = np.repeat(out_off[code_pos], out_lens_codes) + within
        out[dst] = sym_flat[gather]
    if len(starts):
        out[out_off[starts + 1]] = payload[starts + 1]

    # per-string output offsets: encoded segment boundaries -> decoded offsets
    enc_off = np.zeros(len(enc_lengths) + 1, dtype=np.int64)
    np.cumsum(enc_lengths, out=enc_off[1:])
    offsets = out_off[enc_off]
    return out.tobytes(), offsets
