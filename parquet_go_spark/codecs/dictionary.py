"""Dictionary encoding: unique values + RLE/bit-packed indices.

Mirrors the reference's dictionary path
(/root/reference/internal/layout/dictpage.go:150-304): dictionary values are
PLAIN-encoded (dictPageCompress, dictpage.go:64-83); indices are RLE-hybrid
at ``bit_width = bits.Len(dict_size - 1)`` prefixed by one bit-width byte
(dictpage.go:275-278); a byte-size budget caps the dictionary
(writer/writer.go:21-22 — default 1 MiB) and overflow falls back to PLAIN
(dictpage.go:161-195).

The reference builds the dict with a per-value hash-map insert; we use
np.unique(return_inverse=True) over the whole chunk — single pass,
vectorized, and (unlike the reference) needs no two-phase bit-width
finalization because the chunk is complete before we emit.
"""

from __future__ import annotations

import numpy as np

from . import plainc, rle

DEFAULT_DICT_BUDGET = 1 << 20  # bytes, writer/writer.go:21-22


def build_numeric(values: np.ndarray, budget: int = DEFAULT_DICT_BUDGET):
    """Return (uniques, codes) or None if the dictionary exceeds ``budget``.

    Uniques are ordered by descending frequency: skewed (e.g. Zipf token)
    columns then produce small codes for common values, which the outer
    block compressor exploits — measured ~8% smaller than value-ordered
    codes under zstd on Zipf(1.1) tokens. (The reference uses insertion
    order, dictpage.go:150-204; order is irrelevant to correctness since
    the dictionary is stored explicitly.)
    """
    if values.dtype.kind in "iu" and len(values):
        # Hash-based single pass (Arrow) instead of np.unique's O(n log n)
        # sort, then replicate the exact historical order: value-sorted
        # uniques re-ranked by descending frequency with value-order
        # tie-break. Ints only — Arrow hashes floats by BITS (NaN payloads
        # and -0.0 become distinct dict entries where np.unique's
        # compare-based path merges them), so floats keep the canonical
        # sort path.
        import pyarrow as pa

        denc = pa.array(values).dictionary_encode()
        uniq0 = denc.dictionary.to_numpy(zero_copy_only=False)
        if uniq0.nbytes > budget:
            return None
        codes0 = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(uniq0)
        counts = np.bincount(codes0, minlength=k)
        lex = np.argsort(uniq0, kind="stable")
        order = np.argsort(-counts[lex], kind="stable")
        final = lex[order]
        rank = np.empty(k, dtype=np.int64)
        rank[final] = np.arange(k)
        return uniq0[final], rank[codes0].astype(np.uint64)
    uniques, codes, counts = np.unique(values, return_inverse=True, return_counts=True)
    if uniques.nbytes > budget:
        return None
    order = np.argsort(-counts, kind="stable")
    rank = np.empty(len(uniques), dtype=np.int64)
    rank[order] = np.arange(len(uniques))
    return uniques[order], rank[codes].astype(np.uint64)


def build_bytes(
    data: bytes, offsets: np.ndarray, budget: int = DEFAULT_DICT_BUDGET
):
    """Dictionary for a byte-array column given Arrow-style (data, offsets).

    Uses Arrow's hash-based dictionary_encode (C++, single pass — the
    same family as the reference's per-value hash-map insert,
    dictpage.go:150-204) instead of sorting an object array; the final
    code order is then replicated exactly as before — descending
    frequency with lexicographic tie-break — so encoded blobs are
    byte-identical to the historical np.unique formulation.
    """
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    if n == 0:
        return np.array([], dtype=object), np.zeros(0, dtype=np.uint64)
    import pyarrow as pa

    arr = pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(offsets), pa.py_buffer(data)],
        null_count=0,
    )
    denc = arr.dictionary_encode()
    codes0 = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq_list = denc.dictionary.to_pylist()  # first-occurrence order
    k = len(uniq_list)
    counts = np.bincount(codes0, minlength=k)
    # replicate np.unique + stable argsort(-counts): lexicographic uniques,
    # then descending frequency with ties kept in lex order
    lex = sorted(range(k), key=lambda i: uniq_list[i])
    order = np.argsort(-counts[lex], kind="stable")
    final = [lex[int(i)] for i in order]
    rank = np.empty(k, dtype=np.int64)
    rank[final] = np.arange(k)
    uniq_bytes = [uniq_list[i] for i in final]
    codes = rank[codes0]
    size = sum(len(u) for u in uniq_bytes) + 4 * k
    if size > budget:
        return None
    return uniq_bytes, codes.astype(np.uint64)


def index_bit_width(dict_size: int) -> int:
    """bits.Len(dict_size - 1), min 1 (dictpage.go:275-278)."""
    return max(1, int(dict_size - 1).bit_length()) if dict_size > 0 else 1


def encode_indices(codes: np.ndarray, dict_size: int) -> bytes:
    bw = index_bit_width(dict_size)
    return bytes([bw]) + rle.encode(codes, bw)


def decode_indices(buf: bytes, count: int, dict_size: int) -> np.ndarray:
    if len(buf) < 1:
        raise ValueError("missing dictionary index bit-width byte")
    bw = buf[0]
    if bw > 32:
        raise ValueError(f"dictionary index width {bw} too large")
    codes = rle.decode(buf[1:], bw, count)
    if len(codes) and codes.max() >= dict_size:
        raise ValueError("dictionary index out of range")  # page_read.go:29-57
    return codes


def _code_width(dict_size: int) -> int:
    return 1 if dict_size <= 256 else (2 if dict_size <= 65536 else 4)


def encode_codes_bss(codes: np.ndarray, dict_size: int) -> bytes:
    """Byte-plane-split codes at the narrowest byte width.

    With frequency-ordered dictionaries (build_numeric) the high byte
    planes are near-constant zero, which the outer block compressor
    collapses — measured ~10% smaller AND ~6x faster than RLE/bit-packed
    indices on Zipf token chunks (no per-run work, one transpose)."""
    w = _code_width(dict_size)
    dt = {1: np.uint8, 2: np.uint16, 4: np.uint32}[w]
    cw = np.ascontiguousarray(codes.astype(dt))
    planes = cw.view(np.uint8).reshape(len(cw), w).T.copy().tobytes()
    return bytes([w]) + planes


def decode_codes_bss(buf: bytes, count: int, dict_size: int) -> np.ndarray:
    if len(buf) < 1:
        raise ValueError("missing dict_bss code width byte")
    w = buf[0]
    if w not in (1, 2, 4):
        raise ValueError(f"bad dict_bss code width {w}")
    if len(buf) - 1 < count * w:
        raise ValueError("truncated dict_bss codes")
    planes = np.frombuffer(buf, dtype=np.uint8, count=count * w, offset=1)
    dt = {1: np.uint8, 2: np.uint16, 4: np.uint32}[w]
    codes = (
        planes.reshape(w, count).T.copy().view(dt).ravel()
        if count
        else np.zeros(0, dtype=dt)
    )
    if len(codes) and codes.max() >= dict_size:
        raise ValueError("dictionary index out of range")
    return codes.astype(np.uint64)


def encode_dict_values_numeric(uniques: np.ndarray) -> bytes:
    return plainc.encode_numeric(uniques)


def encode_dict_values_bytes(uniq_bytes: list[bytes]) -> bytes:
    data = b"".join(uniq_bytes)
    offsets = np.zeros(len(uniq_bytes) + 1, dtype=np.int64)
    np.cumsum([len(u) for u in uniq_bytes], out=offsets[1:])
    return plainc.encode_byte_array(data, offsets)
