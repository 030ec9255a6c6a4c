"""Split-block bloom filter (Parquet SBBF) — numpy-vectorized.

Re-creates the reference's bloom layer (/root/reference/internal/bloomfilter/
bloomfilter.go:14-100: 32-byte blocks, 8 salt constants, one bit set per
32-bit word, xxHash64 of the plain-encoded value; writer opt-in per column
/root/reference/writer/bloomfilter.go:40-130). The salts and block math are
from the public Parquet bloom-filter spec. Our engine stores one filter per
(partition, column) chunk in the lineage manifest, giving the same
point-lookup pruning the reference's per-row-group filters give a query
engine: no false negatives, so bloom-pruned decode + exact post-filter is
exact.

Everything is vectorized: hashing N int64 keys is ~10 numpy ops; probing is
a gather over the filter words. No per-row Python.
"""

from __future__ import annotations

import numpy as np

_SALT = np.array(
    [0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
     0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31],
    dtype=np.uint32,
)

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

MAGIC = b"SBF1"


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def xxhash64_u64(vals: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized xxHash64 of each value's 8-byte little-endian encoding —
    the hash the reference applies to PLAIN-encoded INT64 values."""
    x = np.ascontiguousarray(vals, dtype=np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        acc = np.uint64(seed) + _P5 + np.uint64(8)
        k1 = _rotl(x * _P2, 31) * _P1
        acc = acc ^ k1
        acc = _rotl(acc, 27) * _P1 + _P4
        acc ^= acc >> np.uint64(33)
        acc *= _P2
        acc ^= acc >> np.uint64(29)
        acc *= _P3
        acc ^= acc >> np.uint64(32)
    return acc


def xxhash64_u32(vals: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized xxHash64 of each value's 4-byte little-endian encoding
    (PLAIN-encoded INT32/FLOAT) — byte-identical to ``xxhash64_bytes``
    on the same 4-byte strings, with zero per-value python."""
    x = np.ascontiguousarray(vals).view("<u4").astype(np.uint64)
    with np.errstate(over="ignore"):
        acc = np.full(len(x), np.uint64(seed) + _P5 + np.uint64(4),
                      dtype=np.uint64)
        acc = _rotl(acc ^ (x * _P1), 23) * _P2 + _P3
        acc ^= acc >> np.uint64(33)
        acc *= _P2
        acc ^= acc >> np.uint64(29)
        acc *= _P3
        acc ^= acc >> np.uint64(32)
    return acc


def xxhash64_bytes(vals: list[bytes], seed: int = 0) -> np.ndarray:
    """xxHash64 of variable-length byte strings. Values are padded into a
    fixed-width matrix and hashed with the single-lane (< 32 byte) algorithm
    in vectorized strides; longer values fall back to per-value lanes."""
    n = len(vals)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    lens = np.fromiter((len(v) for v in vals), dtype=np.int64, count=n)
    width = int(lens.max()) if n else 0
    # pad into (n, ceil(width/8)*8) byte matrix, read as uint64 lanes
    w8 = max((width + 7) // 8 * 8, 8)
    mat = np.zeros((n, w8), dtype=np.uint8)
    for i, v in enumerate(vals):  # bounded by distinct values, not rows
        mat[i, : len(v)] = np.frombuffer(v, dtype=np.uint8)
    lanes = mat.view(np.uint64).reshape(n, w8 // 8)
    with np.errstate(over="ignore"):
        if width >= 32:
            # stripe counts differ per row; scalar path (distinct-value
            # bounded — called on pc.unique output, never per row)
            return np.fromiter(
                (_xxh64_scalar(bytes(v), seed) for v in vals),
                dtype=np.uint64, count=n,
            )
        acc = np.full(n, np.uint64(seed) + _P5, dtype=np.uint64) + lens.view(
            np.uint64
        )
        # consume full 8-byte lanes where the value has them
        nlanes = w8 // 8
        for li in range(nlanes):
            lane_active = lens >= (li + 1) * 8
            if not lane_active.any():
                break
            k1 = _rotl(lanes[:, li] * _P2, 31) * _P1
            na = np.where(lane_active, acc ^ k1, acc)
            na = np.where(lane_active, _rotl(na, 27) * _P1 + _P4, acc)
            acc = na
        # consume remaining 4-byte word, then bytes
        rem = (lens % 8).astype(np.int64)
        start8 = lens - rem
        for i in np.flatnonzero(rem >= 4):
            w = int.from_bytes(vals[i][start8[i]:start8[i] + 4], "little")
            a = (acc[i] ^ (np.uint64(w) * _P1))
            acc[i] = _rotl(a, 23) * _P2 + _P3
        tail_start = start8 + np.where(rem >= 4, 4, 0)
        for i in np.flatnonzero(lens - tail_start > 0):
            a = acc[i]
            for bpos in range(int(tail_start[i]), int(lens[i])):
                a = _rotl(a ^ (np.uint64(vals[i][bpos]) * _P5), 11) * _P1
            acc[i] = a
        acc ^= acc >> np.uint64(33)
        acc *= _P2
        acc ^= acc >> np.uint64(29)
        acc *= _P3
        acc ^= acc >> np.uint64(32)
    return acc


def _xxh64_scalar(data: bytes, seed: int = 0) -> int:
    """Reference-style scalar xxHash64 for long inputs (rare path)."""
    M = (1 << 64) - 1
    P1, P2, P3, P4, P5 = (int(_P1), int(_P2), int(_P3), int(_P4), int(_P5))

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i + 32 <= n:
            for vi in range(4):
                lane = int.from_bytes(data[i + vi * 8:i + vi * 8 + 8], "little")
                if vi == 0:
                    v1 = (rotl((v1 + lane * P2) & M, 31) * P1) & M
                elif vi == 1:
                    v2 = (rotl((v2 + lane * P2) & M, 31) * P1) & M
                elif vi == 2:
                    v3 = (rotl((v3 + lane * P2) & M, 31) * P1) & M
                else:
                    v4 = (rotl((v4 + lane * P2) & M, 31) * P1) & M
            i += 32
        acc = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            acc = ((acc ^ ((rotl((v * P2) & M, 31) * P1) & M)) * P1 + P4) & M
    else:
        acc = (seed + P5) & M
    acc = (acc + n) & M
    while i + 8 <= n:
        lane = int.from_bytes(data[i:i + 8], "little")
        acc = ((rotl(acc ^ ((rotl((lane * P2) & M, 31) * P1) & M), 27) * P1) + P4) & M
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i:i + 4], "little")
        acc = ((rotl(acc ^ ((lane * P1) & M), 23) * P2) + P3) & M
        i += 4
    while i < n:
        acc = (rotl(acc ^ ((data[i] * P5) & M), 11) * P1) & M
        i += 1
    acc ^= acc >> 33
    acc = (acc * P2) & M
    acc ^= acc >> 29
    acc = (acc * P3) & M
    acc ^= acc >> 32
    return acc


class SplitBlockBloom:
    """num_blocks 32-byte blocks, each 8 uint32 words; one bit per word."""

    def __init__(self, words: np.ndarray):
        assert words.dtype == np.uint32 and words.size % 8 == 0
        self.words = words  # shape (num_blocks, 8)

    @classmethod
    def sized(cls, ndv: int, fpp: float = 0.01) -> "SplitBlockBloom":
        """Reference sizing: bits ~ -ndv * ln(fpp) / ln(2)^2, rounded up to a
        power-of-two number of 256-bit blocks (bloomfilter.go NewBloomFilter)."""
        bits = max(int(-ndv * np.log(max(fpp, 1e-12)) / (np.log(2) ** 2)), 256)
        nblocks = 1 << max(int(np.ceil(np.log2(bits / 256))), 0)
        return cls(np.zeros((nblocks, 8), dtype=np.uint32))

    @classmethod
    def with_bytes(cls, nbytes: int) -> "SplitBlockBloom":
        """Explicitly-sized filter (the reference's bloomfiltersize tag,
        common/tag.go:74-78): bitset bytes rounded up to a power-of-two
        count of 32-byte blocks (the SBBF block-addressing requirement)."""
        nblocks = 1
        while nblocks * 32 < max(int(nbytes), 32):
            nblocks <<= 1
        return cls(np.zeros((nblocks, 8), dtype=np.uint32))

    def _addr(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        nblocks = np.uint64(self.words.shape[0])
        block = ((h >> np.uint64(32)) * nblocks) >> np.uint64(32)
        with np.errstate(over="ignore"):
            masks = (h.astype(np.uint32)[:, None] * _SALT[None, :]) >> np.uint32(27)
        return block.astype(np.int64), masks.astype(np.uint32)

    def insert_hashes(self, h: np.ndarray) -> None:
        block, bit = self._addr(h)
        vals = (np.uint32(1) << bit)  # (n, 8)
        np.bitwise_or.at(self.words, (block[:, None],
                                      np.broadcast_to(np.arange(8), vals.shape)),
                         vals)

    def check_hashes(self, h: np.ndarray) -> np.ndarray:
        block, bit = self._addr(h)
        want = (np.uint32(1) << bit)
        got = self.words[block]  # (n, 8)
        return ((got & want) == want).all(axis=1)

    def tobytes(self) -> bytes:
        return MAGIC + self.words.tobytes()

    @classmethod
    def frombytes(cls, buf: bytes) -> "SplitBlockBloom":
        if buf[:4] != MAGIC:
            raise ValueError("bad bloom magic")
        words = np.frombuffer(buf[4:], dtype=np.uint32).reshape(-1, 8).copy()
        return cls(words)


def hash_values(arr) -> np.ndarray:
    """Hash an array of keys the way the reference hashes plain-encoded
    values: ints through the 8-byte LE path, strings/bytes through the
    byte-string path."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_integer(arr.type):
        return xxhash64_u64(arr.cast(pa.int64()).to_numpy(zero_copy_only=False))
    if pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        vals = [
            v.encode() if isinstance(v, str) else v for v in arr.to_pylist()
        ]
        return xxhash64_bytes(vals)
    raise TypeError(f"bloom unsupported type {arr.type}")


def build_bloom(arr, fpp: float = 0.01) -> bytes:
    """Build a chunk bloom over the distinct values of an Arrow array.

    List columns bloom their ELEMENTS: membership probes ("which
    partitions may contain token T / word W") are the inverted-index
    primitive a token store needs — the reference blooms scalar columns
    only (writer/bloomfilter.go), this extends the same split-block
    filter to array cells."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    while pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        arr = arr.flatten()
    uniq = pc.unique(arr).drop_null()
    h = hash_values(uniq)
    bf = SplitBlockBloom.sized(max(len(uniq), 1), fpp)
    if len(h):
        bf.insert_hashes(h)
    return bf.tobytes()
