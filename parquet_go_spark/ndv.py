"""Per-chunk HyperLogLog NDV registers for the manifest.

The stats layer a table format's planner actually wants beyond min/max:
an approximate distinct count per column answerable from metadata alone.
Each encoded chunk stores its p=12 HLL register array (4 KiB raw, zlib'd
to ~1 KiB) in the manifest; at plan time the registers merge with an
elementwise max — HLL merge is EXACT with respect to the union of the
hashed values, so the manifest-merged estimate is bit-identical to a
single HLL built over the whole table. That identity is the correctness
contract: the driver-gate query compares the manifest path against a
whole-table relational HLL (operators/sketch.py) whose DuckDB oracle
re-derives the hash — three independent computations, one answer.

The hash is Spark's ``xxhash64`` (seed 42) so registers computed here in
numpy (bloom.py's vectorized XXH64 kernels) agree with registers any
Spark SQL expression would derive: integral/date/timestamp values hash
through the 8-byte LE path exactly like Spark promotes them to LONG,
strings/binary through the byte-string path. Float columns are refused
(Spark hashes float32 through a 4-byte path this module does not model,
and NDV-of-measure is not a planner question).

No analog in the reference (its only cardinality logic is the dict-cap
fallback, internal/layout/dictpage.go:161-195); Iceberg carries the same
idea as puffin theta sketches attached to data files.
"""

from __future__ import annotations

import zlib

import numpy as np

from . import bloom

P = 12
M = 1 << P
_MASK = np.uint64((1 << (64 - P)) - 1)  # low 52 bits
_SEED = 42  # Spark's xxhash64 default seed
_MAGIC = b"NDV1"

# alpha_m * m^2 * 2^53 with every operand/order identical to the SQL in
# operators/sketch.py (_ALPHA_SQL * _M2_POW53): exact doubles throughout,
# one correctly-rounded division per estimate
_ALPHA = 0.7213 / (1.0 + 1.079 / 4096.0)
_M2_POW53 = 151115727451828646838272.0  # 2^77, exact


def supported(arrow_type) -> bool:
    import pyarrow as pa

    return (
        pa.types.is_integer(arrow_type)
        or pa.types.is_string(arrow_type)
        or pa.types.is_binary(arrow_type)
        or pa.types.is_date32(arrow_type)
        or pa.types.is_timestamp(arrow_type)
    )


def _xxh64_u32(vals: np.ndarray, seed: int) -> np.ndarray:
    """Spark's XXH64.hashInt twin: the 4-byte single-word path with the
    int ZERO-extended (input & 0xFFFFFFFF) — Spark routes byte / short /
    int / date / boolean through this, NOT through the long path."""
    p1, p2, p3, p5 = bloom._P1, bloom._P2, bloom._P3, bloom._P5
    with np.errstate(over="ignore"):
        acc = np.uint64(seed) + p5 + np.uint64(4)
        a = acc ^ (vals.astype(np.uint32).astype(np.uint64) * p1)
        acc = bloom._rotl(a, 23) * p2 + p3
        acc ^= acc >> np.uint64(33)
        acc *= p2
        acc ^= acc >> np.uint64(29)
        acc *= p3
        acc ^= acc >> np.uint64(32)
    return acc


def _hashes(arr) -> np.ndarray:
    """Spark-equivalent xxhash64 (seed 42) of the non-null values."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.drop_null()
    t = arr.type
    if pa.types.is_timestamp(t) or (
            pa.types.is_integer(t) and t.bit_width == 64):
        # LONG family: XXH64 of the 8-byte LE value
        vals = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return bloom.xxhash64_u64(vals.astype(np.int64), seed=_SEED)
    if pa.types.is_integer(t) or pa.types.is_date32(t):
        # INT family (byte/short/int/date): Spark's 4-byte hashInt path
        vals = arr.cast(pa.int32()).to_numpy(zero_copy_only=False)
        return _xxh64_u32(vals.astype(np.int32), seed=_SEED)
    if pa.types.is_string(t) or pa.types.is_binary(t):
        vals = [v.encode() if isinstance(v, str) else v
                for v in arr.to_pylist()]
        return bloom.xxhash64_bytes(vals, seed=_SEED)
    raise TypeError(f"ndv unsupported type {t}")


def registers_of(arr) -> np.ndarray:
    """uint8[M] HLL registers of an Arrow array's non-null values."""
    h = _hashes(arr)
    regs = np.zeros(M, np.uint8)
    if len(h) == 0:
        return regs
    bucket = (h >> np.uint64(64 - P)).astype(np.int64)
    w = (h & _MASK).astype(np.float64)  # < 2^52: exact as double
    # frexp exponent of an exactly-represented positive int IS its bit
    # length, so rho = 53 - bit_length(w) with w=0 -> 53 (matches the
    # SQL twin's length(conv(w, 10, 2)) arithmetic bit for bit)
    _, e = np.frexp(w)
    rho = np.where(w == 0.0, 53, 53 - e).astype(np.uint8)
    np.maximum.at(regs, bucket, rho)
    return regs


def to_blob(regs: np.ndarray) -> bytes:
    return _MAGIC + bytes([P]) + zlib.compress(regs.tobytes(), 6)


def from_blob(blob: bytes) -> np.ndarray:
    if blob[:4] != _MAGIC:
        raise ValueError("not an NDV register blob")
    if blob[4] != P:
        raise ValueError(f"NDV precision {blob[4]} != {P}")
    regs = np.frombuffer(zlib.decompress(blob[5:]), np.uint8)
    if len(regs) != M:
        raise ValueError("NDV register count mismatch")
    return regs


def build(arr) -> bytes:
    return to_blob(registers_of(arr))


def merge(blobs) -> np.ndarray:
    """Elementwise-max merge of register blobs (exact w.r.t. the union
    of the hashed value sets)."""
    out = np.zeros(M, np.uint8)
    for b in blobs:
        np.maximum(out, from_blob(b), out=out)
    return out


def fold(regs: np.ndarray) -> dict:
    """The deterministic HLL summary of a register array, in the same
    exact-arithmetic shape as operators/sketch.hll_distinct_df:
    ``registers_sum`` = sum over registers of 2^(53 - rho) as an exact
    int (the DECIMAL(38,0) twin), ``est_raw`` = one IEEE division of
    exact doubles, ``est`` = the bias-corrected estimate (ln-based,
    pinned by pytest, excluded from cross-engine comparison)."""
    from .operators.sketch import hll_estimate

    cnt = np.bincount(regs, minlength=54)
    registers_sum = sum(int(c) << (53 - r) for r, c in enumerate(cnt) if c)
    zero = int(cnt[0])
    est_raw = (_ALPHA * _M2_POW53) / float(registers_sum)
    return {
        "zero_registers": zero,
        "registers_sum": registers_sum,
        "est_raw": est_raw,
        "est": hll_estimate(registers_sum, zero),
    }
