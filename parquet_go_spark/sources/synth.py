"""Deterministic synthetic token-sequence table (BASELINE.json input_hint):

    doc_id:string, tokens:array<int32>, n_tok:int32, source:string

Row i is fully determined by (seed, i) via a splitmix64-style counter hash,
so any partitioning of the id range regenerates identical rows — the
property FIXTURES.md F1 requires for resume tests and for the
two-parallelism benchmark to see identical inputs.

Distributions follow FIXTURES.md F1: n_tok ~ lognormal(5.5, 1.2) clipped to
[1, 65536] (heavy-tailed — drives skew handling), tokens ~ Zipf-ish(1.1)
over a 50,257 vocab, source = 12 Zipf-weighted categories. Generation is
vectorized numpy inside mapInArrow — no per-row Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

VOCAB = 50_257
N_SOURCES = 12
MU, SIGMA = 5.5, 1.2
MAX_TOK = 65_536

_SOURCES = [f"source_{chr(ord('a') + i)}" for i in range(N_SOURCES)]
# Zipf weights over the 12 sources
_W = (1.0 / np.arange(1, N_SOURCES + 1) ** 1.1)
_CDF = np.cumsum(_W / _W.sum())


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — counter-based, stateless PRNG core."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def _uniform(ids: np.ndarray, tag: int, seed: int) -> np.ndarray:
    """U(0,1) from (seed, id, tag) — deterministic and order-free."""
    with np.errstate(over="ignore"):
        h = _mix64(
            ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ np.uint64(tag) * np.uint64(0xC2B2AE3D27D4EB4F)
            ^ np.uint64(seed)
        )
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def synth_batch(ids: np.ndarray, seed: int = 42) -> pa.RecordBatch:
    """Generate the rows for a block of ids as one Arrow batch."""
    n = len(ids)
    u1 = _uniform(ids, 1, seed)
    u2 = _uniform(ids, 2, seed)
    # Box-Muller -> standard normal -> lognormal n_tok
    z = np.sqrt(-2.0 * np.log(np.maximum(u1, 1e-300))) * np.cos(2 * np.pi * u2)
    n_tok = np.clip(np.exp(MU + SIGMA * z), 1, MAX_TOK).astype(np.int32)

    total = int(n_tok.sum(dtype=np.int64))
    # token j of row i hashes (seed, id_i, j) — vectorized over the flat array
    row_rep = np.repeat(ids.astype(np.uint64), n_tok)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    pos_in_row = np.arange(total, dtype=np.uint64) - np.repeat(
        offsets[:-1].astype(np.uint64), n_tok
    )
    with np.errstate(over="ignore"):
        h = _mix64(
            row_rep * np.uint64(0x9E3779B97F4A7C15)
            ^ (pos_in_row + np.uint64(1)) * np.uint64(0xD6E8FEB86659FD93)
            ^ np.uint64(seed * 3 + 7)
        )
    u_tok = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    # Zipf-ish rank sampling: rank ∝ u^(-1/(s-1)), s=1.1 -> heavy head
    # (clamp in float space before the int cast to avoid overflow)
    ranks_f = np.minimum(
        np.power(np.maximum(u_tok, 1e-12), -1.0 / 0.1), float(VOCAB)
    )
    ranks = np.floor(ranks_f).astype(np.int64)
    tokens_flat = ((ranks - 1) % VOCAB).astype(np.int32)

    src_u = _uniform(ids, 3, seed)
    src_idx = np.searchsorted(_CDF, src_u)
    src_dict = pa.array(_SOURCES, type=pa.utf8())
    source = pa.DictionaryArray.from_arrays(
        pa.array(src_idx.astype(np.int32)), src_dict
    ).cast(pa.utf8())

    # doc_id = "doc-%012d" — build bytes vectorized (12 digits + prefix)
    digits = np.zeros((n, 12), dtype=np.uint8)
    rem = ids.astype(np.int64).copy()
    for k in range(11, -1, -1):
        digits[:, k] = (rem % 10).astype(np.uint8) + ord("0")
        rem //= 10
    prefix = np.frombuffer(b"doc-", dtype=np.uint8)
    doc_bytes = np.empty((n, 16), dtype=np.uint8)
    doc_bytes[:, :4] = prefix
    doc_bytes[:, 4:] = digits
    doc_off = (np.arange(n + 1, dtype=np.int32) * 16)
    doc_id = pa.Array.from_buffers(
        pa.utf8(),
        n,
        [None, pa.py_buffer(doc_off.tobytes()), pa.py_buffer(doc_bytes.tobytes())],
    )

    tokens = pa.ListArray.from_arrays(
        offsets.astype(np.int32), pa.array(tokens_flat, type=pa.int32())
    )
    return pa.RecordBatch.from_arrays(
        [doc_id, tokens, pa.array(n_tok, type=pa.int32()), source],
        names=["doc_id", "tokens", "n_tok", "source"],
    )


SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def token_sequences(
    spark: SparkSession, n_rows: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic generation: spark.range -> mapInArrow."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_rows, 1, parts)

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column("id").to_numpy()
            yield synth_batch(ids, seed=seed)

    return base.mapInArrow(gen, schema=SCHEMA)


def token_sequences_local(n_rows: int, seed: int = 42) -> pa.Table:
    """Driver-side variant for unit tests (no Spark)."""
    return pa.Table.from_batches(
        [synth_batch(np.arange(n_rows, dtype=np.int64), seed=seed)]
    )
