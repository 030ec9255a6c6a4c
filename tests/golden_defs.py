"""Golden-frame corpus definitions (shared by the generator and the test).

The reference validates against committed files from apache/parquet-testing
(/root/reference/Makefile:13-19,74-81) so that format drift — not just
roundtrip symmetry — is caught: a writer+reader that both change stay
self-consistent while silently breaking every frame already on disk.
This module defines deterministic inputs + encode options; the committed
``tests/golden/*.bin`` frames were written by ``tools/make_golden_frames.py``
at a pinned revision, and ``tests/test_golden_frames.py`` asserts today's
decoder still reads every one of them bit-exactly. Encoders stay free to
evolve (golden frames are never re-encoded by the test); decoders must
stay backward-compatible.

Inputs are seeded-deterministic: the test regenerates them independently
of the stored bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

GOLDEN_KEY = bytes(range(32))  # fixed test key for the encrypted case


def _rng(tag: int) -> np.random.Generator:
    return np.random.default_rng(0xA11CE + tag)


def _tokens(n: int, tag: int) -> np.ndarray:
    """Zipf-ish int32 tokens like the engine's target column."""
    u = _rng(tag).random(n)
    ranks = np.minimum(np.power(np.maximum(u, 1e-12), -1.0 / 0.1), 50257.0)
    return ((np.floor(ranks).astype(np.int64) - 1) % 50257).astype(np.int32)


def _words(n: int, tag: int) -> list[str]:
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "compression", "dictionary"]
    idx = _rng(tag).integers(0, len(vocab), size=(n, 3))
    return [" ".join(vocab[j] for j in row) for row in idx]


def _prices(n: int, tag: int) -> np.ndarray:
    return np.round(_rng(tag).uniform(900.0, 105000.0, n), 2)


# name -> (build_array, encode_kwargs). Every case is a single
# encode_chunk / encode_chunk_paged call; names are the file stems.
CASES: dict = {
    "plain_int64": (
        lambda: pa.array(_rng(1).integers(-(2**40), 2**40, 5000)),
        {"codec": "plain", "compression": None},
    ),
    "for_bitpack_int32": (
        lambda: pa.array(
            _rng(2).integers(1000, 9000, 5000).astype(np.int32)
        ),
        {"codec": "for_bitpack", "compression": "zstd"},
    ),
    "rle_int64": (
        lambda: pa.array(np.repeat(_rng(3).integers(0, 5, 100), 60)),
        {"codec": "rle", "compression": None},
    ),
    "delta_bp_int64": (
        lambda: pa.array(np.cumsum(_rng(4).integers(0, 100, 5000))),
        {"codec": "delta_binary_packed", "compression": "snappy"},
    ),
    "bss_float64": (
        lambda: pa.array(_rng(5).standard_normal(4000)),
        {"codec": "byte_stream_split", "compression": "zstd"},
    ),
    "rans_tokens": (
        lambda: pa.array(_tokens(50000, 6)),
        {"codec": "rans", "compression": None},
    ),
    "dict_rans_str": (
        lambda: pa.array([f"source_{i % 7}" for i in range(8000)]),
        {"codec": "dict_rans", "compression": None},
    ),
    "dict_str": (
        lambda: pa.array([f"cat{i % 40}" for i in range(6000)]),
        {"codec": "dict", "compression": "zstd"},
    ),
    "dict_bss_int64": (
        lambda: pa.array(np.repeat(_rng(7).integers(0, 200, 500), 12)),
        {"codec": "dict_bss", "compression": "zstd"},
    ),
    "fsst_text": (
        lambda: pa.array(_words(3000, 8)),
        {"codec": "fsst", "compression": None},
    ),
    "delta_ba_sorted": (
        lambda: pa.array(sorted(f"user-{i:08d}" for i in range(4000))),
        {"codec": "delta_byte_array", "compression": None},
    ),
    "delta_length_ba": (
        lambda: pa.array(_words(2500, 9)),
        {"codec": "delta_length_byte_array", "compression": "gzip"},
    ),
    "plain_ba": (
        lambda: pa.array(_words(1000, 10)),
        {"codec": "plain_byte_array", "compression": "lz4"},
    ),
    "alp_prices": (
        lambda: pa.array(_prices(6000, 11)),
        {"codec": "alp", "compression": "zstd"},
    ),
    "alp_exceptions": (
        lambda: pa.array(
            np.concatenate([_prices(500, 12),
                            [np.nan, np.inf, -np.inf, -0.0, 1e300]])
        ),
        {"codec": "alp", "compression": None},
    ),
    "bool_rle": (
        lambda: pa.array(np.repeat([True, False, True], [700, 900, 401])),
        {"codec": "rle", "compression": None},
    ),
    "nullable_int": (
        lambda: pa.array(
            [None if i % 7 == 0 else int(i * 3) for i in range(3000)],
            type=pa.int64(),
        ),
        {"codec": "auto", "compression": "zstd"},
    ),
    "list_int32": (
        lambda: pa.array(
            [_tokens(int(k), 13 + int(k)).tolist()
             for k in _rng(14).integers(0, 40, 300)],
            type=pa.list_(pa.int32()),
        ),
        {"codec": "auto", "compression": "zstd"},
    ),
    "struct_cols": (
        lambda: pa.array(
            [{"a": int(i), "b": f"s{i % 9}"} for i in range(2000)],
            type=pa.struct([("a", pa.int64()), ("b", pa.utf8())]),
        ),
        {"codec": "auto", "compression": "zstd"},
    ),
    "map_str_int": (
        lambda: pa.array(
            [[(f"k{j}", i * j) for j in range(i % 4)] for i in range(1500)],
            type=pa.map_(pa.utf8(), pa.int64()),
        ),
        {"codec": "auto", "compression": "zstd"},
    ),
    "decimal_15_2": (
        lambda: pa.array(
            [__import__("decimal").Decimal(f"{x:.2f}")
             for x in _rng(15).uniform(0, 1e6, 2000)],
            type=pa.decimal128(15, 2),
        ),
        {"codec": "auto", "compression": "zstd"},
    ),
    "flba_16": (
        lambda: pa.array(
            [bytes(row) for row in
             _rng(16).integers(0, 256, (800, 16)).astype(np.uint8)],
            type=pa.binary(16),
        ),
        {"codec": "auto", "compression": "zstd"},
    ),
    "float16": (
        lambda: pa.array(
            _rng(17).standard_normal(1200).astype(np.float16),
            type=pa.float16(),
        ),
        {"codec": "auto", "compression": "zstd"},
    ),
    "timestamp_us": (
        lambda: pa.array(
            (1_600_000_000_000_000
             + np.cumsum(_rng(18).integers(0, 10_000_000, 2000))
             ).astype("datetime64[us]")
        ),
        {"codec": "delta_binary_packed", "compression": "zstd"},
    ),
    "date32": (
        lambda: pa.array(
            _rng(19).integers(10_000, 20_000, 1500).astype(np.int32),
            type=pa.int32(),
        ).cast(pa.date32()),
        {"codec": "auto", "compression": "zstd"},
    ),
    "brotli_wrap": (
        lambda: pa.array(_words(2000, 20)),
        {"codec": "plain_byte_array", "compression": "brotli"},
    ),
    "lz4_raw_wrap": (
        lambda: pa.array(_tokens(10000, 21)),
        {"codec": "for_bitpack", "compression": "lz4_raw"},
    ),
    "paged_rans": (
        lambda: pa.array(_tokens(40000, 22)),
        {"codec": "rans", "compression": "zstd", "page_rows": 8000},
    ),
    "encrypted_zstd": (
        lambda: pa.array(_words(1500, 23)),
        {"codec": "fsst", "compression": "zstd",
         "encryption_key": GOLDEN_KEY},
    ),
    "uint64_full_span": (
        lambda: pa.array(
            _rng(24).integers(-(2**63), 2**63, 3000).view(np.uint64)
        ),
        {"codec": "auto", "compression": "zstd"},
    ),
    "int16_dict": (
        lambda: pa.array(
            (_rng(25).integers(0, 12, 4000) * 37 - 200).astype(np.int16)
        ),
        {"codec": "dict", "compression": "zstd"},
    ),
    "timestamp_ns_tz": (
        lambda: pa.array(
            _rng(26).integers(0, 2**60, 2000), type=pa.int64()
        ).view(pa.timestamp("ns", tz="UTC")),
        {"codec": "auto", "compression": "zstd"},
    ),
    "time32_ms": (
        lambda: pa.array(
            _rng(27).integers(0, 86_400_000, 2500).astype(np.int32),
            type=pa.int32(),
        ).view(pa.time32("ms")),
        {"codec": "auto", "compression": "zstd"},
    ),
}

# --- appended after the rANS lane-policy change (n//8192 picker): these
# pin the NEW policy's bytes while the earlier rans_* files keep pinning
# the OLD one (lane count is self-described; both must decode forever)
CASES.update({
    "rans_tokens_lanes8192": (
        lambda: pa.array(
            _rng(30).integers(0, 50_000, 120_000).astype(np.int64)
        ),
        {"codec": "rans", "compression": None},
    ),
    "paged_rans_lanes8192": (
        lambda: pa.array(
            (_rng(31).integers(0, 900, 90_000) ** 2 % 7000).astype(np.int32)
        ),
        {"codec": "rans", "compression": "zstd", "page_rows": 16_000},
    ),
})
