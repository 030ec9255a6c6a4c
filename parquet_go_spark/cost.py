"""Sampled cost-based codec auto-selection.

Generalizes the reference's single adaptive encoding decision — the
dictionary byte-budget fallback to PLAIN
(/root/reference/internal/layout/dictpage.go:161-195,
 writer/writer.go:21-22) — into a two-stage selection per column chunk:

  1. closed-form size estimates from contiguous-sample statistics
     (cardinality, run fraction, value range, delta bit widths) rank the
     candidate codecs;
  2. the top candidates are *trial-encoded on the sample and
     trial-compressed with the frame's block codec*, and the smallest
     final-bytes candidate wins (chunk.py drives stage 2 so the kernels
     aren't duplicated here).

Contiguous (not strided) sampling matters: run lengths and delta widths are
adjacency properties — a strided sample made random data look
delta-friendly by a factor of log2(stride) bits.

Guarantee required by the north rule ("compressed size <= the reference
writer's output"): the candidate set always contains the reference's
default family (dictionary with budget fallback to PLAIN), and after the
full encode the chunk layer re-checks the winner against PLAIN, so
selection can never do worse than the reference's static choice.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from . import frame
from .codecs import delta as delta_codec
from .codecs import deltaba, dictionary, fsst, rans

SAMPLE_TARGET = 262_144  # values sampled per chunk for stats + trials;
                         # 64k was too small for zstd's long-range matching
                         # to rank plane-split codecs correctly (measured:
                         # BSS vs FOR flipped order between 64k and full)
TRIAL_CANDIDATES = 3     # codecs trial-encoded in stage 2


def contiguous_sample(values: np.ndarray, target: int = SAMPLE_TARGET) -> np.ndarray:
    """Head + middle + tail contiguous segments (adjacency-preserving).

    The segments must be pairwise DISJOINT: when n is only slightly above
    target, a naive mid=n//2 start overlaps the tail segment, and the
    duplicated block makes the zstd trial stage overestimate the
    compressibility of positional codecs (BSS planes keep the duplicate
    for long-range matching; entropy-coded streams destroy it) — measured
    as a 10% bias that mis-ranked BSS over rANS at n=1.15x target."""
    n = len(values)
    if n <= target:
        return values
    seg = target // 3
    mid = min(max(n // 2 - seg // 2, seg), n - 2 * seg)
    return np.concatenate(
        (values[:seg], values[mid : mid + seg], values[n - seg :])
    )


@dataclass
class IntStats:
    n: int
    vmin: int
    vmax: int
    distinct_est: float
    run_frac: float         # fraction of positions starting a new run
    delta_bits_mean: float  # mean miniblock bit width simulated on sample
    sorted_frac: float
    entropy_bits: float | None = None  # sample Shannon entropy (None: span too wide)


def int_stats(values: np.ndarray) -> IntStats:
    n = len(values)
    if n == 0:
        return IntStats(0, 0, 0, 0.0, 0.0, 0.0, 1.0)
    s = contiguous_sample(values)
    vmin, vmax = int(values.min()), int(values.max())
    uniq = len(np.unique(s))
    if uniq >= 0.5 * len(s):
        distinct = uniq / max(len(s), 1) * n  # high-card: scale up
    else:
        distinct = float(uniq)
    if len(s) > 1:
        d = np.diff(s.astype(np.int64))
        run_frac = float(np.count_nonzero(d != 0) + 1) / len(s)
        sorted_frac = float(np.count_nonzero(d >= 0)) / (len(s) - 1)
        # simulate the encoder: per-32-miniblock width over per-128-block min
        m = len(d)
        nblk = max(m // 128, 1)
        dd = d[: nblk * 128].reshape(nblk, 128) if m >= 128 else d.reshape(1, -1)
        mins = dd.min(axis=1, keepdims=True)
        adj = (dd - mins).astype(np.uint64)
        mb = adj.reshape(-1, 32) if adj.shape[1] % 32 == 0 else adj
        widths = delta_codec.bit_length_array(mb.max(axis=1))
        delta_bits = float(widths.mean())
    else:
        run_frac, sorted_frac, delta_bits = 1.0, 1.0, 0.0
    entropy = None
    if rans.applicable(vmin, vmax, n):
        counts = np.bincount((s.astype(np.int64) - vmin))
        entropy = rans.estimate_bits_per_value(counts)
    elif uniq <= 0.5 * len(s):
        # wide span, modest cardinality: value entropy (== dict-code
        # entropy) from sample unique counts, for the DICT_RANS estimate
        _, ucounts = np.unique(s, return_counts=True)
        entropy = rans.estimate_bits_per_value(ucounts)
    return IntStats(
        n, vmin, vmax, distinct, run_frac, delta_bits, sorted_frac, entropy
    )


def estimate_int_sizes(st: IntStats, itemsize: int) -> dict[int, float]:
    """Predicted encoded bytes per codec for an integer chunk (stage 1)."""
    n = st.n
    if n == 0:
        return {frame.PLAIN: 0.0}
    est: dict[int, float] = {}
    est[frame.PLAIN] = float(n * itemsize)
    span = st.vmax - st.vmin
    bw = max(int(span).bit_length(), 1)
    est[frame.FOR_BITPACK] = n * bw / 8 + 16
    runs = max(st.run_frac * n, 1.0)
    est[frame.RLE] = runs * (2 + itemsize) + 8
    est[frame.DELTA_BP] = n * st.delta_bits_mean / 8 + (n / 128) * 6 + 16
    card = max(st.distinct_est, 1.0)
    dict_bytes = card * itemsize
    if dict_bytes <= dictionary.DEFAULT_DICT_BUDGET:
        code_bw = max(int(max(card - 1, 0)).bit_length(), 1)
        code_payload = min(n * code_bw / 8, runs * (2 + code_bw / 8) + n * 0.02)
        est[frame.DICT] = dict_bytes + code_payload + 24
        # byte-width codes: bigger raw, but the trial stage sees post-
        # compression sizes where the zero planes vanish
        est[frame.DICT_BSS] = dict_bytes + n * ((code_bw + 7) // 8) + 24
        if st.entropy_bits is not None and card < rans.MAX_NFREQ:
            # entropy-coded dict codes: reaches wide-span skewed columns
            # (user ids, keys) that the span gate bars from direct RANS
            est[frame.DICT_RANS] = (
                dict_bytes + n * st.entropy_bits / 8 + card * 2 + 64
            )
    if st.entropy_bits is not None and rans.applicable(st.vmin, st.vmax, n):
        # entropy coding: n*H payload + frequency table + per-lane state.
        # The applicability gate uses the FULL-chunk span (vmin/vmax come
        # from all values, not the sample): entropy_bits is also set by the
        # wide-span dict branch above, where direct RANS cannot encode —
        # without the gate a sample trial can succeed (sample missed the
        # outliers) and the full-chunk encode then raises.
        nfreq = span + 1
        lanes = min(max(n // 1024, 4), rans.MAX_LANES)
        est[frame.RANS] = (
            n * st.entropy_bits / 8 + nfreq * 2 + lanes * 8 + 32
        )
    return est


def rank_int_codecs(values: np.ndarray, itemsize: int) -> list[int]:
    """Stage-1 ranking: candidate codec ids, cheapest estimate first."""
    st = int_stats(values)
    est = estimate_int_sizes(st, itemsize)
    return sorted(est, key=est.get)


def rank_float_codecs(values: np.ndarray) -> list[int]:
    n = len(values)
    if n == 0:
        return [frame.PLAIN]
    s = contiguous_sample(values)
    uniq = len(np.unique(s))
    cands = [frame.BSS, frame.PLAIN]
    if uniq <= 0.5 * len(s):
        distinct = uniq if uniq < 0.5 * len(s) else uniq / len(s) * n
        if distinct * values.dtype.itemsize <= dictionary.DEFAULT_DICT_BUDGET:
            # entropy-coded codes first: low-cardinality numeric columns
            # (prices, quantities, rates) are usually skewed too
            if distinct < rans.MAX_NFREQ:
                cands.insert(0, frame.DICT_RANS)
            cands.insert(1, frame.DICT)
    return cands


def trial_pick(
    sample_encoders: dict[int, "callable"],
    candidates: list[int],
    compression: str | None,
    max_trials: int = TRIAL_CANDIDATES,
) -> int:
    """Stage 2: encode the sample per candidate, compress, pick min bytes."""
    codec = frame.get_compressor(compression)
    best, best_size = None, float("inf")
    for cid in candidates[:max_trials]:
        try:
            payload = sample_encoders[cid]()
        except Exception:
            continue
        size = len(codec.compress(payload)) if codec else len(payload)
        if size < best_size:
            best, best_size = cid, size
    return best if best is not None else frame.PLAIN


def trial_pick_scaled(
    part_encoders: dict[int, "callable"],
    candidates: list[int],
    compression: str | None,
) -> int:
    """Stage 2 with per-section scaling: each encoder returns a list of
    (payload_bytes, scale) parts; projected full-chunk size is
    sum(len(compress(payload)) * scale). This fixes the dictionary-family
    bias of flat sample trials — the dictionary section amortizes over the
    whole chunk (scales with cardinality growth) while the codes section
    scales with row count; compressing them together at sample size made
    dict codecs look ~20%% worse than they are at chunk size."""
    codec = frame.get_compressor(compression)
    best, best_size = None, float("inf")
    for cid in candidates:
        try:
            parts = part_encoders[cid]()
        except Exception:
            continue
        size = 0.0
        for payload, scale in parts:
            csize = len(codec.compress(payload)) if codec else len(payload)
            size += csize * scale
        if size < best_size:
            best, best_size = cid, size
    return best if best is not None else frame.PLAIN


def rank_string_codecs(
    data, offsets: np.ndarray, compression: str | None = "zstd",
    sample_rows: int = 1024,
) -> int:
    """Trial-encode a contiguous row sample for every string codec and pick
    the smallest after block compression (strings are too data-dependent
    for closed forms)."""
    n = len(offsets) - 1
    if n == 0:
        return frame.PLAIN_BA
    k = min(n, sample_rows)
    # contiguous head + tail halves (adjacency matters for DELTA_BA)
    head = k // 2
    tail = k - head
    rows = np.concatenate(
        (np.arange(head), np.arange(n - tail, n))
    ) if n > k else np.arange(n)
    rows = np.unique(rows)
    lengths = np.diff(offsets)
    s_len = lengths[rows]
    s_off = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(s_len, out=s_off[1:])
    total = int(s_off[-1])
    arr = np.frombuffer(data, dtype=np.uint8)
    if total:
        src = (
            np.arange(total, dtype=np.int64)
            - np.repeat(s_off[:-1], s_len)
            + np.repeat(offsets[:-1][rows], s_len)
        )
        s_data = arr[src].tobytes()
    else:
        s_data = b""

    comp = frame.get_compressor(compression)

    def z(b: bytes) -> float:
        return float(len(comp.compress(b))) if comp else float(len(b))

    from .codecs import plainc

    ns = max(len(rows), 1)
    row_scale = n / ns  # per-row payload sections scale with row count

    sizes: dict[int, float] = {}
    sizes[frame.PLAIN_BA] = z(plainc.encode_byte_array(s_data, s_off)) * row_scale
    sizes[frame.DELTA_LENGTH_BA] = (
        z(deltaba.encode_delta_length(s_data, s_off)) * row_scale
    )
    sizes[frame.DELTA_BA] = z(deltaba.encode_delta_ba(s_data, s_off)) * row_scale
    built = dictionary.build_bytes(s_data, s_off, budget=1 << 30)
    if built is not None:
        uniq, codes = built
        card_frac = len(uniq) / ns
        # scale the dictionary section by full-chunk cardinality, the code
        # section by row count (same split as trial_pick_scaled for ints)
        full_card = len(uniq) if card_frac < 0.5 else card_frac * n
        card_scale = max(full_card / max(len(uniq), 1), 1.0)
        dict_blob = dictionary.encode_dict_values_bytes(uniq)
        full_dict_bytes = (sum(len(u) for u in uniq) + 4 * len(uniq)) * card_scale
        if full_dict_bytes <= dictionary.DEFAULT_DICT_BUDGET:
            dict_part = z(dict_blob) * card_scale
            sizes[frame.DICT] = (
                dict_part
                + z(dictionary.encode_indices(codes, len(uniq))) * row_scale
            )
            sizes[frame.DICT_BSS] = (
                dict_part
                + z(dictionary.encode_codes_bss(codes, len(uniq))) * row_scale
            )
            if rans.applicable(0, len(uniq) - 1, len(codes)):
                fixed, var = rans.split_fixed(
                    rans.encode_ints(codes)
                )
                sizes[frame.DICT_RANS] = (
                    dict_part + z(fixed) * card_scale + z(var) * row_scale
                )
    try:
        merges, symbols = fsst.train(s_data, s_off)
        if symbols:
            blob = fsst.encode(s_data, s_off, merges, symbols)
            head_len = 2 + len(symbols) + sum(len(s) for s in symbols)
            # symbol table is fixed; lengths+payload scale with rows
            sizes[frame.FSST] = float(head_len) + z(blob[head_len:]) * row_scale
    except Exception:
        pass
    return min(sizes, key=sizes.get)


# kept for backward compatibility with earlier callers
def choose_string_codec(data, offsets, sample_rows: int = 1024) -> int:
    return rank_string_codecs(data, offsets, None, sample_rows)
