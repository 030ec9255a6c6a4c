"""Sampled cost-based codec auto-selection.

Generalizes the reference's single adaptive encoding decision — the
dictionary byte-budget fallback to PLAIN
(/root/reference/internal/layout/dictpage.go:161-195,
 writer/writer.go:21-22) — into a per-chunk argmin over closed-form size
estimates (numerics) and trial-encodes of a sample (strings).

Guarantee required by the north rule ("compressed size <= the reference
writer's output"): the candidate set always contains the reference's
default family (dictionary with budget fallback to PLAIN), and after the
full encode the chunk layer re-checks the winner against PLAIN and falls
back if the estimate was wrong — so the selection can never do worse than
the reference's static choice on the same chunk.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import frame
from .codecs import delta as delta_codec
from .codecs import deltaba, dictionary, fsst

SAMPLE_TARGET = 65_536  # values sampled per chunk for stats


@dataclass
class IntStats:
    n: int
    vmin: int
    vmax: int
    distinct_est: float
    run_frac: float        # fraction of positions starting a new run
    delta_bits_mean: float # mean bit_length of (delta - min_delta) on sample
    sorted_frac: float


def _sample(values: np.ndarray) -> np.ndarray:
    n = len(values)
    if n <= SAMPLE_TARGET:
        return values
    stride = n // SAMPLE_TARGET
    return values[::stride][:SAMPLE_TARGET]


def int_stats(values: np.ndarray) -> IntStats:
    n = len(values)
    if n == 0:
        return IntStats(0, 0, 0, 0.0, 0.0, 0.0, 1.0)
    s = _sample(values)
    vmin, vmax = int(values.min()), int(values.max())
    uniq = len(np.unique(s))
    # extrapolate distinct count (bounded birthday-style correction)
    if uniq >= 0.95 * len(s):
        distinct = uniq / max(len(s), 1) * n
    else:
        distinct = float(uniq)
    if len(s) > 1:
        d = np.diff(s.astype(np.int64))
        run_frac = float(np.count_nonzero(d != 0)) / (len(s) - 1)
        sorted_frac = float(np.count_nonzero(d >= 0)) / (len(s) - 1)
        dmin = int(d.min())
        adj = (d.astype(np.int64) - dmin).astype(np.uint64)
        delta_bits = float(delta_codec.bit_length_array(adj).mean())
    else:
        run_frac, sorted_frac, delta_bits = 1.0, 1.0, 0.0
    return IntStats(n, vmin, vmax, distinct, run_frac, delta_bits, sorted_frac)


def estimate_int_sizes(st: IntStats, itemsize: int) -> dict[int, float]:
    """Predicted encoded bytes per codec for an integer chunk."""
    n = st.n
    if n == 0:
        return {frame.PLAIN: 0.0}
    est: dict[int, float] = {}
    est[frame.PLAIN] = n * itemsize
    span = st.vmax - st.vmin
    bw = max(int(span).bit_length(), 1)
    est[frame.FOR_BITPACK] = n * bw / 8 + 16
    # RLE at full width (reference page_write_encode.go:21-40): runs only win
    runs = max(st.run_frac * n, 1.0)
    est[frame.RLE] = runs * (2 + itemsize) + 8
    # delta: per-value packed delta bits + ~6 bytes header per 128-block.
    # stride sampling inflates deltas by ~log2(stride) bits; compensate.
    stride_bits = max(np.log2(max(n / max(SAMPLE_TARGET, 1), 1.0)), 0.0)
    dbits = max(st.delta_bits_mean - stride_bits, 0.0)
    est[frame.DELTA_BP] = n * (dbits + 0.5) / 8 + (n / 128) * 6 + 16
    # dictionary (the reference's default family): values + packed codes
    card = max(st.distinct_est, 1.0)
    dict_bytes = card * itemsize
    if dict_bytes <= dictionary.DEFAULT_DICT_BUDGET:
        code_bw = max(int(max(card - 1, 0)).bit_length(), 1)
        # codes go through RLE-hybrid; credit run compression on repeated codes
        code_payload = min(n * code_bw / 8, runs * (2 + code_bw / 8) + n * 0.02)
        est[frame.DICT] = dict_bytes + code_payload + 24
    return est


def choose_int_codec(values: np.ndarray, itemsize: int) -> int:
    st = int_stats(values)
    est = estimate_int_sizes(st, itemsize)
    if st.vmin < 0:
        # FOR still works (shifted domain), RLE full-width works; keep all
        pass
    return min(est, key=est.get)


def choose_float_codec(values: np.ndarray) -> int:
    """Floats: PLAIN vs BYTE_STREAM_SPLIT vs DICT (low cardinality)."""
    n = len(values)
    if n == 0:
        return frame.PLAIN
    s = _sample(values)
    uniq = len(np.unique(s))
    if uniq <= 0.1 * len(s):
        distinct = uniq / max(len(s), 1) * n if uniq >= 0.95 * len(s) else uniq
        if distinct * values.dtype.itemsize <= dictionary.DEFAULT_DICT_BUDGET:
            return frame.DICT
    # BSS itself doesn't shrink; it pays off under block compression.
    # Heuristic from the BtrBlocks/BSS literature: pick BSS when the
    # fraction-part entropy is high (real-valued data), PLAIN otherwise.
    return frame.BSS


def choose_string_codec(
    data: bytes, offsets: np.ndarray, sample_rows: int = 512
) -> int:
    """Trial-encode a row sample for the data-dependent string codecs."""
    n = len(offsets) - 1
    if n == 0:
        return frame.PLAIN_BA
    k = min(n, sample_rows)
    stride = max(n // k, 1)
    rows = np.arange(0, n, stride)[:k]
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
    raw = total + 4 * len(rows)
    sizes: dict[int, float] = {frame.PLAIN_BA: float(raw)}
    sizes[frame.DELTA_LENGTH_BA] = float(
        len(deltaba.encode_delta_length(s_data, s_off))
    )
    sizes[frame.DELTA_BA] = float(len(deltaba.encode_delta_ba(s_data, s_off)))
    built = dictionary.build_bytes(s_data, s_off, budget=1 << 30)
    if built is not None:
        uniq, codes = built
        dict_sz = sum(len(u) for u in uniq) + 4 * len(uniq)
        # extrapolate: dictionary reuse only pays off if card ≪ n
        card_scale = len(uniq) / max(len(rows), 1)
        full_card = len(uniq) if card_scale < 0.95 else card_scale * n
        full_dict_bytes = dict_sz / max(len(uniq), 1) * full_card
        if full_dict_bytes <= dictionary.DEFAULT_DICT_BUDGET:
            bw = dictionary.index_bit_width(int(max(full_card, 1)))
            sizes[frame.DICT] = full_dict_bytes / max(n / max(len(rows), 1), 1) + len(
                rows
            ) * bw / 8
    try:
        merges, symbols = fsst.train(s_data, s_off)
        if symbols:
            sizes[frame.FSST] = float(len(fsst.encode(s_data, s_off, merges, symbols)))
    except Exception:
        pass
    return min(sizes, key=sizes.get)
