"""Binary statistics truncation for manifest bounds.

Re-creates the reference's stats-truncation policy
(/root/reference/internal/layout/statistics.go:10-203; policy notes
README.md:327-338): long byte-array min/max bounds are truncated to a
target length before landing in metadata — the *min* bound truncates
downward (a prefix is always <= the full value), while the *max* bound
must round UP: increment the last byte with carry so the truncated bound
still sorts >= every value it covers; if every byte is 0xFF the bound is
dropped (reported untruncatable). For UTF-8 data the increment walks back
to a character boundary first so the bound stays valid UTF-8.

Manifest stats are metadata consumed by pruning (pruned.py) — an
over-wide bound is safe (decodes a partition needlessly), an under-wide
bound is not (skips data), which is exactly the reference's invariant.
"""

from __future__ import annotations

DEFAULT_TRUNCATE_LEN = 64


def truncate_min(value: bytes, limit: int = DEFAULT_TRUNCATE_LEN) -> bytes:
    """Prefix-truncate a lower bound (always sorts <= the original)."""
    if len(value) <= limit:
        return value
    return value[:limit]


def _is_utf8_continuation(b: int) -> bool:
    return 0x80 <= b <= 0xBF


def truncate_max(
    value: bytes, limit: int = DEFAULT_TRUNCATE_LEN, utf8: bool = True
) -> bytes | None:
    """Truncate an upper bound, rounding up with carry.

    Returns None when no valid truncated upper bound exists (all-0xFF
    prefix) — the caller should then keep the full value or omit the
    bound, mirroring statistics.go's fallback."""
    if len(value) <= limit:
        return value
    prefix = bytearray(value[:limit])
    i = len(prefix) - 1
    while i >= 0:
        if utf8 and _is_utf8_continuation(prefix[i]):
            i -= 1  # step back to the character's lead byte
            continue
        if prefix[i] != 0xFF:
            prefix[i] += 1
            out = bytes(prefix[: i + 1])
            if utf8:
                try:
                    out.decode("utf-8")
                except UnicodeDecodeError:
                    return _truncate_max_binary(value, limit)
            return out
        i -= 1
    return None


def _truncate_max_binary(value: bytes, limit: int) -> bytes | None:
    prefix = bytearray(value[:limit])
    i = len(prefix) - 1
    while i >= 0:
        if prefix[i] != 0xFF:
            prefix[i] += 1
            return bytes(prefix[: i + 1])
        i -= 1
    return None


def truncate_bounds(
    vmin: bytes | str | None,
    vmax: bytes | str | None,
    limit: int = DEFAULT_TRUNCATE_LEN,
) -> tuple[str, str]:
    """Truncate (vmin, vmax) for manifest storage; returns strings.

    vmax falls back to the untruncated value when rounding up is
    impossible — correctness (no under-wide bound) over compactness."""
    def to_b(v):
        return v.encode("utf-8", "surrogatepass") if isinstance(v, str) else v

    out_min = ""
    out_max = ""
    if vmin is not None:
        out_min = truncate_min(to_b(vmin), limit).decode("utf-8", "replace")
    if vmax is not None:
        bmax = to_b(vmax)
        t = truncate_max(bmax, limit)
        out_max = (t if t is not None else bmax).decode("utf-8", "replace")
    return out_min, out_max
