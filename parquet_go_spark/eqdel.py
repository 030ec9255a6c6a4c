"""Equality-delete matching kernel: vectorized null-safe multi-column
set membership between a decoded partition and a delete-key table.

Iceberg's second delete flavor (format spec "equality delete files"):
the delete file holds key VALUES, not row addresses, so a takedown is
O(keys) — no store scan at all — and readers apply it as an anti-join.
The reference has no delete surface (parquet-go files are immutable);
``operators/deletes.delete_values`` is the writer, this module is the
shared read-side kernel (native source reads and compaction both call
it).

Matching is null-safe (a null key matches null rows — Iceberg's
equality-field semantics) and exact: each column is factorized over the
concatenation of partition values and key values (``dictionary_encode``
assigns one code per distinct value; nulls get the sentinel −1), and
multi-column tuples reduce to single codes via one ``np.unique`` over
the stacked code matrix — no hashing, no collisions, O((n+m)·log) and
fully vectorized.

Float/double and nested key columns are refused at delete time (like
Iceberg, which bans float equality fields — NaN/-0.0 equality is not
well-defined across engines).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Spark type names allowed as equality-delete key columns (simpleString
# forms). Float/double excluded deliberately; nested types can't
# factorize as scalars.
ALLOWED_KEY_TYPES = {
    "tinyint", "smallint", "int", "bigint", "string", "binary",
    "boolean", "date", "timestamp", "timestamp_ntz",
}


def check_key_field(field) -> None:
    """Validate a Spark StructField as an equality-delete key column."""
    t = field.dataType.simpleString()
    if t not in ALLOWED_KEY_TYPES:
        raise ValueError(
            f"column {field.name!r} has type {t}, not usable as an "
            f"equality-delete key (allowed: {sorted(ALLOWED_KEY_TYPES)}; "
            "float/double are banned like Iceberg's equality fields)"
        )


def _flat(a: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    if pa.types.is_fixed_size_binary(a.type):
        a = a.cast(pa.binary())
    if pa.types.is_dictionary(a.type):
        a = a.cast(a.type.value_type)
    return a


def _codes(row_col, key_col) -> np.ndarray:
    """Factorize one column over rows+keys; null → −1 (null-safe)."""
    r, k = _flat(row_col), _flat(key_col)
    if k.type != r.type:
        try:
            k = k.cast(r.type)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            # widen the rows instead (e.g. int32 chunks vs int64 keys
            # where some key exceeds int32 — it can't match, but its
            # neighbors can)
            r = r.cast(k.type)
    comb = pa.concat_arrays([r, k])
    d = comb.dictionary_encode()
    idx = pc.fill_null(d.indices.cast(pa.int64()), -1)
    return idx.to_numpy(zero_copy_only=False)


def keep_mask(row_cols: list, key_cols: list) -> np.ndarray | None:
    """Boolean keep-mask (True = row survives) for a partition's key
    column arrays against one delete entry's key table columns, or
    ``None`` when every row survives (the common case — callers skip
    the filter entirely)."""
    n = len(row_cols[0])
    m = len(key_cols[0])
    if n == 0 or m == 0:
        return None
    per_col = [_codes(r, k) for r, k in zip(row_cols, key_cols)]
    if len(per_col) == 1:
        codes = per_col[0]
    else:
        stacked = np.stack(per_col)  # (ncols, n+m)
        _, codes = np.unique(stacked, axis=1, return_inverse=True)
        codes = codes.reshape(-1)  # numpy 2.x returns the original shape
    keep = ~np.isin(codes[:n], codes[n:])
    return None if bool(keep.all()) else keep


def load_key_table(store_path: str, name: str, file_cols) -> pa.Table:
    """The committed key parquet of one equality-delete entry, read
    under its PHYSICAL column names (fixed at delete time; renames only
    move the logical ``key_cols``)."""
    import pyarrow.dataset as pads

    d = os.path.join(store_path, "deletes", name)
    files = [
        os.path.join(d, f) for f in sorted(os.listdir(d))
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    if not files:
        raise ValueError(f"store meta references missing delete keys {name}")
    return pads.dataset(files, format="parquet").to_table(
        columns=list(file_cols)
    )
