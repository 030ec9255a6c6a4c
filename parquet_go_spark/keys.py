"""Column-key resolution for modular encryption.

Analog of the reference's per-column key surface
(reader/column_key.go:11-110, writer counterpart in
reader/encryption.go:311-366): a column listed in ``column_keys`` is
sealed/unsealed with its own AES key; every other column falls back to
the store ("footer") key; with neither, the column is plaintext.

Our chunk granularity is one blob per (partition, top-level column), so
the key path is simply the column name — nested children live inside the
sealed parent body (one key per leaf-at-the-top, matching the
reference's leaf-chunk key granularity). Paths are validated against the
schema before any byte is encrypted, the reference's
validateColumnKeyPaths typo guard (column_key.go:29-69).
"""

from __future__ import annotations

_AES_KEY_LENS = (16, 24, 32)


def validate_column_keys(
    column_keys: dict[str, bytes] | None, columns: list[str]
) -> None:
    """Reject unknown column paths and malformed keys before encrypting
    (reader/column_key.go:29-69: catch typos before touching data)."""
    if not column_keys:
        return
    unknown = sorted(set(column_keys) - set(columns))
    if unknown:
        raise ValueError(
            f"column_keys paths {unknown} do not match any schema column "
            f"(have: {sorted(c for c in columns if c != 'part_id')})"
        )
    for name, key in column_keys.items():
        if not isinstance(key, (bytes, bytearray)) or len(key) not in _AES_KEY_LENS:
            raise ValueError(
                f"column_keys[{name!r}] must be a 16/24/32-byte AES key"
            )


def key_for(
    col: str,
    column_keys: dict[str, bytes] | None,
    footer_key: bytes | None,
    retriever=None,
) -> bytes | None:
    """The reference's resolveColumnKey fallback chain
    (reader/encryption.go:311-366): explicit column key first, then the
    ``retriever`` callback (reference WithKeyRetriever,
    reader/options.go:48-54: resolve keys from a KMS / metadata at read
    time — ``retriever(col) -> bytes | None``), else the store/footer
    key, else plaintext."""
    if column_keys and col in column_keys:
        return column_keys[col]
    if retriever is not None:
        key = retriever(col)
        if key is not None:
            if not isinstance(key, (bytes, bytearray)) or len(key) not in _AES_KEY_LENS:
                raise ValueError(
                    f"key retriever returned a malformed key for {col!r}"
                )
            return bytes(key)
    return footer_key


def parse_hex_keys(spec: str | None) -> dict[str, bytes] | None:
    """CLI surface: a JSON object of {column: hex_key}."""
    if not spec:
        return None
    import json

    raw = json.loads(spec)
    return {name: bytes.fromhex(hexkey) for name, hexkey in raw.items()}
