"""Parquet Modular Encryption (AES_GCM_V1) for REAL parquet files.

The reference ships six encrypt/decrypt example surfaces (encrypted
footer, plaintext-footer read, uniform keys, per-column keys, AAD
prefixes — /root/reference/example/encrypt_*); this module re-creates
the format side over the engine's reader/writer. Spec facts were
confirmed empirically against pyarrow-written ciphertext before any
code relied on them (tests/test_pqcrypt.py keeps that ground truth):

  * file magic PARE; tail = [FileCryptoMetaData (plaintext thrift)]
    [encrypted FileMetaData module][u32 combined length][PARE];
  * every encrypted module = u32 length || 12-byte nonce || ciphertext
    || 16-byte GCM tag, and the page-header size fields count the WHOLE
    module (framing included);
  * AAD = aad_prefix || aad_file_unique || module-type byte ||
    little-endian u16 ordinals — footer(0): none; ColumnMetaData(1):
    rg,col; DataPageHeader(4)/DataPage(2): rg,col,page;
    DictionaryPageHeader(5)/DictionaryPage(3): rg,col;
  * column-key chunks move their ColumnMetaData into
    ColumnChunk.encrypted_column_metadata (field 9) with
    ColumnCryptoMetaData (field 8); footer-key chunks keep field 3
    (the encrypted footer protects it).

Keys are supplied explicitly (the reference's encrypt_read examples) or
resolved from key_metadata via a retriever callable — the same
retriever shape as the PGS store's keys.py.

Interop caveat (arrow-side, not format): arrow's MULTI-threaded reader
intermittently fails ("Failed decryption finalization") on any file
where one DEK serves several column chunks — i.e. the spec's uniform
ENCRYPTION_WITH_FOOTER_KEY mode — because its per-key decryptor cache
races AAD state across column threads. Reproduced ~20% of threaded
reads against engine files, never single-threaded; pyarrow's own
writer dodges it only because CryptoFactory always derives a distinct
DEK per column. Write with per-column keys when downstream readers are
threaded arrow.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field


M_FOOTER, M_COLMETA = 0, 1
M_DATA_PAGE, M_DICT_PAGE = 2, 3
M_DATA_PAGE_HDR, M_DICT_PAGE_HDR = 4, 5

MAGIC_E = b"PARE"


def _gcm(key: bytes):
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    return AESGCM(key)


@dataclass
class Decrypt:
    """Read-side keys: explicit footer/column keys, or a retriever
    called with the stored key_metadata bytes."""
    footer_key: bytes | None = None
    column_keys: dict[str, bytes] = field(default_factory=dict)
    key_retriever: object = None      # callable(key_metadata: bytes)->bytes
    aad_prefix: bytes = b""

    def resolve(self, key_metadata: bytes | None,
                column: str | None = None) -> bytes:
        if column is not None and column in self.column_keys:
            return self.column_keys[column]
        if column is None and self.footer_key is not None:
            return self.footer_key
        if self.key_retriever is not None and key_metadata:
            return self.key_retriever(key_metadata)
        if column is not None and self.footer_key is not None:
            return self.footer_key    # uniform encryption
        raise ValueError(
            f"no key for {'footer' if column is None else column!r}")


@dataclass
class Encrypt:
    """Write-side configuration (encrypted footer by default).
    ``algorithm``: AES_GCM_V1 (every module authenticated) or
    AES_GCM_CTR_V1 (page bodies AES-CTR, unauthenticated — metadata
    modules stay GCM)."""
    footer_key: bytes
    footer_key_metadata: bytes = b""
    column_keys: dict[str, tuple[bytes, bytes]] = field(
        default_factory=dict)    # col -> (key, key_metadata)
    aad_prefix: bytes = b""
    supply_aad_prefix: bool = False   # True: prefix NOT stored in file
    plaintext_footer: bool = False    # PAR1 + signed cleartext footer
    algorithm: str = "AES_GCM_V1"
    _aad_unique: bytes = b""

    def __post_init__(self):
        for k in [self.footer_key] + [k for k, _ in
                                      self.column_keys.values()]:
            if len(k) not in (16, 24, 32):
                raise ValueError("AES key must be 16/24/32 bytes")
        if self.algorithm not in ("AES_GCM_V1", "AES_GCM_CTR_V1"):
            raise ValueError(
                f"unknown encryption algorithm {self.algorithm!r}")
        self._aad_unique = os.urandom(8)

    @property
    def ctr(self) -> bool:
        return self.algorithm == "AES_GCM_CTR_V1"

    @property
    def aad_base(self) -> bytes:
        return self.aad_prefix + self._aad_unique

    def key_for(self, column: str) -> bytes:
        return self.column_keys.get(column, (self.footer_key, b""))[0]


def module_aad(aad_base: bytes, mtype: int, rg: int | None = None,
               col: int | None = None, page: int | None = None) -> bytes:
    aad = aad_base + bytes([mtype])
    for v in (rg, col, page):
        if v is not None:
            aad += struct.pack("<H", v)
    return aad


def seal_module(key: bytes, aad: bytes, plaintext: bytes) -> bytes:
    nonce = os.urandom(12)
    blob = nonce + _gcm(key).encrypt(nonce, plaintext, aad)
    return len(blob).to_bytes(4, "little") + blob


def open_module(key: bytes, aad: bytes, buf, pos: int = 0
                ) -> tuple[bytes, int]:
    """Decrypt one module at ``pos`` -> (plaintext, next position)."""
    if pos + 4 > len(buf):
        raise ValueError("truncated encrypted module length")
    (mlen,) = struct.unpack_from("<I", buf, pos)
    if mlen < 28 or pos + 4 + mlen > len(buf):
        raise ValueError("implausible encrypted module size")
    nonce = bytes(buf[pos + 4:pos + 16])
    ct = bytes(buf[pos + 16:pos + 4 + mlen])
    return _gcm(key).decrypt(nonce, ct, aad), pos + 4 + mlen


# ------------------------------------------------ AES_GCM_CTR_V1 lane
#
# Spec Encryption.md: the v2 algorithm keeps every METADATA module
# (footer, ColumnMetaData, page headers, indexes, bloom modules) in
# AES-GCM, but page BODIES use AES-CTR — faster, NOT authenticated
# (the reference README warns exactly this: "AES_GCM_CTR_V1 does not
# authenticate page bodies"). CTR module framing = u32 length ||
# 12-byte nonce || ciphertext (no tag); the 16-byte CTR IV is the
# nonce with a big-endian 0x00000001 initial counter appended.

def _ctr(key: bytes, nonce12: bytes):
    from cryptography.hazmat.primitives.ciphers import (
        Cipher, algorithms, modes)

    return Cipher(algorithms.AES(key),
                  modes.CTR(nonce12 + b"\x00\x00\x00\x01"))


def seal_module_ctr(key: bytes, plaintext: bytes) -> bytes:
    nonce = os.urandom(12)
    enc = _ctr(key, nonce).encryptor()
    blob = nonce + enc.update(plaintext) + enc.finalize()
    return len(blob).to_bytes(4, "little") + blob


def open_module_ctr(key: bytes, buf, pos: int = 0) -> tuple[bytes, int]:
    if pos + 4 > len(buf):
        raise ValueError("truncated encrypted module length")
    (mlen,) = struct.unpack_from("<I", buf, pos)
    if mlen < 12 or pos + 4 + mlen > len(buf):
        raise ValueError("implausible encrypted module size")
    nonce = bytes(buf[pos + 4:pos + 16])
    dec = _ctr(key, nonce).decryptor()
    return (dec.update(bytes(buf[pos + 16:pos + 4 + mlen]))
            + dec.finalize(), pos + 4 + mlen)
