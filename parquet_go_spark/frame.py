"""Self-describing frame container — the engine's analog of a Parquet page.

A frame = fixed header + section table + (optionally block-compressed)
concatenated sections + CRC32. It carries the subset of thrift
PageHeader/Statistics the engine needs (reference:
/root/reference/internal/layout/page_write_encode.go:227-242) plus the
"store uncompressed if compression doesn't shrink" rule
(page_write_encode.go:313-318).

Defensive decode mirrors the reference's caps: declared counts are bounded
(validateCount, encodingread.go:9-27), payload allocations are capped at
256 MiB (page.go:9-12, compress/compress.go:13-19), and the CRC is verified
before any section is parsed (common/crc.go analog).

Block compression uses pyarrow's codecs (snappy/zstd/gzip/lz4) — the same
codec families the reference registers (internal/compress/*.go).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

MAGIC = b"PGS1"
VERSION = 1
MAX_PAYLOAD = 256 << 20   # decompression-bomb cap, compress.go:13-19
MAX_COUNT = 1 << 31       # validateCount analog, encodingread.go:9-27

# codec ids (what the sections contain)
PLAIN = 0
RLE = 1
FOR_BITPACK = 2
DELTA_BP = 3
DELTA_LENGTH_BA = 4
DELTA_BA = 5
BSS = 6
DICT = 7
FSST = 8
LIST = 9
PLAIN_BA = 10
DICT_BSS = 11
RANS = 12
DICT_RANS = 13
ALP = 14    # decimal-scaled floats over the int codec menu (codecs/alp.py)

CODEC_NAMES = {
    PLAIN: "plain",
    RLE: "rle",
    FOR_BITPACK: "for_bitpack",
    DELTA_BP: "delta_binary_packed",
    DELTA_LENGTH_BA: "delta_length_byte_array",
    DELTA_BA: "delta_byte_array",
    BSS: "byte_stream_split",
    DICT: "dict",
    FSST: "fsst",
    LIST: "list",
    PLAIN_BA: "plain_byte_array",
    DICT_BSS: "dict_bss",
    RANS: "rans",
    DICT_RANS: "dict_rans",
    ALP: "alp",
}
CODEC_IDS = {v: k for k, v in CODEC_NAMES.items()}

# block-compression ids (outer wrapper; the reference's full registry —
# internal/compress/*.go registers UNCOMPRESSED, SNAPPY, GZIP, ZSTD,
# BROTLI, LZ4, LZ4_RAW)
COMP_NONE = 0
COMP_SNAPPY = 1
COMP_ZSTD = 2
COMP_GZIP = 3
COMP_LZ4 = 4
COMP_BROTLI = 5
COMP_LZ4_RAW = 6
COMP_NAMES = {COMP_NONE: None, COMP_SNAPPY: "snappy", COMP_ZSTD: "zstd",
              COMP_GZIP: "gzip", COMP_LZ4: "lz4", COMP_BROTLI: "brotli",
              COMP_LZ4_RAW: "lz4_raw"}
COMP_IDS = {"none": COMP_NONE, "snappy": COMP_SNAPPY, "zstd": COMP_ZSTD,
            "gzip": COMP_GZIP, "lz4": COMP_LZ4, "brotli": COMP_BROTLI,
            "lz4_raw": COMP_LZ4_RAW, None: COMP_NONE}

# codecs that take a numeric level (pyarrow compression_level support);
# snappy/lz4 are level-free in the reference registry too
_LEVELED = {"zstd", "gzip", "brotli"}


def parse_compression(spec: "str | None") -> tuple[str, "int | None"]:
    """``"zstd"`` | ``"zstd:3"`` | None -> (name, level|None) — the
    reference's per-column tag grammar ``compression=ZSTD:3``
    (common/tag.go:97-110, writer/writer.go:282-318)."""
    if spec is None or spec == "":
        return "none", None
    name, sep, lv = str(spec).partition(":")
    name = name.lower()
    if name not in COMP_IDS or name == "":
        raise ValueError(f"unknown compression codec {spec!r}")
    if not sep:
        return name, None
    if name not in _LEVELED:
        raise ValueError(
            f"compression codec {name!r} does not take a level ({spec!r})")
    try:
        return name, int(lv)
    except ValueError:
        raise ValueError(f"bad compression level in {spec!r}") from None


# shared compressor instances per (codec, level) — the reference keeps
# one compressor per registered (codec, level) pair as well
_CODEC_CACHE: dict = {}


def _codec_for(name: str, level: "int | None"):
    key = (name, level)
    c = _CODEC_CACHE.get(key)
    if c is None:
        if not pa.Codec.is_available(name):
            raise ValueError(f"compression codec {name} unavailable")
        c = pa.Codec(name, compression_level=level)
        _CODEC_CACHE[key] = c
    return c


def get_compressor(spec: "str | None"):
    """pa.Codec (cached) for a ``name[:level]`` spec; None for none."""
    name, level = parse_compression(spec)
    return None if name == "none" else _codec_for(name, level)

# logical types
LT_INT32 = 0
LT_INT64 = 1
LT_FLOAT32 = 2
LT_FLOAT64 = 3
LT_BOOL = 4
LT_BINARY = 5
LT_STRING = 6
LT_TIMESTAMP_US = 7
LT_LIST_INT32 = 8
LT_DATE32 = 9
LT_FLBA = 10      # fixed-length byte array; length rides in a param section
LT_DECIMAL = 11   # decimal128; (precision, scale, phys) in a param section
LT_STRUCT = 12    # struct; field names in the param section, one
                  # sub-frame per child (Dremel shredding, null bitmap
                  # per level instead of def levels — SURVEY §1.4)
LT_MAP = 13       # map; lengths sub-frame + entries struct sub-frame
LT_FLOAT16 = 14   # half floats; stored as fixed 2-byte items (FLBA menu)
LT_INT_EXT = 15   # int8/16 + uint8..64; (signed, width) param section —
                  # the reference's INT_8/16 and UINT_8..64 converted
                  # types with unsigned ordering (common/functable.go:38-41)
LT_TEMPORAL = 16  # timestamp (any unit/tz), time32/64, duration;
                  # (kind, unit) + tz param section (types/timestamp.go,
                  # types/time.go analogs)

# header: magic4 version u8 codec u8 comp u8 ltype u8 flags u8 bitwidth u8
#         nsect u8 pad u8 count u64 nullcount u64 rawsize u64 payloadsize u64
_HDR = struct.Struct("<4sBBBBBBBBQQQQ")
FLAG_HAS_VALIDITY = 1
FLAG_ENCRYPTED = 2

GCM_NONCE_LEN = 12
GCM_TAG_LEN = 16

CRC_MODES = ("strict", "auto", "ignore")


@dataclass
class SealOptions:
    """Write-side encryption options, accepted anywhere ``encryption_key``
    bytes are (reference WithAADPrefix, reader/options.go:56-62):
    ``aad_prefix`` is prepended to the GCM associated data, binding the
    sealed frame to an external identity (store path, tenant, file id) —
    a frame copied into a store sealed under a different prefix fails
    authentication even with the right key."""

    key: bytes
    aad_prefix: bytes = b""


@dataclass
class ReadOptions:
    """Read-side options, accepted anywhere ``encryption_key`` bytes are
    (reference ReaderOption surface, reader/options.go):

    * ``key`` — AES key for sealed frames (as before).
    * ``aad_prefix`` — must match the seal-time prefix.
    * ``crc_mode`` — "strict"/"auto" validate the frame CRC ("auto" is
      identical here because every PGS frame carries one; the reference
      distinguishes them for CRC-less writers, common/crc.go:8-18);
      "ignore" skips the checksum (CRCIgnore) — a measured scan-path
      lever for bulk re-reads of already-verified stores. Sealed frames
      keep GCM authentication regardless.
    """

    key: bytes | None = None
    aad_prefix: bytes = b""
    crc_mode: str = "strict"

    def __post_init__(self):
        if self.crc_mode not in CRC_MODES:
            raise ValueError(
                f"crc_mode must be one of {CRC_MODES}, got {self.crc_mode!r}"
            )

@dataclass
class FrameMeta:
    codec: int
    compression: int
    logical_type: int
    flags: int
    bit_width: int
    count: int
    null_count: int
    raw_size: int
    sections: list[bytes]

    @property
    def codec_name(self) -> str:
        return CODEC_NAMES[self.codec]


def _get_codec(comp_id: int, level: "int | None" = None):
    name = COMP_NAMES[comp_id]
    if name is None:
        return None
    return _codec_for(name, level)


def write_frame(
    codec: int,
    logical_type: int,
    sections: list[bytes],
    count: int,
    null_count: int = 0,
    raw_size: int = 0,
    bit_width: int = 0,
    flags: int = 0,
    compression: str | None = "zstd",
    encryption_key: bytes | SealOptions | None = None,
) -> bytes:
    """``encryption_key`` (16/24/32 B) turns on modular encryption
    (reference reader/encryption.go + writer counterpart, AES-GCM as the
    Parquet spec mandates): the compressed body is sealed with a random
    nonce and the frame header+section table as associated data, so a
    tampered codec id or section length fails authentication, not just
    the CRC. Metadata stays readable without the key; values don't."""
    payload = sections[0] if len(sections) == 1 else b"".join(sections)
    comp_name, comp_level = parse_compression(compression)
    comp_id = COMP_IDS[comp_name]
    body = payload
    if comp_id != COMP_NONE and len(payload) > 64:
        # Always run the full compress pass (a mid-payload probe that
        # skipped "incompressible" frames was tried and removed: a single
        # slice of an interleaved rANS stream looks random while the
        # whole frame still shaves 1.3-1.9% under zstd, and the pass
        # costs ~1 ms/MB — invisible at pipeline level while compressed
        # size is a headline north-rule criterion). Keep only the
        # reference's store-uncompressed-if-bigger rule
        # (page_write_encode.go:313-318).
        compressed = _get_codec(
            comp_id, comp_level).compress(payload).to_pybytes()
        if len(compressed) < len(payload):
            body = compressed
        else:
            comp_id = COMP_NONE
    else:
        comp_id = COMP_NONE
    if encryption_key is not None:
        import os as _os

        from cryptography.hazmat.primitives.ciphers.aead import AESGCM

        if isinstance(encryption_key, SealOptions):
            key, aad_prefix = encryption_key.key, encryption_key.aad_prefix
        else:
            key, aad_prefix = encryption_key, b""
        flags |= FLAG_ENCRYPTED
        header = _HDR.pack(
            MAGIC, VERSION, codec, comp_id, logical_type, flags, bit_width,
            len(sections), 0, count, null_count, raw_size, len(payload),
        )
        sect_table = struct.pack(
            f"<{len(sections)}Q", *(len(s) for s in sections)
        )
        nonce = _os.urandom(GCM_NONCE_LEN)
        body = nonce + AESGCM(key).encrypt(
            nonce, body, aad_prefix + header + sect_table
        )
    else:
        header = _HDR.pack(
            MAGIC, VERSION, codec, comp_id, logical_type, flags, bit_width,
            len(sections), 0, count, null_count, raw_size, len(payload),
        )
        sect_table = struct.pack(
            f"<{len(sections)}Q", *(len(s) for s in sections)
        )
    # CRC covers header + section table + body: a flipped codec id or
    # section length must fail the checksum, not misroute the decoder
    # (stronger than the reference, which checksums page data only).
    # Computed incrementally — no concat copy of a multi-MB body just
    # for the checksum.
    crc = zlib.crc32(body, zlib.crc32(sect_table, zlib.crc32(header)))
    return b"".join((header, sect_table, body, struct.pack("<I", crc)))


def read_frame(
    buf: bytes | memoryview,
    encryption_key: bytes | ReadOptions | None = None,
) -> FrameMeta:
    opts = (
        encryption_key
        if isinstance(encryption_key, ReadOptions)
        else ReadOptions(key=encryption_key)
    )
    buf = memoryview(buf)
    if len(buf) < _HDR.size + 4:
        raise ValueError("frame too short")
    (magic, version, codec, comp_id, ltype, flags, bw, nsect, _pad,
     count, null_count, raw_size, payload_size) = _HDR.unpack(buf[: _HDR.size])
    if magic != MAGIC:
        raise ValueError("bad frame magic")
    if version != VERSION:
        raise ValueError(f"unsupported frame version {version}")
    if count > MAX_COUNT or null_count > count:
        raise ValueError("invalid frame counts")
    if payload_size > MAX_PAYLOAD:
        raise ValueError("frame payload exceeds decode cap")
    pos = _HDR.size
    if len(buf) < pos + 8 * nsect + 4:
        raise ValueError("truncated section table")
    sect_lens = struct.unpack_from(f"<{nsect}Q", buf, pos)
    pos += 8 * nsect
    if sum(sect_lens) != payload_size:
        raise ValueError("section lengths disagree with payload size")
    # body stays a zero-copy view of the input; the CRC runs over the
    # input buffer directly (no concat copy). Sections of an
    # uncompressed, unencrypted frame are sliced as memoryviews — the
    # dominant decode path (large entropy-coded frames are stored
    # uncompressed by the write-side probe) never copies the payload.
    body: bytes | memoryview = buf[pos : len(buf) - 4]
    (crc,) = struct.unpack_from("<I", buf, len(buf) - 4)
    if opts.crc_mode != "ignore" and zlib.crc32(buf[: len(buf) - 4]) != crc:
        raise ValueError("frame CRC mismatch")
    if flags & FLAG_ENCRYPTED:
        if opts.key is None:
            raise ValueError("frame is encrypted and no key was provided")
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM

        if len(body) < GCM_NONCE_LEN + GCM_TAG_LEN:
            raise ValueError("truncated encrypted frame body")
        try:
            body = AESGCM(opts.key).decrypt(
                bytes(body[:GCM_NONCE_LEN]), bytes(body[GCM_NONCE_LEN:]),
                opts.aad_prefix + bytes(buf[:pos]),
            )
        except Exception as e:  # InvalidTag and friends
            raise ValueError(f"frame decryption failed: {e}") from e
    if comp_id != COMP_NONE:
        body = _get_codec(comp_id).decompress(body, payload_size).to_pybytes()
    if len(body) != payload_size:
        raise ValueError("payload size mismatch after decompression")
    sections = []
    off = 0
    for ln in sect_lens:
        sections.append(body[off : off + ln])
        off += ln
    return FrameMeta(
        codec=codec, compression=comp_id, logical_type=ltype, flags=flags,
        bit_width=bw, count=count, null_count=null_count, raw_size=raw_size,
        sections=sections,
    )


def rotate_frame_key(
    buf: bytes | memoryview,
    old: bytes | SealOptions | None,
    new: bytes | SealOptions | None,
) -> bytes:
    """Re-seal one frame under a new key WITHOUT decompressing or
    decoding: the GCM envelope peels off (old AAD = old header +
    section table), the still-compressed body re-seals under the new
    key with a fresh nonce, and the CRC recomputes. old/new of None
    mean plaintext on that side, so this also seals a previously
    unencrypted frame and unseals to plaintext (takedown-to-archive).

    The header is identical except the FLAG_ENCRYPTED bit, so decode
    semantics cannot change; nested children live inside the one outer
    frame's sections and rotate with it."""
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM

    def _opts(k):
        if k is None or isinstance(k, SealOptions):
            return k
        return SealOptions(key=k)

    old, new = _opts(old), _opts(new)
    buf = memoryview(buf)
    if len(buf) < _HDR.size + 4:
        raise ValueError("frame too short")
    (magic, version, codec, comp_id, ltype, flags, bw, nsect, _pad,
     count, null_count, raw_size, payload_size) = _HDR.unpack(buf[: _HDR.size])
    if magic != MAGIC or version != VERSION:
        raise ValueError("bad frame magic/version")
    pos = _HDR.size + 8 * nsect
    if len(buf) < pos + 4:
        raise ValueError("truncated section table")
    sect_table = bytes(buf[_HDR.size: pos])
    body = bytes(buf[pos: len(buf) - 4])
    (crc,) = struct.unpack_from("<I", buf, len(buf) - 4)
    if zlib.crc32(buf[: len(buf) - 4]) != crc:
        raise ValueError("frame CRC mismatch")
    old_header = bytes(buf[: _HDR.size])
    if flags & FLAG_ENCRYPTED:
        if old is None:
            raise ValueError("frame is encrypted and no old key was given")
        if len(body) < GCM_NONCE_LEN + GCM_TAG_LEN:
            raise ValueError("truncated encrypted frame body")
        try:
            body = AESGCM(old.key).decrypt(
                body[:GCM_NONCE_LEN], body[GCM_NONCE_LEN:],
                old.aad_prefix + old_header + sect_table,
            )
        except Exception as e:
            raise ValueError(f"frame decryption failed: {e}") from e
    elif old is not None and old.key is not None:
        raise ValueError("old key given for a plaintext frame")
    new_flags = flags & ~FLAG_ENCRYPTED
    if new is not None and new.key is not None:
        new_flags |= FLAG_ENCRYPTED
    header = _HDR.pack(
        MAGIC, VERSION, codec, comp_id, ltype, new_flags, bw,
        nsect, 0, count, null_count, raw_size, payload_size,
    )
    if new is not None and new.key is not None:
        import os as _os

        nonce = _os.urandom(GCM_NONCE_LEN)
        body = nonce + AESGCM(new.key).encrypt(
            nonce, body, new.aad_prefix + header + sect_table
        )
    new_crc = zlib.crc32(body, zlib.crc32(sect_table, zlib.crc32(header)))
    return b"".join((header, sect_table, body, struct.pack("<I", new_crc)))


def pack_validity(valid: np.ndarray) -> bytes:
    return np.packbits(np.ascontiguousarray(valid, dtype=bool), bitorder="little").tobytes()


def unpack_validity(buf: bytes, count: int) -> np.ndarray:
    if len(buf) * 8 < count:
        raise ValueError("truncated validity bitmap")
    return np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), count=count, bitorder="little"
    ).astype(bool)
