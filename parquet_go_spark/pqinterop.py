"""Real Parquet file-format interop: decode actual ``.parquet`` page
payloads with the engine's own codec kernels.

The reference's entire job is reading/writing real Parquet bytes
(/root/reference/internal/encoding/encodingread.go:172-232,
encodingread_delta.go:8-139, internal/layout/page_read.go:260-317).
This engine implements the same kernels over its own PGS frame format;
this module is the external proof that those kernels produce/consume
the *spec's* bitstreams, not lookalikes: it parses a Parquet file's
footer and page headers (Thrift compact protocol, parquet.thrift) and
hands every page payload to ``codecs/{plainc,rle,delta,deltaba,bss,
bitpack,dictionary}`` — pyarrow never touches a byte of the decode
path. Scope (deliberate):

  * flat required/optional columns, data pages v1 and v2,
    uncompressed or engine-registry block codecs;
  * encodings PLAIN, RLE (bool), RLE_DICTIONARY / PLAIN_DICTIONARY,
    DELTA_BINARY_PACKED, DELTA_LENGTH_BYTE_ARRAY, DELTA_BYTE_ARRAY,
    BYTE_STREAM_SPLIT — the reference's full encoding menu
    (encodingwrite.go / encodingread.go);
  * v1 definition levels (u32-length-prefixed RLE) and v2 levels
    (unprefixed RLE with byte lengths from the header).

Spec deltas vs the engine's at-rest layout, handled here: the spec's
DELTA_LENGTH/DELTA_BYTE_ARRAY sections are self-delimiting (no u32
length prefixes — ``delta.decode_consumed`` finds the boundary), and
RLE_DICTIONARY data pages carry a leading bit-width byte.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from .codecs import bss, delta, dictionary, plainc, rle
from .codecs.varint import read_uvarint

MAGIC = b"PAR1"

# --- Thrift compact protocol (just enough for parquet.thrift) -----------

CT_STOP, CT_TRUE, CT_FALSE, CT_BYTE = 0, 1, 2, 3
CT_I16, CT_I32, CT_I64, CT_DOUBLE = 4, 5, 6, 7
CT_BINARY, CT_LIST, CT_SET, CT_MAP, CT_STRUCT = 8, 9, 10, 11, 12


def _zz(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _read_value(buf, pos: int, ftype: int):
    if ftype == CT_TRUE:
        return True, pos
    if ftype == CT_FALSE:
        return False, pos
    if ftype == CT_BYTE:
        return struct.unpack_from("<b", buf, pos)[0], pos + 1
    if ftype in (CT_I16, CT_I32, CT_I64):
        z, pos = read_uvarint(buf, pos)
        return _zz(z), pos
    if ftype == CT_DOUBLE:
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if ftype == CT_BINARY:
        n, pos = read_uvarint(buf, pos)
        if pos + n > len(buf):
            raise ValueError("thrift: binary exceeds buffer")
        return bytes(buf[pos : pos + n]), pos + n
    if ftype in (CT_LIST, CT_SET):
        hdr = buf[pos]
        pos += 1
        size, etype = hdr >> 4, hdr & 0x0F
        if size == 15:
            size, pos = read_uvarint(buf, pos)
        out = []
        if etype in (CT_TRUE, CT_FALSE):
            # bools inside a LIST occupy one byte each (1=true, 2=false) —
            # unlike struct fields, where the value rides the type nibble
            for _ in range(size):
                out.append(buf[pos] == 1)
                pos += 1
            return out, pos
        for _ in range(size):
            v, pos = _read_value(buf, pos, etype)
            out.append(v)
        return out, pos
    if ftype == CT_MAP:
        size, pos = read_uvarint(buf, pos)
        out = {}
        if size:
            kv = buf[pos]
            pos += 1
            kt, vt = kv >> 4, kv & 0x0F
            for _ in range(size):
                k, pos = _read_value(buf, pos, kt)
                v, pos = _read_value(buf, pos, vt)
                out[k] = v
        return out, pos
    if ftype == CT_STRUCT:
        return _read_struct(buf, pos)
    raise ValueError(f"thrift: unknown compact type {ftype}")


def _read_struct(buf, pos: int):
    """Parse one struct -> {field_id: value}; nested structs recurse."""
    fields: dict[int, object] = {}
    last_id = 0
    while True:
        b = buf[pos]
        pos += 1
        if b == CT_STOP:
            return fields, pos
        fdelta, ftype = b >> 4, b & 0x0F
        if fdelta:
            fid = last_id + fdelta
        else:
            z, pos = read_uvarint(buf, pos)
            fid = _zz(z)
        last_id = fid
        val, pos = _read_value(buf, pos, ftype)
        fields[fid] = val


# --- parquet.thrift constants -------------------------------------------

T_BOOLEAN, T_INT32, T_INT64, T_INT96 = 0, 1, 2, 3
T_FLOAT, T_DOUBLE, T_BYTE_ARRAY, T_FLBA = 4, 5, 6, 7

E_PLAIN, E_PLAIN_DICTIONARY, E_RLE = 0, 2, 3
E_DELTA_BINARY_PACKED, E_DELTA_LENGTH_BA, E_DELTA_BA = 5, 6, 7
E_RLE_DICTIONARY, E_BYTE_STREAM_SPLIT = 8, 9

PG_DATA, PG_DICT, PG_DATA_V2 = 0, 2, 3

# page-CRC read policy (the reference's reader.WithCRCMode table):
#   "auto"   — validate when present, pass when absent (our default;
#              the reference defaults to "ignore" for back-compat)
#   "strict" — every page must carry a valid CRC
#   "ignore" — skip validation entirely
CRC_MODE = "auto"


def _parse_encryption_algorithm(algo: dict):
    """(AAD-metadata struct, ctr flag) from an EncryptionAlgorithm
    union. Thrift unions carry exactly ONE branch; a malformed footer
    declaring both AES_GCM_V1 (field 1) and AES_GCM_CTR_V1 (field 2)
    would otherwise take AAD metadata from the GCM branch while
    CTR-decrypting GCM-sealed page bodies into unauthenticated garbage
    — refuse instead of guessing."""
    has_gcm, has_ctr = 1 in algo, 2 in algo
    if has_gcm and has_ctr:
        raise ValueError(
            "malformed footer: EncryptionAlgorithm union declares both "
            "AES_GCM_V1 and AES_GCM_CTR_V1")
    if not (has_gcm or has_ctr):
        raise ValueError("unsupported encryption algorithm")
    return (algo[2], True) if has_ctr else (algo[1], False)

_CODEC_NAMES = {0: None, 1: "snappy", 2: "gzip", 4: "brotli",
                5: "lz4", 6: "zstd", 7: "lz4_raw"}

_NP_DTYPE = {T_INT32: np.dtype("<i4"), T_INT64: np.dtype("<i8"),
             T_FLOAT: np.dtype("<f4"), T_DOUBLE: np.dtype("<f8")}


@dataclass
class ColumnChunkInfo:
    name: str
    physical_type: int
    type_length: int | None
    max_def: int          # definition-level ceiling (Dremel)
    codec: int
    num_values: int
    first_page_offset: int
    total_compressed: int
    encodings: list[int] = field(default_factory=list)
    max_rep: int = 0      # 0 = flat; 1 = single-level LIST
    d_list: int = 0       # def level at which the list itself is present
    d_slot: int = 0       # def level at which an element slot exists
    top_name: str = ""    # user-facing column name (list group name)
    bloom_offset: int | None = None
    bloom_length: int | None = None
    dict_page_offset: int | None = None
    key_missing: bool = False         # encrypted chunk, no key supplied
    enc_key: bytes | None = None      # modular encryption: page modules
    aad_base: bytes = b""
    enc_ctr: bool = False     # AES_GCM_CTR_V1: page bodies are CTR
    rg_ord: int = 0
    col_ord: int = 0
    num_rows: int = 0                 # rows in this chunk's row group
    oi_off: int | None = None         # PageIndex locations (ColumnChunk
    oi_len: int | None = None         # fields 4-7)
    ci_off: int | None = None
    ci_len: int | None = None
    data_page_offset: int = 0         # ColumnMetaData field 9
    enc_stats: list | None = None     # ColumnMetaData.encoding_stats
    leaf_el: dict | None = None       # SchemaElement of the leaf
    crc_mode: str | None = None       # per-read override of CRC_MODE


def read_file(path: str) -> tuple[bytes, dict]:
    from . import pqsource

    data = pqsource.open_source(path).read_all()
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError("not a parquet file")
    mlen = struct.unpack("<I", data[-8:-4])[0]
    meta, _ = _read_struct(memoryview(data)[len(data) - 8 - mlen:], 0)
    return data, meta


def read_footer(path: str, decryption=None) -> dict:
    """FileMetaData from the footer ALONE — tail reads only, never the
    data pages. This is what driver-side enumeration/pruning must use:
    at 100 TB the whole-file read_file() on a driver is a scale-killer
    (the JVM's ParquetFileReader reads exactly this tail too)."""
    return read_footer_ex(path, decryption)[0]


def read_footer_ex(path: str, decryption=None):
    """-> (FileMetaData, crypto ctx | None). Handles both the PAR1
    plaintext footer and the PARE encrypted footer (parquet modular
    encryption; pqcrypt.py)."""
    from . import pqsource

    src = pqsource.open_source(path)
    size = src.size()
    if size < 12:
        raise ValueError("not a parquet file")
    tail = min(size, 1 << 16)
    buf = src.read_range(size - tail, tail)
    magic = buf[-4:]
    if magic not in (MAGIC, b"PARE"):
        raise ValueError("not a parquet file")
    mlen = struct.unpack("<I", buf[-8:-4])[0]
    if mlen + 8 > len(buf):
        buf = src.read_range(size - mlen - 8, mlen + 8)
    if magic == MAGIC:
        fbuf = memoryview(buf)[len(buf) - 8 - mlen:]
        meta, consumed = _read_struct(fbuf, 0)
        if 8 not in meta:
            return meta, None
        # plaintext-footer encryption mode: FileMetaData in the clear,
        # followed by a 12-byte nonce + 16-byte GCM tag signing it;
        # encrypted chunks carry their own crypto metadata
        from . import pqcrypt

        gcm, ctr = _parse_encryption_algorithm(meta[8])
        stored_prefix = gcm.get(1, b"") or b""
        supply = bool(gcm.get(3))
        dec_prefix = getattr(decryption, "aad_prefix", b"")
        prefix = dec_prefix if (supply or dec_prefix) else stored_prefix
        aad_base = prefix + gcm[2]
        if decryption is None:
            # unkeyed: plain cols only
            return meta, ("plaintext", aad_base, ctr)
        fkey = decryption.resolve(meta.get(9), None)
        if consumed + 28 <= mlen:                  # verify the signature
            nonce = bytes(fbuf[consumed:consumed + 12])
            tag = bytes(fbuf[consumed + 12:consumed + 28])
            from cryptography.hazmat.primitives.ciphers.aead import AESGCM

            ct = AESGCM(fkey).encrypt(
                nonce, bytes(fbuf[:consumed]),
                pqcrypt.module_aad(aad_base, pqcrypt.M_FOOTER))
            if ct[-16:] != tag:
                raise ValueError("footer signature verification failed")
        return meta, (decryption, aad_base, fkey, ctr)
    from . import pqcrypt

    if decryption is None:
        raise ValueError("file has an encrypted footer (PARE); pass "
                         "decryption keys")
    fcm, pos = _read_struct(memoryview(buf)[len(buf) - 8 - mlen:], 0)
    gcm, ctr = _parse_encryption_algorithm(fcm.get(1) or {})
    stored_prefix = gcm.get(1, b"") or b""
    supply = bool(gcm.get(3))
    prefix = decryption.aad_prefix if (supply or decryption.aad_prefix) \
        else stored_prefix
    aad_base = prefix + gcm[2]
    fkey = decryption.resolve(fcm.get(2), None)
    pt, _ = pqcrypt.open_module(
        fkey, pqcrypt.module_aad(aad_base, pqcrypt.M_FOOTER),
        memoryview(buf)[len(buf) - 8 - mlen:], pos)
    meta, _ = _read_struct(memoryview(pt), 0)
    ctx = (decryption, aad_base, fkey, ctr)
    return meta, ctx


def read_range(path: str, offset: int, length: int) -> bytes:
    from . import pqsource

    return pqsource.open_source(path).read_range(offset, length)


def chunk_reader(path: str, cc: ColumnChunkInfo):
    """(buffer, shifted ColumnChunkInfo) for ONE column chunk — a
    ranged read of [first_page_offset, +total_compressed), the per-task
    IO unit (never the whole file)."""
    import dataclasses

    length = cc.total_compressed
    if cc.enc_key is not None:
        # writers record plaintext-side compressed totals; encrypted
        # streams carry per-page module framing + header modules on
        # top. Pad the range (value-count terminates the page walk).
        length += 4096 + (cc.total_compressed >> 6)
    buf = read_range(path, cc.first_page_offset, length)
    shifted_dict = (None if cc.dict_page_offset is None
                    else cc.dict_page_offset - cc.first_page_offset)
    return buf, dataclasses.replace(cc, first_page_offset=0,
                                    dict_page_offset=shifted_dict)


@dataclass
class LeafInfo:
    path: str             # dotted leaf path as in ColumnMetaData
    ptype: int
    type_length: int | None
    max_def: int
    max_rep: int
    d_list: int           # see ColumnChunkInfo
    d_slot: int
    top_name: str         # user-facing column (first path segment)
    top_el: dict          # SchemaElement of the top-level node
    leaf_el: dict         # SchemaElement of the leaf


def _walk_schema(meta: dict) -> list[LeafInfo]:
    """Depth-first SchemaElement walk -> per-leaf Dremel level info.

    Scope: flat leaves and single-level LIST over a primitive (the
    3-level optional/repeated/element encoding every modern writer
    emits — reference schema walk: internal/schema/schema.go)."""
    elems = meta[2]
    out: list[LeafInfo] = []
    pos = 1

    def walk(n_children: int, prefix: list[str], d: int, r: int,
             top: dict | None):
        nonlocal pos
        for _ in range(n_children):
            el = elems[pos]
            pos += 1
            name = el[4].decode()
            rep = el.get(3, 0)          # 0 REQ, 1 OPT, 2 REPEATED
            nd = d + (1 if rep in (1, 2) else 0)
            nr = r + (1 if rep == 2 else 0)
            n_kids = el.get(5) or 0
            tel = top if top is not None else el
            if n_kids:
                walk(n_kids, prefix + [name], nd, nr, tel)
            else:
                out.append(LeafInfo(
                    path=".".join(prefix + [name]), ptype=el[1],
                    type_length=el.get(2), max_def=nd, max_rep=nr,
                    d_list=0, d_slot=0, top_name=(prefix + [name])[0],
                    top_el=tel, leaf_el=el))

    walk(elems[0].get(5) or 0, [], 0, 0, None)
    # derive list thresholds: for a single repeated ancestor the slot
    # level is the repeated group's def level; the list itself is
    # present one below it
    for li in out:
        if li.max_rep == 1:
            leaf_opt = 1 if li.leaf_el.get(3, 0) == 1 else 0
            li.d_slot = li.max_def - leaf_opt
            li.d_list = li.d_slot - 1
        # max_rep > 1 (nested repetition): thresholds are per-node and
        # derived by _walk_tree for the general reassembly path
    return out


def _schema_columns(meta: dict) -> dict[str, LeafInfo]:
    """leaf dotted path -> LeafInfo."""
    return {li.path: li for li in _walk_schema(meta)}


def column_chunks(meta: dict, ctx=None,
                  crc_mode: str | None = None) -> list[list[ColumnChunkInfo]]:
    """Per row group, the leaf column chunk infos. ``ctx`` is the
    crypto context from read_footer_ex for encrypted files: column-key
    chunks carry their ColumnMetaData encrypted in field 9 (decrypted
    here, AAD module type 1 + rg/col ordinals) and every chunk's page
    stream gets its module key attached."""
    schema = _schema_columns(meta)
    groups = []
    for rgi, rg in enumerate(meta[4]):  # FileMetaData.row_groups
        cols = []
        for ci, cc in enumerate(rg[1]):  # RowGroup.columns
            enc_key = None
            aad_base = b""
            enc_ctr = False
            key_missing = False
            if ctx is not None and ctx[0] == "plaintext":
                # unkeyed plaintext-footer read: plaintext chunks decode,
                # encrypted chunks refuse at page-read time (so reading
                # only the plaintext columns works keyless)
                key_missing = cc.get(8) is not None
                enc_ctr = bool(ctx[2]) if len(ctx) > 2 else False
            elif ctx is not None:
                from . import pqcrypt

                dec, aad_base, fkey, enc_ctr = ctx
                ccrypt = cc.get(8)
                if ccrypt is None:
                    enc_key = None          # plaintext column
                elif 2 in ccrypt:           # ENCRYPTION_WITH_COLUMN_KEY
                    cpath = b".".join(ccrypt[2].get(1, [])).decode()
                    enc_key = dec.resolve(ccrypt[2].get(2),
                                          cpath.split(".")[0] or cpath)
                else:                       # ENCRYPTION_WITH_FOOTER_KEY
                    enc_key = fkey
                if enc_key is not None and 3 not in cc and 9 in cc:
                    aad = pqcrypt.module_aad(aad_base, pqcrypt.M_COLMETA,
                                             rgi, ci)
                    pt, _ = pqcrypt.open_module(enc_key, aad, cc[9], 0)
                    cc = dict(cc)
                    cc[3], _ = _read_struct(memoryview(pt), 0)
            md = cc[3]    # ColumnChunk.meta_data
            name = b".".join(md[3]).decode()
            if name not in schema:
                raise ValueError(f"unknown column {name!r}")
            li = schema[name]
            start = md[9]  # data_page_offset
            if 11 in md:   # dictionary_page_offset precedes data pages
                start = min(start, md[11])
            cols.append(ColumnChunkInfo(
                name=name, physical_type=li.ptype,
                type_length=li.type_length,
                max_def=li.max_def, codec=md[4], num_values=md[5],
                first_page_offset=start, total_compressed=md[7],
                encodings=list(md[2]), max_rep=li.max_rep,
                d_list=li.d_list, d_slot=li.d_slot,
                top_name=li.top_name,
                bloom_offset=md.get(14), bloom_length=md.get(15),
                dict_page_offset=md.get(11),
                key_missing=key_missing,
                enc_key=enc_key, aad_base=aad_base, enc_ctr=enc_ctr,
                rg_ord=rgi, col_ord=ci,
                num_rows=rg.get(3, 0),
                oi_off=cc.get(4), oi_len=cc.get(5),
                ci_off=cc.get(6), ci_len=cc.get(7),
                data_page_offset=md[9], enc_stats=md.get(13),
                leaf_el=li.leaf_el, crc_mode=crc_mode,
            ))
        groups.append(cols)
    return groups


def _block_decompress(name: str, payload: bytes, out_size: int) -> bytes:
    if name == "lz4":
        return _lz4_legacy_decompress(payload, out_size)
    from . import frame as framemod

    codec = framemod._get_codec(framemod.COMP_IDS[name])
    return codec.decompress(payload, out_size).to_pybytes()


def _lz4_legacy_decompress(payload: bytes, out_size: int) -> bytes:
    """Parquet codec id 5 (deprecated LZ4) is ambiguous in the wild:
    parquet-mr wrote Hadoop framing ([u32be uncompressed][u32be
    compressed][raw block], repeated), some writers raw blocks, some
    LZ4 frames. Try all three, the parquet-cpp Lz4HadoopCodec
    posture."""
    import pyarrow as pa

    try:                                   # hadoop framing
        out = bytearray()
        pos = 0
        while pos < len(payload):
            u, c = struct.unpack_from(">II", payload, pos)
            pos += 8
            if c > len(payload) - pos or u > out_size:
                raise ValueError("not hadoop-framed")
            out += pa.Codec("lz4_raw").decompress(
                payload[pos:pos + c], u).to_pybytes()
            pos += c
        if len(out) == out_size:
            return bytes(out)
    except Exception:
        pass
    try:                                   # raw block
        return pa.Codec("lz4_raw").decompress(
            payload, out_size).to_pybytes()
    except Exception:
        pass
    return pa.Codec("lz4").decompress(     # LZ4 frame
        payload, out_size).to_pybytes()


def iter_pages(data: bytes, cc: ColumnChunkInfo):
    """Yield (page_header_fields, raw_payload) for every page of the
    chunk, decompressing through the engine's block-codec registry.
    Encrypted chunks (cc.enc_key) decrypt header+body modules with
    their Dremel-ordinal AADs first."""
    if cc.key_missing:
        raise ValueError(f"column {cc.name!r} is encrypted; supply "
                         "decryption keys")
    if cc.enc_key is not None:
        yield from _iter_pages_encrypted(data, cc)
        return
    crc_mode = cc.crc_mode or CRC_MODE
    pos = cc.first_page_offset
    end = cc.first_page_offset + cc.total_compressed
    mv = memoryview(data)
    while pos < end:
        hdr, body = _read_struct(mv, pos)
        comp_size = hdr[3]
        payload = bytes(mv[body : body + comp_size])
        if 4 in hdr:
            # CRC-before-parse (the reference's page_read.go posture):
            # spec CRC32 over the page body exactly as stored — BEFORE
            # any decompression touches the bytes
            if crc_mode != "ignore":
                import zlib as _zlib

                if _zlib.crc32(payload) & 0xFFFFFFFF != \
                        hdr[4] & 0xFFFFFFFF:
                    raise ValueError(
                        f"page CRC mismatch in column {cc.name!r}")
        elif crc_mode == "strict":
            # reference CRCStrict: every page must carry a checksum
            raise ValueError(
                f"page without CRC in column {cc.name!r} (strict mode)")
        cname = _CODEC_NAMES.get(cc.codec)
        if cc.codec not in _CODEC_NAMES:
            raise ValueError(f"unsupported compression codec {cc.codec}")
        if cname is not None:
            ptype = hdr[1]
            if ptype == PG_DATA_V2:
                # v2: levels are stored UNcompressed before the values
                v2 = hdr[8]
                lvl = (v2.get(6, 0) or 0) + (v2.get(5, 0) or 0)
                if v2.get(7, True):
                    payload = payload[:lvl] + _block_decompress(
                        cname, payload[lvl:], hdr[2] - lvl)
            else:
                payload = _block_decompress(cname, payload, hdr[2])
        yield hdr, payload
        pos = body + comp_size


def _large_binary_from(data: bytes, offsets: np.ndarray):
    """(data, int64 offsets) -> zero-copy pa.LargeBinaryArray."""
    import pyarrow as pa

    offs = np.ascontiguousarray(offsets, dtype="<i8")
    return pa.Array.from_buffers(
        pa.large_binary(), len(offs) - 1,
        [None, pa.py_buffer(offs.tobytes()),
         pa.py_buffer(bytes(data[:int(offs[-1])]))])


def _fixed_binary_from(data: bytes, n: int, w: int):
    """raw concatenated fixed-width bytes -> pa fixed_size_binary(w)."""
    import pyarrow as pa

    return pa.Array.from_buffers(
        pa.binary(w), n, [None, pa.py_buffer(bytes(data[:n * w]))])


def _decode_plain(payload: bytes, ptype: int, n: int, type_length,
                  arrow: bool = False):
    if ptype in _NP_DTYPE:
        return plainc.decode_numeric(payload, _NP_DTYPE[ptype], n)
    if ptype == T_BOOLEAN:
        return plainc.decode_bool(payload, n)
    if ptype == T_BYTE_ARRAY:
        data, offs = plainc.decode_byte_array(payload, n)
        if arrow:
            return _large_binary_from(data, offs)
        return [bytes(data[offs[i]:offs[i + 1]]) for i in range(n)]
    if ptype == T_FLBA:
        w = int(type_length)
        data = plainc.decode_fixed(payload, n, w)
        if arrow:
            return _fixed_binary_from(data, n, w)
        return [bytes(data[i * w:(i + 1) * w]) for i in range(n)]
    if ptype == T_INT96:
        data = plainc.decode_fixed(payload, n, 12)
        if arrow:
            return _fixed_binary_from(data, n, 12)
        return [bytes(data[i * 12:(i + 1) * 12]) for i in range(n)]
    raise ValueError(f"PLAIN: unsupported physical type {ptype}")


def _decode_values(payload: bytes, enc: int, ptype: int, n: int,
                   type_length, dict_vals, arrow: bool = False):
    """Decode n leaf values from a data-page values section.

    ``arrow=True`` keeps byte-array streams as pyarrow arrays
    (LargeBinary / fixed_size_binary) instead of python ``list[bytes]``
    — the vectorized reader lane (no per-value boxing)."""
    if n == 0:
        return []
    if enc == E_PLAIN:
        return _decode_plain(payload, ptype, n, type_length, arrow)
    if enc in (E_RLE_DICTIONARY, E_PLAIN_DICTIONARY):
        if dict_vals is None:
            raise ValueError("dictionary page missing")
        bw = payload[0]
        idx = rle.decode(payload[1:], bw, n).astype(np.int64)
        if isinstance(dict_vals, np.ndarray):
            if len(idx) and (int(idx.max()) >= len(dict_vals)
                             or int(idx.min()) < 0):
                raise ValueError("dictionary index out of range")
            return dict_vals[idx]
        import pyarrow as pa

        if isinstance(dict_vals, pa.Array):
            if len(idx) and (int(idx.max()) >= len(dict_vals)
                             or int(idx.min()) < 0):
                raise ValueError("dictionary index out of range")
            return dict_vals.take(pa.array(idx, pa.int64()))
        return [dict_vals[i] for i in idx]
    if enc == E_RLE:  # boolean RLE, u32-length-prefixed per spec
        vals, _ = rle.decode_with_length_prefix(payload, 1, n)
        return vals.astype(bool)
    if enc == E_DELTA_BINARY_PACKED:
        itemsize = 4 if ptype == T_INT32 else 8
        vals, _ = delta.decode_consumed(payload, itemsize)
        return vals
    if enc == E_DELTA_LENGTH_BA:
        lens, pos = delta.decode_consumed(payload, 4)
        lens = lens.astype(np.int64)
        if len(lens) < n or (len(lens) and lens.min() < 0):
            raise ValueError("DELTA_LENGTH: bad lengths")
        offs = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        body = payload[pos:]
        if arrow:
            return _large_binary_from(body, offs[:n + 1])
        return [bytes(body[offs[i]:offs[i + 1]]) for i in range(n)]
    if enc == E_DELTA_BA:
        pfx, pos = delta.decode_consumed(payload, 4)
        slen, pos2 = delta.decode_consumed(payload[pos:], 4)
        pfx = pfx.astype(np.int64)
        slen = slen.astype(np.int64)
        if len(pfx) != len(slen) or len(pfx) < n:
            raise ValueError("DELTA_BYTE_ARRAY: count mismatch")
        if (len(pfx) and pfx.min() < 0) or (len(slen) and slen.min() < 0):
            raise ValueError("DELTA_BYTE_ARRAY: negative length")
        body = payload[pos + pos2:]
        out, off, prev = [], 0, b""
        for i in range(n):
            p, s = int(pfx[i]), int(slen[i])
            if p > len(prev):
                raise ValueError("DELTA_BYTE_ARRAY: prefix exceeds prior")
            prev = prev[:p] + bytes(body[off:off + s])
            off += s
            out.append(prev)
        if arrow:
            import pyarrow as pa

            # front coding is inherently sequential; box once per page
            return pa.array(out, pa.large_binary())
        return out
    if enc == E_BYTE_STREAM_SPLIT:
        if ptype in _NP_DTYPE:
            return bss.decode(payload, _NP_DTYPE[ptype], n)
        if ptype == T_FLBA:
            w = int(type_length)
            a = np.frombuffer(payload, np.uint8, w * n).reshape(w, n)
            data = np.ascontiguousarray(a.T).tobytes()
            if arrow:
                return _fixed_binary_from(data, n, w)
            return [bytes(data[i * w:(i + 1) * w]) for i in range(n)]
        raise ValueError("BYTE_STREAM_SPLIT: unsupported type")
    raise ValueError(f"unsupported encoding {enc}")


def decode_column(path: str, column: str, decryption=None):
    """Decode every row group of ``column`` using ONLY engine codecs.
    Returns a python list with None for nulls (physical values:
    numpy scalars for numerics, bytes for byte arrays; list columns
    yield python lists per row)."""
    from . import pqsource

    data = pqsource.open_source(path).read_all()
    meta, ctx = read_footer_ex(path, decryption)
    out: list = []
    for rg in column_chunks(meta, ctx):
        cc = next(c for c in rg
                  if c.name == column or c.top_name == column)
        out.extend(_decode_chunk(data, cc))
    return out


def _legacy_bitpacked_levels(buf: bytes, bw: int, n: int):
    """Deprecated BIT_PACKED level run: no length prefix, size =
    ceil(bw*n/8), bits LSB-first within each byte. Bit-order note:
    Encodings.md's prose for the deprecated encoding reads MSB-first,
    but BOTH living implementations read LSB-first — parquet-cpp's
    level decoder (refereed in test_pqlegacy on crafted files) and
    the reference's ReadBitPackedCount
    (/root/reference/internal/encoding/encodingread.go:100, "LSB-first
    bit order") — so this follows the implementations, which are also
    the parity target. Caveat: parquet-mr's ByteBitPackingValuesWriter
    packs MSB-first, so levels in files from the ancient Java writers
    that actually emitted BIT_PACKED may mis-decode here; no such
    artifact is available to referee against, and the two living
    readers above agree on LSB-first. -> (levels ndarray, consumed)."""
    nbytes = (bw * n + 7) // 8
    if len(buf) < nbytes:
        raise ValueError("truncated BIT_PACKED level run")
    bits = np.unpackbits(np.frombuffer(buf, np.uint8, nbytes),
                         bitorder="little")
    grid = bits[:bw * n].reshape(n, bw)
    vals = grid @ (1 << np.arange(bw, dtype=np.int64))
    return vals.astype(np.int64), nbytes


def _decode_chunk_levels(data: bytes, cc: ColumnChunkInfo,
                         arrow: bool = False):
    """Decode one column chunk -> (reps, defs, values) accumulated
    across pages (levels None when absent). Values is a python list or
    ndarray of the NON-NULL leaf values; reps/defs are int ndarrays of
    length num_values (v1 pages may split a list mid-record, so
    reassembly must happen at chunk scope — this is why levels
    accumulate here). With ``arrow=True`` byte-array streams stay
    pyarrow arrays end-to-end (zero per-value python)."""
    # defensive bounds (frame.py discipline; reference fuzz posture):
    # the footer's value count caps every page's claim, and is itself
    # capped — a lying header must fail BEFORE any allocation sized by it
    if cc.num_values < 0 or cc.num_values > (1 << 34):
        raise ValueError(
            f"implausible chunk value count {cc.num_values}")
    bw_def = cc.max_def.bit_length()
    bw_rep = cc.max_rep.bit_length()
    dict_vals = None
    all_reps, all_defs, all_vals = [], [], []
    flat_np = None
    seen = 0
    for hdr, payload in iter_pages(data, cc):
        ptype = hdr[1]
        if ptype == PG_DICT:
            dh = hdr[7]
            nd = dh[1]
            if dh[2] not in (E_PLAIN, E_PLAIN_DICTIONARY):
                raise ValueError("dictionary page must be PLAIN")
            dict_vals = _decode_plain(
                payload, cc.physical_type, nd, cc.type_length, arrow)
            if isinstance(dict_vals, np.ndarray):
                dict_vals = np.asarray(dict_vals)
            continue
        if ptype == PG_DATA:
            ph = hdr[5]
            n, enc = ph[1], ph[2]
            # v1 headers declare the LEVEL encodings (fields 4/3);
            # ancient writers used deprecated BIT_PACKED (id 4,
            # MSB-first, no length prefix) — the reference reads both
            rl_enc, dl_enc = ph.get(4, E_RLE), ph.get(3, E_RLE)
            body = payload
            reps = defs = None
            if cc.max_rep:
                if rl_enc == 4:                       # BIT_PACKED
                    reps, used = _legacy_bitpacked_levels(
                        body, bw_rep, n)
                else:
                    reps, used = rle.decode_with_length_prefix(
                        body, bw_rep, n)
                body = body[used:]
            if cc.max_def:
                if dl_enc == 4:                       # BIT_PACKED
                    defs, used = _legacy_bitpacked_levels(
                        body, bw_def, n)
                else:
                    defs, used = rle.decode_with_length_prefix(
                        body, bw_def, n)
                body = body[used:]
        elif ptype == PG_DATA_V2:
            ph = hdr[8]
            n, enc = ph[1], ph[4]
            rl_len = ph.get(6, 0) or 0
            dl_len = ph.get(5, 0) or 0
            reps = defs = None
            body = payload[rl_len + dl_len:]
            if cc.max_rep and rl_len:
                reps = rle.decode(payload[:rl_len], bw_rep, n)
            if cc.max_def and dl_len:
                defs = rle.decode(payload[rl_len:rl_len + dl_len],
                                  bw_def, n)
        else:
            raise ValueError(f"unsupported page type {ptype}")
        if n < 0 or seen + n > cc.num_values:
            raise ValueError("page value count exceeds chunk total")
        seen += n
        if cc.max_rep and reps is None:
            reps = np.zeros(n, np.int64)
        if cc.max_def and defs is None:
            defs = np.zeros(n, np.int64)       # v2 all-present shortcut
            defs += cc.max_def
        nnon = (int(np.count_nonzero(defs == cc.max_def))
                if defs is not None else n)
        vals = _decode_values(body, enc, cc.physical_type, nnon,
                              cc.type_length, dict_vals, arrow)
        if reps is not None:
            all_reps.append(np.asarray(reps, np.int64))
        if defs is not None:
            all_defs.append(np.asarray(defs, np.int64))
        if isinstance(vals, np.ndarray):
            if flat_np is None:
                flat_np = True
            all_vals.append(vals)
        elif arrow and not isinstance(vals, list):
            if flat_np is None:
                flat_np = "pa"
            all_vals.append(vals)       # pyarrow array page segment
        elif len(vals) == 0:
            # an ALL-NULL page decodes to an empty list regardless of
            # type — it contributes nothing and must NOT decide the
            # stream's representation (flipping flat_np here left
            # whole ndarrays as elements of a python list)
            pass
        else:
            flat_np = False
            all_vals.extend(vals)
    reps = np.concatenate(all_reps) if all_reps else None
    defs = np.concatenate(all_defs) if all_defs else None
    if flat_np == "pa":
        import pyarrow as pa

        vals = (all_vals[0] if len(all_vals) == 1
                else pa.concat_arrays(all_vals))
    elif flat_np:
        vals = (np.concatenate(all_vals) if all_vals
                else np.zeros(0, _NP_DTYPE.get(cc.physical_type,
                                               np.dtype("O"))))
    elif arrow and cc.physical_type in (T_BYTE_ARRAY, T_FLBA, T_INT96) \
            and not all_vals:
        import pyarrow as pa

        w = (cc.type_length if cc.physical_type == T_FLBA else
             12 if cc.physical_type == T_INT96 else None)
        vals = pa.array([], pa.large_binary() if w is None
                        else pa.binary(int(w)))
    else:
        vals = all_vals
    return reps, defs, vals


def _decode_chunk(data: bytes, cc: ColumnChunkInfo) -> list:
    """Decode one column chunk's pages -> python list (None for nulls;
    list columns come back as python lists per row)."""
    reps, defs, vals = _decode_chunk_levels(data, cc)
    vlist = vals.tolist() if isinstance(vals, np.ndarray) else vals
    if cc.max_rep:
        return _assemble_lists(cc, reps, defs, vlist)
    if defs is None:
        return vlist
    it = iter(vlist)
    return [next(it) if d == cc.max_def else None for d in defs]


def _assemble_lists(cc: ColumnChunkInfo, reps: np.ndarray,
                    defs: np.ndarray, vals: list) -> list:
    """Dremel reassembly for a single-level list over a primitive:
    rep==0 starts a record; def thresholds decide null row / empty
    list / null element / present element."""
    starts = np.flatnonzero(reps == 0)
    ends = np.append(starts[1:], len(reps))
    present = defs == cc.max_def
    # position of each level entry in the value stream
    vidx = np.cumsum(present) - 1
    rows: list = []
    for s, e in zip(starts, ends):
        d0 = defs[s]
        if e == s + 1 and d0 <= cc.d_list:
            rows.append([] if d0 == cc.d_list else None)
            continue
        rows.append([vals[vidx[i]] if present[i] else None
                     for i in range(s, e)])
    return rows


# --- typed table assembly (distributed engine-reader support) -----------

def _dec_prec_scale(el: dict, logical: dict):
    """DECIMAL (precision, scale) from SchemaElement fields 8/7 with
    a DecimalType-logical fallback (some writers emit only one)."""
    dec = logical.get(5) or {}
    return (el.get(8, dec.get(2)), el.get(7, dec.get(1, 0)))


def _arrow_leaf_type(el: dict) -> "object":
    """SchemaElement (leaf) -> pyarrow value type."""
    import pyarrow as pa

    ptype, conv = el[1], el.get(6)
    logical = el.get(10) or {}
    if True:
        if ptype == T_BOOLEAN:
            t = pa.bool_()
        elif ptype == T_INT32:
            t = pa.int32()
            if conv == 6 or 6 in logical:                 # DATE
                t = pa.date32()
            elif conv == 5 or 5 in logical:               # DECIMAL
                t = pa.decimal128(*_dec_prec_scale(el, logical))
            elif 10 in logical:                           # IntType
                it = logical[10]
                bw, signed = it.get(1, 32), bool(it.get(2, True))
                t = {(8, True): pa.int8(), (16, True): pa.int16(),
                     (32, True): pa.int32(), (8, False): pa.uint8(),
                     (16, False): pa.uint16(),
                     (32, False): pa.uint32()}[(bw, signed)]
            elif conv == 15:
                t = pa.int8()
            elif conv == 16:
                t = pa.int16()
            elif conv == 7 or 7 in logical:               # TIME millis
                t = pa.time32("ms")
        elif ptype == T_INT64:
            t = pa.int64()
            ts = logical.get(8)
            if ts is not None:                            # TIMESTAMP
                unit = "ms" if 1 in ts.get(2, {}) else (
                    "us" if 2 in ts.get(2, {}) else "ns")
                t = pa.timestamp(unit, tz="UTC" if ts.get(1) else None)
            elif conv == 9:
                t = pa.timestamp("ms", tz="UTC")
            elif conv == 10:
                t = pa.timestamp("us", tz="UTC")
            elif conv == 5 or 5 in logical:
                t = pa.decimal128(*_dec_prec_scale(el, logical))
            elif conv == 8 or 7 in logical:               # TIME micros
                t = pa.time64("us")
            elif 10 in logical:                           # IntType 64
                t = (pa.int64() if logical[10].get(2, True)
                     else pa.uint64())
            elif conv == 14:                              # UINT_64
                t = pa.uint64()
        elif ptype == T_FLOAT:
            t = pa.float32()
        elif ptype == T_DOUBLE:
            t = pa.float64()
        elif ptype == T_BYTE_ARRAY:
            # UTF8, plus the UTF-8-by-spec annotations (JSON, ENUM)
            t = (pa.string()
                 if (conv in (0, 19, 4) or 1 in logical
                     or 12 in logical or 4 in logical)
                 else pa.binary())
        elif ptype == T_FLBA:
            t = pa.float16() if 15 in logical else pa.binary(el[2])
        elif ptype == T_INT96:
            t = pa.timestamp("us", tz="UTC")              # legacy impala
        else:
            raise ValueError(f"unsupported physical type {ptype}")
        return t


def _leaf_annotation(el: dict) -> dict | None:
    """Annotation-only logical types (UUID/JSON/BSON/ENUM/INTERVAL):
    surfaced as field metadata so the arrow schema keeps the physical
    shape while recording the parquet annotation (the write side emits
    the same tag back — lossless roundtrip)."""
    conv = el.get(6)
    logical = el.get(10) or {}
    kind = None
    if 14 in logical:
        kind = "uuid"
    elif conv == 19 or 12 in logical:
        kind = "json"
    elif conv == 20 or 13 in logical:
        kind = "bson"
    elif conv == 4 or 4 in logical:
        kind = "enum"
    elif conv == 21:
        kind = "interval"
    elif 17 in logical:
        kind = "geometry"
    elif 18 in logical:
        kind = "geography"
    if kind is None:
        return None
    md = {b"pgs_logical": kind.encode()}
    if kind in ("geometry", "geography"):
        g = logical.get(17) or logical.get(18) or {}
        if g.get(1):
            md[b"pgs_geo_crs"] = bytes(g[1])
        if kind == "geography" and g.get(2) is not None:
            algos = ("spherical", "vincenty", "thomas", "andoyer",
                     "karney")
            a = int(g[2])
            if 0 <= a < len(algos):
                md[b"pgs_geo_algorithm"] = algos[a].encode()
    return md


def _arrow_field(elems: list, pos: int):
    """One SchemaElement subtree -> (pyarrow field, next position).
    Handles leaves, LIST groups (3-level), and STRUCT groups."""
    import pyarrow as pa

    el = elems[pos]
    pos += 1
    name = el[4].decode()
    rep = el.get(3, 0)
    n_kids = el.get(5) or 0
    if n_kids == 0:
        if rep == 2:
            # bare repeated primitive (legacy implied list, spec
            # LogicalTypes.md backward-compat rule 1): the field IS the
            # required element
            return pa.field(
                name, pa.list_(pa.field(name, _arrow_leaf_type(el),
                                        False)), False), pos
        return pa.field(name, _arrow_leaf_type(el), rep == 1,
                        metadata=_leaf_annotation(el)), pos
    logical = el.get(10) or {}
    if el.get(6) == 3 or 3 in logical:          # LIST group
        mid = elems[pos]                         # repeated child
        if mid.get(3, 0) != 2:
            raise ValueError(f"non-canonical LIST shape at {name!r}")
        mid_kids = mid.get(5) or 0
        mid_name = mid[4].decode()
        if mid_kids == 0:
            # legacy 2-level: repeated PRIMITIVE is the element
            elem_field = pa.field(mid_name, _arrow_leaf_type(mid), False)
            pos += 1
        elif mid_kids == 1 and mid_name != "array" and \
                not mid_name.endswith("_tuple"):
            elem_field, pos = _arrow_field(elems, pos + 1)   # 3-level
        else:
            # legacy: the repeated GROUP itself is a struct element
            children = []
            pos += 1
            for _ in range(mid_kids):
                ch, pos = _arrow_field(elems, pos)
                children.append(ch)
            elem_field = pa.field(mid_name, pa.struct(children), False)
        return pa.field(name, pa.list_(elem_field), rep == 1), pos
    if el.get(6) == 1 or 2 in logical:          # MAP group
        mid = elems[pos]                         # repeated key_value
        if mid.get(3, 0) != 2 or (mid.get(5) or 0) != 2:
            raise ValueError(f"non-canonical MAP shape at {name!r}")
        key_field, pos = _arrow_field(elems, pos + 1)
        val_field, pos = _arrow_field(elems, pos)
        return pa.field(
            name, pa.map_(key_field.type, val_field.type),
            rep == 1), pos
    children = []
    for _ in range(n_kids):                      # STRUCT group
        ch, pos = _arrow_field(elems, pos)
        children.append(ch)
    if rep == 2:
        # bare repeated group (legacy implied list of structs)
        return pa.field(
            name, pa.list_(pa.field(name, pa.struct(children), False)),
            False), pos
    md = {b"pgs_logical": b"variant"} if 16 in logical else None
    return pa.field(name, pa.struct(children), rep == 1,
                    metadata=md), pos


def arrow_schema(meta: dict) -> "object":
    """FileMetaData -> pyarrow schema (logical-type aware: UTF8, DATE,
    TIMESTAMP millis/micros, DECIMAL; single-level LISTs; STRUCTs)."""
    import pyarrow as pa

    elems = meta[2]
    fields, pos = [], 1
    for _ in range(elems[0].get(5) or 0):
        f, pos = _arrow_field(elems, pos)
        fields.append(f)
    return pa.schema(fields)


def num_row_groups(path: str) -> int:
    return len(read_footer(path)[4])


def sorting_columns(meta: dict) -> list:
    """Declared RowGroup.sorting_columns of the first row group ->
    [(leaf_path, descending, nulls_first), ...] ([] when absent)."""
    rgs = meta.get(4) or []
    if not rgs or 4 not in rgs[0]:
        return []
    names = [b".".join(cc[3][3]).decode() for cc in rgs[0][1]]
    return [(names[sc[1]], bool(sc.get(2)), bool(sc.get(3)))
            for sc in rgs[0][4]]


# --- row-oriented API (the reference's primary user surface) ------------
#
# parquet-go's front door is NewParquetReader -> Read(&rows) and
# NewParquetWriter -> Write(obj) -> WriteStop (reference:
# /root/reference/reader/reader.go:427-478, writer/ops.go:134-180);
# these are the idiomatic python twins over the same engine kernels:
# dict-rows in, dict-rows out, schema inferred by arrow when not given.

def read_rows(path: str, columns: list[str] | None = None,
              batch_rows: int = 0, decryption=None):
    """Decode a real parquet file to python dict-rows. With
    ``batch_rows`` > 0, yields lists of rows per batch (the
    ReadByNumber analog — row groups stream one at a time, so memory
    is bounded by a row group, not the file)."""
    n_rg = num_row_groups(path)

    def gen():
        buf: list[dict] = []
        for g in range(n_rg):
            t = decode_table(path, columns=columns, row_groups=[g],
                             decryption=decryption)
            buf.extend(t.to_pylist())
            while batch_rows and len(buf) >= batch_rows:
                yield buf[:batch_rows]
                buf = buf[batch_rows:]
        if buf or not batch_rows:
            yield buf

    if batch_rows:
        return gen()
    out: list[dict] = []
    for chunk in gen():
        out.extend(chunk)
    return out


def write_rows(rows: list, path: str, schema=None, **write_kw) -> None:
    """Serialize python dict-rows to a real parquet file via engine
    codecs (Write(obj)+WriteStop analog). ``schema`` is an arrow
    schema; inferred by arrow when omitted."""
    import pyarrow as pa

    from . import pqwriter

    table = (pa.Table.from_pylist(rows, schema=schema) if schema
             else pa.Table.from_pylist(rows))
    pqwriter.write_table(table, path, **write_kw)


def chunk_fully_dict(cc: ColumnChunkInfo) -> bool:
    """True when encoding_stats PROVES every data page of the chunk is
    dictionary-encoded (parquet-mr DictionaryFilter's precondition)."""
    if cc.enc_stats is None or cc.dict_page_offset is None:
        return False
    for st in cc.enc_stats:
        if st.get(1) in (PG_DATA, PG_DATA_V2) and \
                st.get(2) not in (E_PLAIN_DICTIONARY, E_RLE_DICTIONARY):
            return False
    return True


def read_dictionary(path: str, cc: ColumnChunkInfo):
    """Decode ONLY the chunk's dictionary page (one ranged read, never
    the data pages) -> list/ndarray of dictionary values, or None."""
    if cc.dict_page_offset is None or cc.enc_key is not None:
        return None
    length = cc.data_page_offset - cc.dict_page_offset
    if length <= 0:
        return None
    buf = read_range(path, cc.dict_page_offset, length)
    hdr, body = _read_struct(memoryview(buf), 0)
    if hdr[1] != PG_DICT:
        return None
    payload = bytes(buf[body: body + hdr[3]])
    cname = _CODEC_NAMES.get(cc.codec)
    if cname is not None:
        payload = _block_decompress(cname, payload, hdr[2])
    nd = hdr[7][1]
    return _decode_plain(payload, cc.physical_type, nd, cc.type_length)


# --- PageIndex (ColumnIndex / OffsetIndex) ------------------------------
#
# The reference writes both in WriteStop (writer/ops.go:28-117) and its
# reader seeks through them; here they are ranged tail-adjacent reads —
# never the data pages — feeding page-granular row-range pruning.

def read_offset_index(path: str, cc: ColumnChunkInfo):
    """-> [(page_offset, compressed_page_size, first_row_index), ...]
    or None when the chunk carries no OffsetIndex."""
    if cc.oi_off is None:
        return None
    buf = read_range(path, cc.oi_off, cc.oi_len)
    s, _ = _read_struct(memoryview(buf), 0)
    return [(p[1], p[2], p[3]) for p in s[1]]


def _leaf_unsigned(leaf_el: dict | None) -> bool:
    """True when the leaf's logical/converted type declares UNSIGNED
    integers — their bounds order by unsigned value, not the signed
    physical representation."""
    if not leaf_el:
        return False
    it = (leaf_el.get(10) or {}).get(10)
    if it is not None:
        return not it.get(2, True)
    return leaf_el.get(6) in (11, 12, 13, 14)    # UINT_8..UINT_64


def stat_value(ptype: int, b: bytes, unsigned: bool = False):
    """PLAIN-serialized Statistics/ColumnIndex bound -> comparable
    python value (None = type has no usable order here)."""
    if ptype == T_INT32:
        return struct.unpack("<I" if unsigned else "<i", b)[0]
    if ptype == T_INT64:
        return struct.unpack("<Q" if unsigned else "<q", b)[0]
    if ptype == T_FLOAT:
        return struct.unpack("<f", b)[0]
    if ptype == T_DOUBLE:
        return struct.unpack("<d", b)[0]
    if ptype == T_BOOLEAN:
        return b != b"\x00"
    if ptype in (T_BYTE_ARRAY, T_FLBA):
        return b
    return None


def read_column_index(path: str, cc: ColumnChunkInfo):
    """-> dict(null_pages, mins, maxs, boundary_order, null_counts)
    with typed min/max values (None entries for null pages), or None
    when the chunk carries no ColumnIndex."""
    if cc.ci_off is None:
        return None
    buf = read_range(path, cc.ci_off, cc.ci_len)
    s, _ = _read_struct(memoryview(buf), 0)
    null_pages = s[1]
    uns = _leaf_unsigned(cc.leaf_el)
    mins = [None if np_ else stat_value(cc.physical_type, b, uns)
            for np_, b in zip(null_pages, s[2])]
    maxs = [None if np_ else stat_value(cc.physical_type, b, uns)
            for np_, b in zip(null_pages, s[3])]
    return {"null_pages": null_pages, "mins": mins, "maxs": maxs,
            "boundary_order": s.get(4, 0),
            "null_counts": s.get(5)}


def _page_extents(oi, num_rows: int):
    """OffsetIndex -> [(row_lo, row_hi), ...] per page (rg-local)."""
    firsts = [fri for _, _, fri in oi]
    return [(firsts[i], firsts[i + 1] if i + 1 < len(firsts)
             else num_rows) for i in range(len(firsts))]


def merge_ranges(ranges):
    out: list[list[int]] = []
    for lo, hi in sorted(ranges):
        if hi <= lo:
            continue
        if out and lo <= out[-1][1]:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return [(lo, hi) for lo, hi in out]


def intersect_ranges(a, b):
    out = []
    i = j = 0
    while i < len(a) and j < len(b):
        lo = max(a[i][0], b[j][0])
        hi = min(a[i][1], b[j][1])
        if lo < hi:
            out.append((lo, hi))
        if a[i][1] <= b[j][1]:
            i += 1
        else:
            j += 1
    return out


def _pred_page_keep(ci, pred) -> list[bool]:
    """Per-page may-match verdict for an eq/range predicate (advisory-
    lossless: True unless the page bounds PROVE no row matches)."""
    op = pred[0]

    def enc(v):
        return v.encode() if isinstance(v, str) else v

    keep = []
    for np_, mn, mx in zip(ci["null_pages"], ci["mins"], ci["maxs"]):
        if np_:
            keep.append(False)        # eq/range never matches NULL
        elif mn is None or mx is None:
            keep.append(True)
        elif op == "eq":
            keep.append(mn <= enc(pred[1]) <= mx)
        elif op == "in":
            keep.append(any(mn <= enc(v) <= mx for v in pred[1]))
        elif op == "range":
            keep.append(not (mx < enc(pred[1]) or enc(pred[2]) < mn))
        else:
            keep.append(True)
    return keep


def predicate_row_ranges(path: str, meta: dict, rg: int,
                         filters: dict, ctx=None):
    """Intersect per-column ColumnIndex prunes into rg-local row
    ranges. -> (ranges, pruned) where pruned=False means no usable
    index existed (caller decodes the full row group)."""
    chunks = column_chunks(meta, ctx)[rg]
    ranges = None
    for col, pred in (filters or {}).items():
        cc = next((c for c in chunks
                   if c.name == col or c.top_name == col), None)
        if cc is None or cc.enc_key is not None or cc.key_missing:
            continue
        ci = read_column_index(path, cc)
        oi = read_offset_index(path, cc)
        if ci is None or oi is None:
            continue
        exts = _page_extents(oi, cc.num_rows)
        keep = _pred_page_keep(ci, pred)
        r = merge_ranges([exts[i] for i in range(len(exts)) if keep[i]])
        ranges = r if ranges is None else intersect_ranges(ranges, r)
    if ranges is None:
        return None, False
    return ranges, True


def _read_chunk_pages(path: str, cc: ColumnChunkInfo, oi,
                      keep: list[int]):
    """Ranged reads of ONLY the kept pages (plus the dictionary page) —
    pruned pages are never read, let alone decompressed. Adjacent kept
    pages coalesce into one IO. Returns (buf, shifted cc)."""
    import dataclasses

    spans = []
    if cc.dict_page_offset is not None and oi:
        spans.append((cc.dict_page_offset, oi[0][0] - cc.dict_page_offset))
    run_start = None
    run_end = None
    for pi in keep:
        off, size, _ = oi[pi]
        if run_start is None:
            run_start, run_end = off, off + size
        elif off == run_end:
            run_end = off + size
        else:
            spans.append((run_start, run_end - run_start))
            run_start, run_end = off, off + size
    if run_start is not None:
        spans.append((run_start, run_end - run_start))
    buf = b"".join(read_range(path, off, ln) for off, ln in spans)
    rcc = dataclasses.replace(cc, first_page_offset=0,
                              total_compressed=len(buf))
    return buf, rcc


def _decode_chunk_ranged_arrow(path: str, cc: ColumnChunkInfo, ranges,
                               ftype):
    """Decode only the pages of one FLAT chunk that intersect the
    rg-local row ranges -> typed pa.Array of exactly the rows inside
    the ranges, in order (page-pruned ranged IO, no per-value python).
    Falls back to full decode + take when no OffsetIndex exists.
    (Superseded the python-list `_decode_chunk_ranged` in r4 — this is
    the only ranged lane.)"""
    import pyarrow as pa

    oi = (read_offset_index(path, cc)
          if cc.max_rep == 0 and cc.enc_key is None else None)
    if oi is None:
        buf, rcc = chunk_reader(path, cc)
        return _take_ranges(_decode_chunk_arrow(buf, rcc, ftype), ranges)
    exts = _page_extents(oi, cc.num_rows)
    keep = [i for i, (lo, hi) in enumerate(exts)
            if any(lo < rhi and rlo < hi for rlo, rhi in ranges)]
    if not keep:
        return pa.array([], ftype)
    buf, rcc = _read_chunk_pages(path, cc, oi, keep)
    arr = _decode_chunk_arrow(buf, rcc, ftype)
    # map rg-local wanted rows into the kept-pages-only decode order
    idx_parts = []
    base = 0
    for i in keep:
        lo, hi = exts[i]
        for rlo, rhi in ranges:
            s, e = max(lo, rlo), min(hi, rhi)
            if s < e:
                idx_parts.append(
                    np.arange(base + s - lo, base + e - lo, dtype=np.int64))
        base += hi - lo
    idx = (np.concatenate(idx_parts) if idx_parts
           else np.zeros(0, np.int64))
    return arr.take(pa.array(idx, pa.int64()))


def decode_table(path: str, columns: list[str] | None = None,
                 row_groups: list[int] | None = None, decryption=None,
                 row_ranges: dict | None = None,
                 crc_mode: str | None = None):
    """Decode a real parquet file into a typed arrow table using ONLY
    engine codecs (the distributed-reader kernel: one (file, row-group
    subset) per task). INT96 stays out of scope here (no flat testdata
    writes it by default).

    ``row_ranges``: {row_group_index: [(lo, hi), ...]} of rg-local
    half-open row ranges — flat columns with an OffsetIndex decode ONLY
    the intersecting pages (ranged IO per kept-page run); other columns
    decode fully and mask. Groups without an entry decode fully.

    ``crc_mode``: per-read page-CRC policy ("auto"/"strict"/"ignore",
    the reference's reader.WithCRCMode); None falls back to the
    module-level CRC_MODE default. Carried on each ColumnChunkInfo so
    concurrent readers in one process never share a policy."""
    import pyarrow as pa

    from . import int96 as i96mod

    if crc_mode not in (None, "auto", "strict", "ignore"):
        raise ValueError(f"unknown crc_mode {crc_mode!r}")
    meta, ctx = read_footer_ex(path, decryption)
    schema = arrow_schema(meta)
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    groups = column_chunks(meta, ctx, crc_mode=crc_mode)
    sel = range(len(groups)) if row_groups is None else row_groups
    row_ranges = row_ranges or {}

    def _mask_rows(rows: list, gi: int) -> list:
        r = row_ranges.get(gi)
        if r is None:
            return rows
        return [rows[i] for lo, hi in r for i in range(lo, hi)]

    arrays = []
    for f in schema:
        if pa.types.is_nested(f.type) and _nested_in_nested(f.type):
            chunks = []
            tree = None
            for gi in sel:
                if tree is None:
                    tree = _top_tree(meta, f.name)
                arr = None
                if tree["kind"] == "list" and pa.types.is_list(f.type):
                    vt = f.type.value_type
                    if pa.types.is_struct(vt):
                        arr = _assemble_list_struct(
                            path, groups[gi], f, tree)
                    elif pa.types.is_list(vt) and \
                            not pa.types.is_nested(vt.value_type):
                        arr = _assemble_list_list(
                            path, groups[gi], f, tree)
                    if arr is not None:
                        arr = arr.cast(f.type)
                if arr is None:
                    arr = _assemble_general(path, groups[gi], f, tree)
                r = row_ranges.get(gi)
                if r is not None:
                    arr = arr.take(pa.array(
                        [i for lo, hi in r for i in range(lo, hi)],
                        pa.int64()))
                chunks.append(arr)
            arrays.append(pa.concat_arrays(chunks).cast(f.type))
            continue
        if pa.types.is_map(f.type):
            chunks = []
            # leaf paths from the schema tree, not assumed names —
            # legacy MAP_KEY_VALUE groups use e.g. "m.map.key"
            mtree = _top_tree(meta, f.name)
            kpath, vpath = mtree["key"]["path"], mtree["value"]["path"]
            for gi in sel:
                kcc = next((c for c in groups[gi] if c.name == kpath),
                           None)
                vcc = next((c for c in groups[gi] if c.name == vpath),
                           None)
                if kcc is None or vcc is None:
                    raise ValueError(
                        f"map column {f.name!r}: leaves {kpath!r}/"
                        f"{vpath!r} not found in row group {gi}")
                arr = _assemble_map_array(path, kcc, vcc, f.type)
                r = row_ranges.get(gi)
                if r is not None:
                    arr = arr.take(pa.array(
                        [i for lo, hi in r for i in range(lo, hi)],
                        pa.int64()))
                chunks.append(arr)
            arrays.append(pa.concat_arrays(chunks).cast(f.type))
            continue
        if pa.types.is_list(f.type):
            chunks = []
            for gi in sel:
                cc = next(c for c in groups[gi] if c.top_name == f.name)
                buf, rcc = chunk_reader(path, cc)
                arr = _assemble_list_array(buf, rcc, f.type.value_type)
                r = row_ranges.get(gi)
                if r is not None:
                    arr = arr.take(pa.array(
                        [i for lo, hi in r for i in range(lo, hi)],
                        pa.int64()))
                chunks.append(arr)
            arrays.append(pa.concat_arrays(chunks).cast(f.type))
            continue
        if pa.types.is_struct(f.type):
            arr, _ = _assemble_struct_array(
                path, groups, sel, f, f.name, 0)
            if row_ranges:
                parts, base = [], 0
                for gi in sel:
                    n = groups[gi][0].num_rows
                    r = row_ranges.get(gi)
                    idx = ([i for lo, hi in r for i in range(lo, hi)]
                           if r is not None else list(range(n)))
                    parts.extend(base + i for i in idx)
                    base += n
                arr = arr.take(pa.array(parts, pa.int64()))
            arrays.append(arr)
            continue
        chunks = []
        for gi in sel:
            cc = next(c for c in groups[gi] if c.name == f.name)
            r = row_ranges.get(gi)
            if r is not None:
                chunks.append(
                    _decode_chunk_ranged_arrow(path, cc, r, f.type))
            else:
                buf, rcc = chunk_reader(path, cc)
                chunks.append(_decode_chunk_arrow(buf, rcc, f.type))
        arrays.append(pa.chunked_array(chunks, type=f.type) if chunks
                      else pa.array([], f.type))
    return pa.table(arrays, schema=schema)


def _typed_leaf_array(vals: list, ftype):
    """python leaf values (None for nulls) -> typed arrow array."""
    import pyarrow as pa

    from . import int96 as i96mod

    if pa.types.is_timestamp(ftype) and any(
            isinstance(v, bytes) for v in vals if v is not None):
        return i96mod.int96_to_timestamps(
            pa.array(vals, pa.binary(12))).cast(ftype)
    if pa.types.is_date32(ftype):
        return pa.array(vals, pa.int32()).cast(ftype)
    if pa.types.is_timestamp(ftype):
        return pa.array(vals, pa.int64()).cast(ftype)
    if pa.types.is_decimal(ftype):
        scale = ftype.scale
        return pa.array(
            [None if v is None else __import__("decimal").Decimal(int(v))
             .scaleb(-scale) for v in vals], ftype)
    if pa.types.is_string(ftype):
        return pa.array(vals, pa.binary()).cast(ftype)
    if pa.types.is_float16(ftype):
        buf = b"".join(b"\x00\x7e" if v is None else v for v in vals)
        arr = np.frombuffer(buf, np.float16)
        mask = np.array([v is None for v in vals], bool)
        return pa.array(arr, mask=mask)
    if pa.types.is_time64(ftype):
        return pa.array(vals, pa.int64()).cast(ftype)
    if pa.types.is_time32(ftype):
        return pa.array(vals, pa.int32()).cast(ftype)
    if pa.types.is_unsigned_integer(ftype):
        # stored as signed two's complement in INT32/INT64 physical
        m = (1 << ftype.bit_width) - 1
        return pa.array([None if v is None else int(v) & m
                         for v in vals], ftype)
    return pa.array(vals, ftype)


def _expand_present(arr, present: np.ndarray):
    """Dense present-only pa array -> full-length array with nulls at
    the absent slots (vectorized take with null indices)."""
    import pyarrow as pa

    idx = np.cumsum(present, dtype=np.int64) - 1
    return arr.take(pa.array(idx, pa.int64(), mask=~present))


def _leaf_arrow(vals, present, ftype, cc: ColumnChunkInfo):
    """Chunk value stream (+ present mask over rows) -> typed pa.Array
    with nulls. The round-3-verdict de-boxing lane: numeric columns stay
    ndarrays end-to-end, byte arrays stay Arrow buffers; only the rare
    shapes (FLBA-backed decimals) fall back to the python path.

    ``vals``: ndarray (numerics/bool) | pa.Array (byte arrays) | list
    (legacy fallback) of the NON-NULL values; ``present``: bool ndarray
    over rows, or None when every row is present."""
    import pyarrow as pa

    from . import int96 as i96mod

    if isinstance(vals, list):              # legacy repr — box once
        if present is None:
            return _typed_leaf_array(vals, ftype)
        it = iter(vals)
        return _typed_leaf_array(
            [next(it) if p else None for p in present], ftype)
    all_present = present is None or bool(present.all())
    if isinstance(vals, np.ndarray):
        if all_present:
            full, mask = vals, None
        else:
            full = np.zeros(len(present), vals.dtype)
            full[present] = vals
            mask = ~present
        if pa.types.is_decimal(ftype) and vals.dtype.kind == "i":
            # decimal128 storage = 16-byte LE integers; the physical
            # int32/int64 IS the unscaled value — widen + sign-extend
            v = full.astype("<i8", copy=False)
            pair = np.empty((len(v), 2), "<i8")
            pair[:, 0] = v
            pair[:, 1] = v >> 63
            validity = (None if mask is None
                        else pa.array(~mask).buffers()[1])
            return pa.Array.from_buffers(
                ftype, len(v), [validity, pa.py_buffer(pair.tobytes())])
        if pa.types.is_unsigned_integer(ftype):
            # stored signed two's complement; reinterpret, don't convert
            bw = ftype.bit_width
            if bw >= full.dtype.itemsize * 8:
                u = full.view(f"u{full.dtype.itemsize}")
            else:
                u = (full & ((1 << bw) - 1)).astype(f"u{bw // 8}")
            arr = pa.array(u, mask=mask)
            return arr if arr.type == ftype else arr.cast(ftype)
        arr = pa.array(full, mask=mask)
        return arr if arr.type == ftype else arr.cast(ftype)
    # pyarrow byte-array repr (large_binary or fixed_size_binary)
    if pa.types.is_float16(ftype):
        # FLBA(2) little-endian IEEE half — reinterpret the raw buffer
        dense = np.frombuffer(
            vals.buffers()[1], np.float16, len(vals),
            offset=vals.offset * 2)
        if all_present:
            return pa.array(dense)
        full = np.zeros(len(present), np.float16)
        full[present] = dense
        return pa.array(full, mask=~present)
    arr = vals if all_present else _expand_present(vals, present)
    if cc.physical_type == T_INT96 and pa.types.is_timestamp(ftype):
        out = i96mod.int96_to_timestamps(arr)
        return out if out.type == ftype else out.cast(ftype)
    if pa.types.is_decimal(ftype):
        # FLBA/binary-backed decimal (big-endian two's complement):
        # rare — route through the python converter
        return _typed_leaf_array(arr.to_pylist(), ftype)
    return arr if arr.type == ftype else arr.cast(ftype)


def _decode_chunk_arrow(data: bytes, cc: ColumnChunkInfo, ftype):
    """Flat-column chunk -> typed pa.Array (the vectorized reader lane:
    no tolist, no per-value python)."""
    reps, defs, vals = _decode_chunk_levels(data, cc, arrow=True)
    if cc.max_rep:
        raise ValueError("arrow flat lane got a repeated column")
    present = None if defs is None else (defs == cc.max_def)
    return _leaf_arrow(vals, present, ftype, cc)


def _take_ranges(arr, ranges):
    """pa.Array rows inside the half-open ``ranges``, in order."""
    import pyarrow as pa

    if not ranges:
        return arr.slice(0, 0)
    idx = np.concatenate([np.arange(lo, hi, dtype=np.int64)
                          for lo, hi in ranges])
    return arr.take(pa.array(idx, pa.int64()))


def _assemble_struct_array(path: str, groups, sel, field,
                           prefix: str, d_parent: int):
    """Recursive struct reassembly from def levels alone (no
    repetition): a node is present where the shared leaf defs reach its
    presence level; leaf values are present at the leaf's max_def."""
    import pyarrow as pa

    d_self = d_parent + (1 if field.nullable else 0)
    children, first_defs = [], None
    for ch in field.type:
        cpath = f"{prefix}.{ch.name}"
        if pa.types.is_struct(ch.type):
            arr, defs = _assemble_struct_array(
                path, groups, sel, ch, cpath, d_self)
        elif pa.types.is_nested(ch.type):
            raise ValueError(f"list under struct {cpath!r} out of scope")
        else:
            parts, defs_parts = [], []
            for gi in sel:
                cc = next(c for c in groups[gi] if c.name == cpath)
                buf, rcc = chunk_reader(path, cc)
                _, d, vraw = _decode_chunk_levels(buf, rcc, arrow=True)
                if d is None:
                    d = np.full(cc.num_values, cc.max_def, np.int64)
                parts.append(
                    _leaf_arrow(vraw, d == cc.max_def, ch.type, cc))
                defs_parts.append(d)
            arr = (pa.concat_arrays([p.combine_chunks()
                                     if isinstance(p, pa.ChunkedArray)
                                     else p for p in parts])
                   if parts else pa.array([], ch.type))
            defs = np.concatenate(defs_parts) if defs_parts else \
                np.zeros(0, np.int64)
        children.append(arr)
        if first_defs is None:
            first_defs = defs
    mask = None
    if field.nullable:
        mask = pa.array(first_defs < d_self)
    out = pa.StructArray.from_arrays(
        children, fields=list(field.type), mask=mask)
    return out, first_defs


def _assemble_list_array(data: bytes, cc: ColumnChunkInfo, value_type):
    """Vectorized Dremel -> pyarrow ListArray for one chunk: offsets
    from rep boundaries + element counts, row validity from def
    thresholds, element nulls from def == d_slot."""
    import pyarrow as pa

    reps, defs, vals = _decode_chunk_levels(data, cc, arrow=True)
    new_row = reps == 0
    n_rows = int(new_row.sum())
    row_idx = np.cumsum(new_row) - 1
    elem_mask = defs >= cc.d_slot
    present = defs == cc.max_def
    counts = np.bincount(row_idx[elem_mask], minlength=n_rows)
    offs = np.zeros(n_rows + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    row_valid = defs[new_row] >= cc.d_list

    elem_present = present[elem_mask]
    n_elems = int(elem_mask.sum())
    if isinstance(vals, np.ndarray):
        full = np.zeros(n_elems, vals.dtype)
        full[elem_present] = vals
        elems = pa.array(full, mask=~elem_present)
    elif isinstance(vals, pa.Array):   # de-boxed byte-array elements
        elems = (vals if bool(elem_present.all())
                 else _expand_present(vals, elem_present))
    else:                       # legacy python-list fallback
        it = iter(vals)
        elems = pa.array(
            [next(it) if p else None for p in elem_present], pa.binary())
    elems = elems.cast(value_type)
    off_arr = pa.array(offs.astype(np.int32),
                       mask=np.append(~row_valid, False))
    return pa.ListArray.from_arrays(off_arr, elems)


# ------------- general Dremel reassembly (arbitrary nesting) ------------
#
# The reference unmarshals arbitrarily nested records row-at-a-time
# via reflection (/root/reference/marshal/unmarshal.go); this is the
# same record assembly over the SchemaElement tree. Deliberately
# row-wise (correct-first): deep nesting is off the hot path — flat
# columns, single-level lists, flat structs and flat maps all keep
# their vectorized lanes, and this path only engages beyond them.

def _nested_in_nested(t) -> bool:
    import pyarrow as pa

    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return pa.types.is_nested(t.value_type)
    if pa.types.is_map(t):
        return (pa.types.is_nested(t.key_type)
                or pa.types.is_nested(t.item_type))
    if pa.types.is_struct(t):
        def has_rep(x):
            if pa.types.is_list(x) or pa.types.is_large_list(x) or \
                    pa.types.is_map(x):
                return True
            return pa.types.is_struct(x) and \
                any(has_rep(c.type) for c in x)
        return any(has_rep(c.type) for c in t)
    return False


def _walk_tree(elems: list, pos: int, d: int, r: int, prefix: list):
    """SchemaElement subtree -> level-annotated node dict (d = def
    level at which the node's value is present; r = rep level of a
    list/map node's SLOTS)."""
    el = elems[pos]
    pos += 1
    name = el[4].decode()
    rep = el.get(3, 0)
    optional = rep == 1
    n_kids = el.get(5) or 0
    logical = el.get(10) or {}
    if n_kids == 0:
        if rep == 2:
            # bare repeated primitive: implied list, field = element
            return {"kind": "list", "name": name, "d": d,
                    "d_slot": d + 1, "r": r + 1,
                    "child": {"kind": "leaf", "name": name, "d": d + 1,
                              "r": r + 1,
                              "path": ".".join(prefix + [name])}}, pos
        md = d + (1 if optional else 0)
        return {"kind": "leaf", "name": name, "d": md, "r": r,
                "path": ".".join(prefix + [name])}, pos
    if el.get(6) == 3 or 3 in logical:          # LIST
        d_list = d + (1 if optional else 0)
        mid = elems[pos]
        if mid.get(3, 0) != 2:
            raise ValueError(f"non-canonical LIST shape at {name!r}")
        mid_kids = mid.get(5) or 0
        mid_name = mid[4].decode()
        if mid_kids == 0:
            # legacy 2-level: the repeated primitive IS the element
            child = {"kind": "leaf", "name": mid_name, "d": d_list + 1,
                     "r": r + 1,
                     "path": ".".join(prefix + [name, mid_name])}
            pos += 1
        elif mid_kids == 1 and mid_name != "array" and \
                not mid_name.endswith("_tuple"):
            child, pos = _walk_tree(elems, pos + 1, d_list + 1, r + 1,
                                    prefix + [name, mid_name])
        else:
            # legacy: repeated group is a REQUIRED struct element
            kids = []
            pos += 1
            for _ in range(mid_kids):
                ch, pos = _walk_tree(elems, pos, d_list + 1, r + 1,
                                     prefix + [name, mid_name])
                kids.append(ch)
            child = {"kind": "struct", "name": mid_name,
                     "d": d_list + 1, "r": r + 1, "optional": False,
                     "children": kids}
        return {"kind": "list", "name": name, "d": d_list,
                "d_slot": d_list + 1, "r": r + 1, "child": child}, pos
    if el.get(6) == 1 or 2 in logical:          # MAP
        d_list = d + (1 if optional else 0)
        mid = elems[pos]
        if mid.get(3, 0) != 2 or (mid.get(5) or 0) != 2:
            raise ValueError(f"non-canonical MAP shape at {name!r}")
        kv = prefix + [name, mid[4].decode()]
        key, pos = _walk_tree(elems, pos + 1, d_list + 1, r + 1, kv)
        val, pos = _walk_tree(elems, pos, d_list + 1, r + 1, kv)
        return {"kind": "map", "name": name, "d": d_list,
                "d_slot": d_list + 1, "r": r + 1,
                "key": key, "value": val}, pos
    if rep == 2:
        # bare repeated group: implied list of REQUIRED structs
        kids = []
        for _ in range(n_kids):
            ch, pos = _walk_tree(elems, pos, d + 1, r + 1,
                                 prefix + [name])
            kids.append(ch)
        return {"kind": "list", "name": name, "d": d,
                "d_slot": d + 1, "r": r + 1,
                "child": {"kind": "struct", "name": name, "d": d + 1,
                          "r": r + 1, "optional": False,
                          "children": kids}}, pos
    d_self = d + (1 if optional else 0)
    children = []
    for _ in range(n_kids):
        ch, pos = _walk_tree(elems, pos, d_self, r,
                             prefix + [name])
        children.append(ch)
    return {"kind": "struct", "name": name, "d": d_self, "r": r,
            "optional": optional, "children": children}, pos


def _top_tree(meta: dict, top: str):
    elems = meta[2]
    pos = 1
    for _ in range(elems[0].get(5) or 0):
        node, pos = _walk_tree(elems, pos, 0, 0, [])
        if node["name"] == top:
            return node
    raise ValueError(f"unknown column {top!r}")


def _tree_leaves(node) -> list:
    if node["kind"] == "leaf":
        return [node]
    if node["kind"] in ("list",):
        return _tree_leaves(node["child"])
    if node["kind"] == "map":
        return _tree_leaves(node["key"]) + _tree_leaves(node["value"])
    out = []
    for ch in node["children"]:
        out.extend(_tree_leaves(ch))
    return out


def _storageize(t):
    """Arrow type -> physical-storage twin (strings as binary, dates/
    timestamps as ints) so row-wise built values can be cast back."""
    import pyarrow as pa

    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pa.binary()
    if pa.types.is_date32(t):
        return pa.int32()
    if pa.types.is_timestamp(t):
        return pa.int64()
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return pa.list_(_storageize(t.value_type))
    if pa.types.is_map(t):
        return pa.map_(_storageize(t.key_type), _storageize(t.item_type))
    if pa.types.is_struct(t):
        return pa.struct([pa.field(f.name, _storageize(f.type), f.nullable)
                          for f in t])
    return t


def _typed_entry_array(vals, defs: np.ndarray, max_def: int,
                       sel: np.ndarray, atype) -> "object":
    """Leaf (values, defs) -> typed arrow array over the SELECTED
    entries (sel bool mask), nulls where def < max_def."""
    import pyarrow as pa

    pres = (defs == max_def)[sel]
    n = int(sel.sum())
    if isinstance(vals, np.ndarray):
        # values are the present-only stream; position of each entry
        vidx = np.cumsum(defs == max_def) - 1
        full = np.zeros(n, vals.dtype)
        full[pres] = vals[vidx[sel][pres]]
        return pa.array(full, mask=~pres).cast(atype)
    vidx = np.cumsum(defs == max_def) - 1
    sub = vidx[sel]
    out = [vals[sub[i]] if pres[i] else None for i in range(n)]
    return pa.array(out, pa.binary()).cast(atype)


def _assemble_list_struct(path: str, chunks_rg: list, field,
                          tree) -> "object | None":
    """Vectorized lane for list<struct<primitives>>: every leaf shares
    one entry stream; offsets/validity from the first leaf's levels,
    element arrays zipped into a StructArray. Returns None when the
    shape doesn't match (caller falls back to the general path)."""
    import pyarrow as pa

    child = tree["child"]
    if child["kind"] != "struct" or any(
            ch["kind"] != "leaf" for ch in child["children"]):
        return None
    d_list, d_slot = tree["d"], tree["d_slot"]
    leaf_nodes = child["children"]
    arrays = []
    reps0 = defs0 = None
    for ln, f in zip(leaf_nodes, field.type.value_type):
        cc = next(c for c in chunks_rg if c.name == ln["path"])
        buf, rcc = chunk_reader(path, cc)
        rep, defs, vals = _decode_chunk_levels(buf, rcc)
        if defs is None:
            defs = np.full(len(rep), ln["d"], np.int64)
        if reps0 is None:
            reps0, defs0 = rep, defs
        ent_mask = defs >= d_slot
        arrays.append((_typed_entry_array(vals, defs, ln["d"],
                                          ent_mask, f.type), ln))
    new_row = reps0 == 0
    n_rows = int(new_row.sum())
    row_idx = np.cumsum(new_row) - 1
    ent_mask = defs0 >= d_slot
    counts = np.bincount(row_idx[ent_mask], minlength=n_rows)
    offs = np.zeros(n_rows + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    row_valid = defs0[new_row] >= d_list
    st_d = child["d"]
    mask = None
    if st_d > d_slot:                        # optional struct element
        mask = pa.array(defs0[ent_mask] < st_d)
    st = pa.StructArray.from_arrays(
        [a for a, _ in arrays], fields=list(field.type.value_type),
        mask=mask)
    off_arr = pa.array(
        [None if not row_valid[i] else int(offs[i])
         for i in range(n_rows)] + [int(offs[-1])], pa.int32())
    return pa.ListArray.from_arrays(off_arr, st)


def _assemble_list_list(path: str, chunks_rg: list, field,
                        tree) -> "object | None":
    """Vectorized lane for list<list<primitive>>: inner offsets over
    all entries, outer offsets at rep<=1."""
    import pyarrow as pa

    inner = tree["child"]
    if inner["kind"] != "list" or inner["child"]["kind"] != "leaf":
        return None
    leaf = inner["child"]
    cc = next(c for c in chunks_rg if c.name == leaf["path"])
    buf, rcc = chunk_reader(path, cc)
    rep, defs, vals = _decode_chunk_levels(buf, rcc)
    if defs is None:
        defs = np.full(len(rep), leaf["d"], np.int64)
    # inner lists: slots of the OUTER list = entries with rep <= 1
    o_start = rep <= tree["r"]
    n_in = int(o_start.sum())
    in_idx = np.cumsum(o_start) - 1
    elem_mask = defs >= inner["d_slot"]
    in_counts = np.bincount(in_idx[elem_mask], minlength=n_in)
    in_offs = np.zeros(n_in + 1, np.int64)
    np.cumsum(in_counts, out=in_offs[1:])
    in_valid = defs[o_start] >= inner["d"]
    elems = _typed_entry_array(vals, defs, leaf["d"], elem_mask,
                               field.type.value_type.value_type)
    in_off_arr = pa.array(
        [None if not in_valid[i] else int(in_offs[i])
         for i in range(n_in)] + [int(in_offs[-1])], pa.int32())
    inner_arr = pa.ListArray.from_arrays(in_off_arr, elems)
    # outer rows over the inner-slot stream
    rep_o = rep[o_start]
    defs_o = defs[o_start]
    new_row = rep_o == 0
    n_rows = int(new_row.sum())
    row_idx = np.cumsum(new_row) - 1
    slot_mask = defs_o >= tree["d_slot"]
    counts = np.bincount(row_idx[slot_mask], minlength=n_rows)
    offs = np.zeros(n_rows + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    row_valid = defs_o[new_row] >= tree["d"]
    # inner_arr contains one entry per OUTER SLOT only where slot_mask;
    # but placeholders (empty/null outer) also occupy inner entries —
    # drop them by taking only real slots
    if not slot_mask.all():
        inner_arr = inner_arr.take(
            pa.array(np.flatnonzero(slot_mask), pa.int64()))
    off_arr = pa.array(
        [None if not row_valid[i] else int(offs[i])
         for i in range(n_rows)] + [int(offs[-1])], pa.int32())
    return pa.ListArray.from_arrays(off_arr, inner_arr)


def _assemble_general(path: str, chunks_rg: list, field,
                      tree=None) -> "object":
    """Arbitrarily nested column for ONE row group -> arrow array.
    Row-wise record assembly from per-leaf (rep, def, values) streams
    over the level-annotated schema tree (pass ``tree`` to avoid a
    footer re-read per row group)."""
    import pyarrow as pa

    if tree is None:
        tree = _top_tree(read_footer(path), field.name)
    leaves = _tree_leaves(tree)
    streams = {}
    n_rows = None
    for lf in leaves:
        cc = next(c for c in chunks_rg if c.name == lf["path"])
        buf, rcc = chunk_reader(path, cc)
        rep, defs, vals = _decode_chunk_levels(buf, rcc)
        n_ent = cc.num_values
        if rep is None:
            rep = np.zeros(n_ent, np.int64)
        if defs is None:
            defs = np.full(n_ent, lf["d"], np.int64)
        vlist = vals.tolist() if isinstance(vals, np.ndarray) else vals
        vidx = np.cumsum(defs == lf["d"]) - 1
        starts = np.flatnonzero(rep == 0)
        streams[lf["path"]] = (rep, defs, vlist, vidx, starts)
        if n_rows is None:
            n_rows = len(starts)
        elif len(starts) != n_rows:
            raise ValueError(
                f"leaf {lf['path']!r}: row count mismatch")

    def first_leaf(node):
        while node["kind"] != "leaf":
            node = (node["child"] if node["kind"] == "list" else
                    node["key"] if node["kind"] == "map" else
                    node["children"][0])
        return node

    def build(node, rng: dict):
        fl = first_leaf(node)
        rep0, defs0, _, _, _ = streams[fl["path"]]
        s0 = rng[fl["path"]][0]
        d0 = int(defs0[s0])
        kind = node["kind"]
        if kind == "leaf":
            if d0 < node["d"]:
                return None
            _, defs, vlist, vidx, _ = streams[node["path"]]
            return vlist[vidx[s0]]
        if kind == "struct":
            if node["optional"] and d0 < node["d"]:
                return None
            return {ch["name"]: build(ch, rng)
                    for ch in node["children"]}
        # list / map
        if d0 < node["d"]:
            return None
        if d0 < node["d_slot"]:
            return [] if kind == "list" else {}
        # split every involved leaf's range at rep <= slot rep level
        slot_rngs = []
        r_slot = node["r"]
        sub_leaves = [lf["path"] for lf in _tree_leaves(node)]
        per_leaf_slots = {}
        n_slots = None
        for lp in sub_leaves:
            rep, _, _, _, _ = streams[lp]
            s, e = rng[lp]
            cuts = [s] + [i for i in range(s + 1, e)
                          if rep[i] <= r_slot] + [e]
            segs = list(zip(cuts[:-1], cuts[1:]))
            per_leaf_slots[lp] = segs
            if n_slots is None:
                n_slots = len(segs)
            elif len(segs) != n_slots:
                raise ValueError("slot count mismatch across leaves")
        out = []
        for k in range(n_slots):
            srng = {lp: per_leaf_slots[lp][k] for lp in sub_leaves}
            if kind == "list":
                out.append(build(node["child"], srng))
            else:
                out.append((build(node["key"], srng),
                            build(node["value"], srng)))
        return out

    rows = []
    all_paths = list(streams)
    for i in range(n_rows):
        rng = {}
        for lp in all_paths:
            rep, _, _, _, starts = streams[lp]
            s = int(starts[i])
            e = int(starts[i + 1]) if i + 1 < len(starts) else len(rep)
            rng[lp] = (s, e)
        rows.append(build(tree, rng))
    storage = _storageize(field.type)
    return pa.array(rows, storage).cast(field.type)


def _assemble_map_array(path: str, kcc: ColumnChunkInfo,
                        vcc: ColumnChunkInfo, map_type) -> "object":
    """Vectorized reassembly of the canonical MAP encoding: the two
    leaf chunks share one rep stream; entry structure comes from the
    key leaf (keys are REQUIRED, def==max_def at every entry), value
    nulls from the value leaf's defs."""
    import pyarrow as pa

    kbuf, rkcc = chunk_reader(path, kcc)
    vbuf, rvcc = chunk_reader(path, vcc)
    reps, kdefs, kvals = _decode_chunk_levels(kbuf, rkcc, arrow=True)
    _, vdefs, vvals = _decode_chunk_levels(vbuf, rvcc, arrow=True)
    new_row = reps == 0
    n_rows = int(new_row.sum())
    row_idx = np.cumsum(new_row) - 1
    ent_mask = kdefs >= kcc.d_slot        # real entries (not placeholders)
    counts = np.bincount(row_idx[ent_mask], minlength=n_rows)
    offs = np.zeros(n_rows + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    row_valid = kdefs[new_row] >= kcc.d_list

    def _typed(vals, defs, cc, atype):
        pres = (defs == cc.max_def)[ent_mask]   # per real entry
        n_ent = int(ent_mask.sum())
        if isinstance(vals, np.ndarray):
            full = np.zeros(n_ent, vals.dtype)
            full[pres] = vals
            return pa.array(full, mask=~pres).cast(atype)
        if isinstance(vals, pa.Array):          # de-boxed byte stream
            arr = vals if bool(pres.all()) else _expand_present(vals, pres)
            return arr if arr.type == atype else arr.cast(atype)
        it = iter(vals)
        return pa.array([next(it) if p else None for p in pres],
                        pa.binary()).cast(atype)

    keys = _typed(kvals, kdefs, kcc, map_type.key_type)
    items = _typed(vvals, vdefs, vcc, map_type.item_type)
    off_arr = pa.array(offs.astype(np.int32),
                       mask=np.append(~row_valid, False))
    return pa.MapArray.from_arrays(off_arr, keys, items)


# --- split-block bloom filters (parquet spec SBBF) ----------------------

def read_bloom(data: bytes, cc: ColumnChunkInfo):
    """Parse a chunk's BloomFilterHeader + bitset -> the engine's
    SplitBlockBloom (bloom.py IS the spec filter: 32-byte blocks, the 8
    salt constants, xxHash64). Validates the header unions."""
    from . import bloom as bloommod

    if cc.bloom_offset is None:
        raise ValueError(f"column {cc.name!r} has no bloom filter")
    hdr, pos = _read_struct(memoryview(data), cc.bloom_offset)
    nbytes = hdr[1]
    if nbytes <= 0 or nbytes % 32 or pos + nbytes > len(data):
        raise ValueError("bad bloom bitset size")
    for fid, what in ((2, "algorithm"), (3, "hash"), (4, "compression")):
        if 1 not in (hdr.get(fid) or {}):
            raise ValueError(f"unsupported bloom {what}")
    words = np.frombuffer(data, np.uint32, nbytes // 4,
                          offset=pos).reshape(-1, 8).copy()
    return bloommod.SplitBlockBloom(words)


def bloom_check(path: str, column: str, values) -> np.ndarray:
    """Membership probe against every row group's bloom for ``column``
    (ORed): True = maybe present, False = definitely absent. Values are
    hashed over their PLAIN encoding per the spec."""
    from . import bloom as bloommod

    meta = read_footer(path)
    li = _schema_columns(meta)[column] if column in _schema_columns(meta) \
        else next(x for x in _walk_schema(meta) if x.top_name == column)
    vals = []
    for v in values:
        if isinstance(v, str):
            vals.append(v.encode())
        elif isinstance(v, bytes):
            vals.append(v)
        elif isinstance(v, (int, np.integer)):
            w = 4 if li.ptype == T_INT32 else 8
            vals.append(int(v).to_bytes(w, "little", signed=True))
        elif isinstance(v, float):
            dt = "<f4" if li.ptype == T_FLOAT else "<f8"
            vals.append(np.array([v], dt).tobytes())
        else:
            raise TypeError(f"cannot plain-encode {v!r}")
    h = bloommod.xxhash64_bytes(vals)
    out = np.zeros(len(vals), bool)
    for rg in column_chunks(meta):
        cc = next(c for c in rg if c.name == column or c.top_name == column)
        bf = read_bloom_at(path, cc)
        out |= bf.check_hashes(h)
    return out


def read_bloom_at(path: str, cc: ColumnChunkInfo):
    """read_bloom via a ranged read of [bloom_offset, +bloom_length)
    (falls back to a generous header window when the optional length
    field is absent) — never the whole file."""
    import dataclasses

    if cc.bloom_offset is None:
        raise ValueError(f"column {cc.name!r} has no bloom filter")
    length = cc.bloom_length
    if length is None:
        head = read_range(path, cc.bloom_offset, 64)
        hdr, pos = _read_struct(memoryview(head), 0)
        length = pos + hdr[1]
    buf = read_range(path, cc.bloom_offset, length)
    return read_bloom(buf, dataclasses.replace(cc, bloom_offset=0))


def _iter_pages_encrypted(data: bytes, cc: ColumnChunkInfo):
    """Module-wise page iteration for encrypted chunks: the first pair
    at the dictionary offset uses dict module types (no page ordinal),
    data pages count ordinals; the plaintext body then follows the
    normal block-codec path.

    CRC policy: encrypted pages carry no CRC field; under AES_GCM the
    authentication tag is a strictly stronger integrity check, so
    strict mode accepts GCM chunks. AES_GCM_CTR page bodies are
    UNAUTHENTICATED (spec caveat) — strict mode refuses them rather
    than give a false integrity guarantee."""
    from . import pqcrypt

    if (cc.crc_mode or CRC_MODE) == "strict" and cc.enc_ctr:
        raise ValueError(
            f"column {cc.name!r}: AES_GCM_CTR page bodies are "
            "unauthenticated and carry no CRC (strict mode)")

    pos = cc.first_page_offset
    end = len(data)
    page_ord = 0
    values_seen = 0
    mv = memoryview(data)
    # terminate on the footer's value count: total_compressed_size is
    # not reliable across writers for encrypted streams (header modules
    # replace plaintext thrift headers of a different length)
    while values_seen < cc.num_values and pos + 28 <= end:
        is_dict = (cc.dict_page_offset is not None
                   and pos == cc.dict_page_offset)
        ht = pqcrypt.M_DICT_PAGE_HDR if is_dict else \
            pqcrypt.M_DATA_PAGE_HDR
        bt = pqcrypt.M_DICT_PAGE if is_dict else pqcrypt.M_DATA_PAGE
        po = None if is_dict else page_ord
        hdr_pt, pos = pqcrypt.open_module(
            cc.enc_key,
            pqcrypt.module_aad(cc.aad_base, ht, cc.rg_ord, cc.col_ord,
                               po), mv, pos)
        hdr, _ = _read_struct(memoryview(hdr_pt), 0)
        if cc.enc_ctr:
            body_pt, pos = pqcrypt.open_module_ctr(cc.enc_key, mv, pos)
        else:
            body_pt, pos = pqcrypt.open_module(
                cc.enc_key,
                pqcrypt.module_aad(cc.aad_base, bt, cc.rg_ord,
                                   cc.col_ord, po), mv, pos)
        if not is_dict:
            page_ord += 1
            ph = hdr.get(5) or hdr.get(8) or {}
            values_seen += ph.get(1, 0) or 0
        payload = body_pt
        cname = _CODEC_NAMES.get(cc.codec)
        if cc.codec not in _CODEC_NAMES:
            raise ValueError(f"unsupported compression codec {cc.codec}")
        if cname is not None:
            ptype = hdr[1]
            if ptype == PG_DATA_V2:
                v2 = hdr[8]
                lvl = (v2.get(6, 0) or 0) + (v2.get(5, 0) or 0)
                if v2.get(7, True):
                    payload = payload[:lvl] + _block_decompress(
                        cname, payload[lvl:], hdr[2] - lvl)
            else:
                payload = _block_decompress(cname, payload, hdr[2])
        yield hdr, payload
