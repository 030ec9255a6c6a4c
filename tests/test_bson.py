"""BSON logical type (reference types/bson.go) and the ENUM/dictionary
carrier through the codec stack."""

from __future__ import annotations

import base64
import struct

import numpy as np
import pyarrow as pa

from parquet_go_spark import bson, chunk


def _docs():
    return bson.pack_docs({
        "k": np.array([1, 2, 3], dtype=np.int64),
        "s": ["ab", "", "hello"],
        "p": np.array([1.5, -2.25, 0.0]),
        "f": np.array([True, False, True]),
    })


def test_pack_layout_pinned():
    # hand-verified BSON: 41-byte doc, int64 k=1, string "ab", double 1.5,
    # bool true, NUL terminator (bsonspec.org 1.1)
    assert _docs()[0].as_py().hex() == (
        "29000000126b000100000000000000027300030000006162000170"
        "00000000000000f83f0866000100"
    )


def test_pack_unpack_roundtrip():
    assert bson.unpack_docs(_docs()) == [
        {"k": 1, "s": "ab", "p": 1.5, "f": True},
        {"k": 2, "s": "", "p": -2.25, "f": False},
        {"k": 3, "s": "hello", "p": 0.0, "f": True},
    ]


def test_int32_and_null_elements():
    docs = bson.pack_docs({"a": np.array([7, -1], dtype=np.int32)})
    assert bson.unpack_docs(docs) == [{"a": 7}, {"a": -1}]
    # hand-built doc with a null element
    d = struct.pack("<i", 4 + 3 + 1) + b"\x0an\x00" + b"\x00"
    assert bson.unpack_doc(d) == {"n": None}


def test_malformed_falls_back_to_base64():
    junk = b"\xff\xfe\x01"
    assert bson.unpack_doc(junk) == base64.b64encode(junk).decode()
    # wrong length prefix
    bad = struct.pack("<i", 99) + b"\x00"
    assert bson.unpack_doc(bad) == base64.b64encode(bad).decode()
    assert bson.unpack_doc(b"") == {}


def test_bson_column_through_codec_stack():
    docs = bson.pack_docs({
        "k": np.arange(500, dtype=np.int64),
        "s": [f"row_{i % 7}" for i in range(500)],
    })
    blob, _ = chunk.encode_chunk(docs, codec="auto", compression="zstd")
    out = chunk.decode_chunk(blob)
    assert out.cast(pa.binary()).equals(docs)


def test_enum_dictionary_array_encodes_as_values():
    """Arrow dictionary arrays (ENUM carrier) encode as their logical
    values; the cost model re-derives dict encoding where it wins."""
    vals = pa.array(["red", "green", "blue", "red", "red", "green"] * 50)
    enum = vals.dictionary_encode()
    blob, stats = chunk.encode_chunk(enum, codec="auto", compression=None)
    out = chunk.decode_chunk(blob)
    assert out.cast(pa.string()).equals(vals)
    assert stats["codec"] in ("dict", "dict_rans", "dict_bss", "fsst", "rans")
