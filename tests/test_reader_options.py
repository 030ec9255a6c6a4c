"""Reader-option surface (reference reader/options.go): WithCRCMode,
WithAADPrefix, WithKeyRetriever, WithCaseInsensitive — frame-level units
plus the decode_table plumbing on real Spark."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_spark import chunk, frame, keys
from parquet_go_spark.operators.decode_job import decode_table
from parquet_go_spark.operators.encode_job import encode_table
from parquet_go_spark.sources.synth import token_sequences


def _blob(key=None):
    arr = pa.array(np.arange(500, dtype=np.int64))
    blob, _ = chunk.encode_chunk(arr, codec="plain", compression="zstd",
                                 encryption_key=key)
    return arr, blob


# --------------------------------------------------------------- crc_mode

def test_crc_mode_ignore_skips_checksum():
    # corrupt ONLY the trailing CRC word: strict/auto must reject,
    # ignore must decode (the body itself is intact) — CRCIgnore
    # semantics, common/crc.go:13-14
    arr, blob = _blob()
    bad = blob[:-4] + bytes(4)
    with pytest.raises(ValueError, match="CRC"):
        chunk.decode_chunk(bad)
    with pytest.raises(ValueError, match="CRC"):
        chunk.decode_chunk(bad, frame.ReadOptions(crc_mode="auto"))
    out = chunk.decode_chunk(bad, frame.ReadOptions(crc_mode="ignore"))
    assert out.equals(arr)


def test_crc_mode_validated():
    with pytest.raises(ValueError, match="crc_mode"):
        frame.ReadOptions(crc_mode="sometimes")
    with pytest.raises(ValueError, match="crc_mode"):
        decode_table(None, "/nonexistent", ["a"], "a int", crc_mode="nope")


# -------------------------------------------------------------- aad_prefix

def test_aad_prefix_binds_ciphertext():
    key = bytes(range(16))
    prefix = b"store://tenant-a/run-7"
    arr = pa.array(np.arange(200, dtype=np.int64))
    blob, _ = chunk.encode_chunk(
        arr, codec="plain", compression="zstd",
        encryption_key=frame.SealOptions(key, prefix),
    )
    out = chunk.decode_chunk(
        blob, frame.ReadOptions(key=key, aad_prefix=prefix)
    )
    assert out.equals(arr)
    # same key, wrong or missing prefix -> authentication failure
    with pytest.raises(ValueError, match="decryption failed"):
        chunk.decode_chunk(blob, frame.ReadOptions(key=key))
    with pytest.raises(ValueError, match="decryption failed"):
        chunk.decode_chunk(
            blob, frame.ReadOptions(key=key, aad_prefix=b"store://other")
        )
    # plain bytes key (no options wrapper) also fails: prefix is part of AAD
    with pytest.raises(ValueError, match="decryption failed"):
        chunk.decode_chunk(blob, key)


def test_aad_prefix_ignored_when_plaintext():
    arr, blob = _blob()
    out = chunk.decode_chunk(
        blob, frame.ReadOptions(aad_prefix=b"irrelevant")
    )
    assert out.equals(arr)


# ----------------------------------------------------------- key retriever

def test_key_retriever_fallback_chain():
    explicit = {"a": b"A" * 16}
    footer = b"F" * 16
    retrieved = {"b": b"B" * 16}

    def retriever(col):
        return retrieved.get(col)

    # explicit column key wins over the retriever
    assert keys.key_for("a", explicit, footer, retriever) == b"A" * 16
    # retriever wins over the footer key
    assert keys.key_for("b", explicit, footer, retriever) == b"B" * 16
    # neither -> footer
    assert keys.key_for("c", explicit, footer, retriever) == footer
    # malformed retriever output is rejected before any decrypt attempt
    with pytest.raises(ValueError, match="malformed"):
        keys.key_for("x", None, None, lambda c: b"short")


# ------------------------------------------------------------ spark e2e

def test_decode_options_end_to_end(spark, tmp_path):
    out = str(tmp_path / "store")
    src = token_sequences(spark, 300, partitions=2)
    key = bytes(range(32, 48))
    prefix = b"aad-e2e"
    encode_table(spark, src, out, target_tokens=100_000, resume=False,
                 encryption_key=key, aad_prefix=prefix)
    from parquet_go_spark.operators.store import ManifestStore

    assert ManifestStore(out).meta()["aad_bound"] is True
    cols = ["doc_id", "n_tok"]
    schema = "doc_id string, n_tok int"
    # case-insensitive projection + retriever-resolved key + bound AAD
    dec = decode_table(
        spark, out, ["DOC_ID", "N_TOK"], "DOC_ID string, N_TOK int",
        key_retriever=lambda col: key, aad_prefix=prefix,
        case_insensitive=True, crc_mode="auto",
    )
    expect = src.select("doc_id", "n_tok")
    got = dec.toDF("doc_id", "n_tok")
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0
    # wrong AAD prefix fails even with the right key
    with pytest.raises(Exception, match="decryption failed"):
        decode_table(spark, out, cols, schema, encryption_key=key,
                     aad_prefix=b"wrong").limit(1).collect()
    # exact-case miss without case_insensitive: the blob filter matches
    # nothing, so the projection is empty (no chunk named 'DOC_ID')
    miss = decode_table(spark, out, ["DOC_ID"], "DOC_ID string",
                        encryption_key=key, aad_prefix=prefix)
    assert miss.count() == 0
