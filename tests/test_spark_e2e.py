"""End-to-end Spark tests: synth -> salted partition -> encode -> decode ->
bit-identical, plus checkpointed resume (FIXTURES.md F1/F6 semantics).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_go_spark.operators.decode_job import decode_table
from parquet_go_spark.operators.encode_job import encode_table
from parquet_go_spark.operators.store import ManifestStore
from parquet_go_spark.operators.verify import (
    bit_identical_checksum,
    bit_identical_exact,
)
from parquet_go_spark.plans.partitioner import plan_partitions
from parquet_go_spark.sources.synth import SCHEMA, token_sequences

N_ROWS = 20_000
TARGET = 200_000  # tokens per partition (small for tests)


@pytest.fixture(scope="module")
def source_df(spark):
    df = token_sequences(spark, N_ROWS, seed=42).cache()
    df.count()
    return df


def test_synth_spark_matches_local(spark, source_df):
    from parquet_go_spark.sources.synth import token_sequences_local

    local = token_sequences_local(50)
    got = (
        source_df.filter(F.col("doc_id") < "doc-000000000050")
        .orderBy("doc_id")
        .toPandas()
    )
    assert got["doc_id"].tolist() == local["doc_id"].to_pylist()
    assert got["n_tok"].tolist() == local["n_tok"].to_pylist()
    assert [list(x) for x in got["tokens"]] == local["tokens"].to_pylist()


def test_partition_plan_balances_tokens(spark, source_df):
    planned, plan = plan_partitions(source_df, target_tokens=TARGET)
    per_part = planned.groupBy("part_id").agg(F.sum("n_tok").alias("toks")).toPandas()
    assert plan.num_partitions >= 1
    assert per_part["part_id"].min() >= 0
    assert per_part["part_id"].max() < plan.num_partitions
    # normal buckets should be within ~3x of each other (hash balance)
    normal = per_part[per_part["part_id"] < plan.n_normal]["toks"]
    if len(normal) > 2:
        assert normal.max() < 4 * max(normal.median(), 1)


def test_encode_decode_bit_identical(spark, source_df, tmp_out):
    store, plan = encode_table(
        spark, source_df, tmp_out, target_tokens=TARGET, compression="zstd"
    )
    manifest = store.manifest(spark).toPandas()
    assert set(manifest["col"]) == {"doc_id", "tokens", "n_tok", "source"}
    assert (manifest["encoded_size"] > 0).all()
    # every planned partition produced all 4 chunks
    per_part = manifest.groupby("part_id").size()
    assert (per_part == 4).all()

    decoded = decode_table(
        spark, tmp_out, ["doc_id", "tokens", "n_tok", "source"], SCHEMA
    )
    assert decoded.count() == N_ROWS
    assert bit_identical_checksum(source_df, decoded)
    assert bit_identical_exact(source_df, decoded)


def test_compression_beats_reference_writer(spark, source_df, tmp_out):
    """North-rule size gate: our encoded bytes <= pyarrow's parquet writer
    (the runnable public stand-in for parquet-go's dictionary+RLE+snappy
    defaults, BASELINE.md row 2) on the same data."""
    import pyarrow.parquet as pq

    store, _ = encode_table(
        spark, source_df, tmp_out, target_tokens=TARGET, compression="zstd"
    )
    ours = (
        store.manifest(spark).agg(F.sum("encoded_size").alias("s")).collect()[0]["s"]
    )
    pdf = source_df.toPandas()
    import pyarrow as pa

    table = pa.Table.from_pandas(pdf)
    ref_path = tmp_out + "_ref.parquet"
    pq.write_table(
        table, ref_path, compression="snappy", use_dictionary=True,
        data_page_size=8 * 1024, row_group_size=1 << 20,
    )
    import os

    ref_size = os.path.getsize(ref_path)
    assert ours <= ref_size, f"ours={ours} ref={ref_size}"


def test_resume_skips_completed_partitions(spark, source_df, tmp_out):
    """F6: encode a subset of partitions, then resume; rerun must encode
    exactly the pending ones and the final decode is bit-identical."""
    planned, plan = plan_partitions(source_df, target_tokens=TARGET)
    half = max(plan.num_partitions // 2, 1)
    store = ManifestStore(tmp_out)
    # wave 1: first half only (simulated interrupted run)
    from parquet_go_spark.operators.encode_job import encode_blobs_df

    wave1 = planned.filter(F.col("part_id") < half)
    store.append_blobs(encode_blobs_df(wave1, "zstd"))
    done_before = {
        r["part_id"] for r in store.completed_partitions(spark).collect()
    }
    assert done_before == set(range(half)) & {
        r["part_id"] for r in planned.select("part_id").distinct().collect()
    }

    # resume: full encode_table run must only add the missing partitions
    encode_table(spark, source_df, tmp_out, target_tokens=TARGET)
    manifest = store.manifest(spark).toPandas()
    per_part = manifest.groupby("part_id").size()
    assert (per_part == 4).all(), "resume must not duplicate completed partitions"

    decoded = decode_table(
        spark, tmp_out, ["doc_id", "tokens", "n_tok", "source"], SCHEMA
    )
    assert bit_identical_checksum(source_df, decoded)


def test_waved_encode_commits_incrementally(spark, source_df, tmp_out):
    store, plan = encode_table(
        spark, source_df, tmp_out, target_tokens=TARGET, waves=3
    )
    decoded = decode_table(
        spark, tmp_out, ["doc_id", "tokens", "n_tok", "source"], SCHEMA
    )
    assert decoded.count() == N_ROWS
    assert bit_identical_checksum(source_df, decoded)


def test_skewed_rows_get_dedicated_buckets(spark):
    """One giant document must not share a bucket with the long tail."""
    import pyarrow as pa

    big = [int(x) for x in np.arange(60_000) % 50_257]
    rows = [("doc-big", big, len(big), "source_a")] + [
        (f"doc-{i:05d}", [1, 2, 3], 3, "source_b") for i in range(500)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    planned, plan = plan_partitions(df, target_tokens=10_000)
    assert plan.n_heavy >= 1
    big_part = planned.filter(F.col("doc_id") == "doc-big").collect()[0]["part_id"]
    assert big_part >= plan.n_normal  # routed to the heavy bucket range


def test_skew_partition_token_mass_bounded(spark):
    """Pathological skew: many heavy documents (n_tok at the 65k cap) mixed
    into a light corpus. The n_tok-weighted planner must keep every
    partition's token mass near target — no partition may concentrate the
    heavy tail (the property that makes the single encode shuffle safe at
    10^12 sequences)."""
    import pyspark.sql.functions as F

    from parquet_go_spark.plans.partitioner import plan_partitions
    from parquet_go_spark.sources.synth import token_sequences

    base = token_sequences(spark, 3000, partitions=4)
    # clone a heavy tail: every 10th doc gets the max length
    skewed = base.withColumn(
        "n_tok",
        F.when(F.col("doc_id").substr(-1, 1) == "0", F.lit(65536))
        .otherwise(F.col("n_tok")),
    )
    target = 200_000  # threshold target/4 = 50k < 65536 so capped docs count as heavy
    planned, plan = plan_partitions(skewed, target_tokens=target)
    mass = (
        planned.groupBy("part_id").agg(F.sum("n_tok").alias("m")).toPandas()
    )
    assert plan.n_heavy >= 1, "heavy rows must get dedicated buckets"
    # packing invariant: heavy buckets carry <= target + max_doc tokens;
    # normal buckets are law-of-large-numbers close to target
    assert mass["m"].max() <= target + 65536, mass["m"].max()


def test_decode_rows_skiprows_analog(spark, tmp_out):
    """decode_rows must return exactly rows [offset, offset+count) in
    (part_id, intra-partition) order, decoding only intersecting
    partitions (reference SkipRows + OffsetIndex semantics)."""
    from parquet_go_spark.operators.decode_job import decode_rows, decode_table
    from parquet_go_spark.operators.encode_job import encode_table
    from parquet_go_spark.sources.synth import token_sequences

    df = token_sequences(spark, 3000, partitions=4)
    encode_table(spark, df, tmp_out, target_tokens=200_000, resume=False)
    cols = ["doc_id", "tokens", "n_tok", "source"]
    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    full = decode_table(spark, tmp_out, cols, schema)
    # reconstruct the engine's global order: part_id asc, intra order stable
    import pyspark.sql.functions as F

    total = full.count()
    offset, count = total // 3, total // 4
    sliced = decode_rows(spark, tmp_out, cols, schema, offset, count)
    assert sliced.count() == count
    # the slice must be a sub-multiset of the full decode
    assert sliced.exceptAll(full).count() == 0
    # zero-width and tail-overrun edges
    assert decode_rows(spark, tmp_out, cols, schema, total - 5, 100).count() == 5


def test_encrypted_store_roundtrip(spark, source_df, tmp_out):
    """Modular encryption end-to-end on Spark: sealed store decodes
    bit-identical with the key, fails without it, and the manifest
    (lineage metadata) stays readable keylessly."""
    key = bytes(range(16))
    store, _ = encode_table(
        spark, source_df, tmp_out, target_tokens=TARGET, resume=False,
        encryption_key=key,
    )
    assert store.meta()["encrypted"] is True
    # manifest metadata readable without the key
    m = store.manifest(spark)
    assert m.filter(F.col("col") == "tokens").count() > 0
    cols = ["doc_id", "tokens", "n_tok", "source"]
    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    dec = decode_table(spark, tmp_out, cols, schema, encryption_key=key)
    assert dec.exceptAll(source_df).count() == 0
    assert source_df.exceptAll(dec).count() == 0
    with pytest.raises(Exception, match="encrypted"):
        decode_table(spark, tmp_out, cols, schema).limit(1).collect()


def test_column_key_store_roundtrip(spark, source_df, tmp_out):
    """Per-column keys (reference reader/column_key.go): the tokens column
    sealed with its own key, everything else with the store key; decode
    needs both via the resolveColumnKey fallback chain, and a store-key-
    only read fails naming exactly the column whose key is missing."""
    from parquet_go_spark import keys as keysmod

    footer = bytes(range(16))
    tok_key = bytes(range(16, 48))
    store, _ = encode_table(
        spark, source_df, tmp_out, target_tokens=TARGET, resume=False,
        encryption_key=footer, column_keys={"tokens": tok_key},
    )
    assert store.meta()["encrypted"] is True
    assert store.meta()["column_key_cols"] == ["tokens"]
    cols = ["doc_id", "tokens", "n_tok", "source"]
    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    dec = decode_table(spark, tmp_out, cols, schema, encryption_key=footer,
                       column_keys={"tokens": tok_key})
    assert dec.exceptAll(source_df).count() == 0
    assert source_df.exceptAll(dec).count() == 0
    # footer key alone cannot open the column-keyed chunk — and the error
    # names the column (GCM auth failure, not garbage)
    with pytest.raises(Exception, match="tokens"):
        decode_table(spark, tmp_out, cols, schema,
                     encryption_key=footer).limit(1).collect()
    # key paths are validated against the schema before encrypting
    with pytest.raises(ValueError, match="tokenz"):
        encode_table(spark, source_df, tmp_out + "_typo", resume=False,
                     column_keys={"tokenz": tok_key})
    # resolution chain is the reference's: column key, else footer key
    assert keysmod.key_for("tokens", {"tokens": tok_key}, footer) == tok_key
    assert keysmod.key_for("n_tok", {"tokens": tok_key}, footer) == footer
    assert keysmod.key_for("n_tok", None, None) is None


def test_logical_uuid_json_converters(spark):
    """UUID/JSON logical-type converters (reference types/uuid.go:6-31,
    types/json.go:16-330) are pure JVM expressions: uuid formatting is
    pinned against Python's uuid module, uuid_bytes inverts uuid_str,
    and json_of/json_get invert each other."""
    import uuid as pyuuid

    from parquet_go_spark import logical

    raw = [bytes(range(i, i + 16)) for i in range(8)]
    df = spark.createDataFrame([(r,) for r in raw], "b binary")
    got = [r["u"] for r in
           df.select(logical.uuid_str("b").alias("u")).collect()]
    assert got == [str(pyuuid.UUID(bytes=r)) for r in raw]
    back = df.select(logical.uuid_str("b").alias("u")).select(
        logical.uuid_bytes("u").alias("b")
    )
    assert [bytes(r["b"]) for r in back.collect()] == raw

    jdf = spark.createDataFrame(
        [("en", 42), ("zh", 7)], "lang string, n int"
    ).select(logical.json_of("lang", "n").alias("j"))
    rows = jdf.select(
        "j", logical.json_get("j", "$.lang").alias("lang"),
        logical.json_get("j", "$.n").alias("n"),
    ).collect()
    assert rows[0]["j"] == '{"lang":"en","n":42}'
    assert [(r["lang"], r["n"]) for r in rows] == [("en", "42"), ("zh", "7")]


def test_decode_table_dotted_path_projection(spark, tmp_out):
    """Dotted columns project nested subtrees through decode_table — the
    distributed surface of decode_chunk_partial (ReadPartial analog,
    reader/reader.go:347-410)."""
    from parquet_go_spark.operators.pruned import encode_generic

    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        F.struct(
            (F.col("id") % 5).cast("string").alias("lang"),
            F.struct(
                (F.col("id") * 3).alias("n"),
                F.concat(F.lit("txt"), F.col("id")).alias("t"),
            ).alias("meta"),
        ).alias("payload"),
    )
    encode_generic(spark, df, tmp_out, key_col="k", num_parts=4)
    out = decode_table(
        spark, tmp_out,
        ["k", "payload.lang", "payload.meta.n"],
        "k long, payload_lang string, payload_meta_n long",
    )
    want = df.select(
        "k",
        F.col("payload.lang").alias("payload_lang"),
        F.col("payload.meta.n").alias("payload_meta_n"),
    )
    assert out.exceptAll(want).count() == 0
    assert want.exceptAll(out).count() == 0
