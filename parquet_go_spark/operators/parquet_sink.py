"""Distributed sink: write real ``.parquet`` files with the engine's
own writer (pqwriter.py) from Spark executors.

The reference is a parquet writer library; this operator is its
lifecycle as a Spark surface (reference writer composition:
/root/reference/internal/layout/page_write.go + thrift footer). Each
task serializes its partition's Arrow batches into one spec-conformant
parquet file via engine codecs — embarrassingly parallel, zero
shuffles, no driver data path; at cluster scale the same shape writes
to shared storage with per-task unique names. The returned manifest
(one row per file) is metadata-scale.

External proof chain for the written bytes: Spark's JVM vectorized
reader (the pq_writer_roundtrip gate query reads the files back with
``spark.read.parquet`` and the DuckDB oracle re-derives the rows from
the source table), plus pyarrow/DuckDB/self readers in
tests/test_pqwriter.py.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession


def write_parquet_dir(
    df: DataFrame,
    out_dir: str,
    compression: str = "zstd",
    encodings: dict[str, str] | None = None,
    row_group_rows: int = 1 << 20,
    page_rows: int = 1 << 16,
) -> list[dict]:
    """Write ``df`` as a directory of engine-written parquet files.

    One file per non-empty partition (size partitions upstream with
    repartition/coalesce). Returns the file manifest [{file, rows,
    bytes}] — metadata-scale."""
    os.makedirs(out_dir, exist_ok=True)
    enc = encodings or {}

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        from .. import pqwriter

        got = list(batches)
        if not got:
            return
        tbl = pa.Table.from_batches(got)
        pid = TaskContext.get().partitionId()
        name = f"part-{pid:05d}-{uuid.uuid4().hex[:12]}.parquet"
        path = os.path.join(out_dir, name)
        pqwriter.write_table(
            tbl, path, compression=compression, encodings=enc,
            row_group_rows=row_group_rows, page_rows=page_rows)
        yield pa.RecordBatch.from_arrays(
            [pa.array([name]), pa.array([tbl.num_rows], pa.int64()),
             pa.array([os.path.getsize(path)], pa.int64())],
            names=["file", "rows", "bytes"])

    manifest = df.mapInArrow(fn, "file string, rows long, bytes long")
    return [r.asDict() for r in manifest.collect()]


# -------------------------------------------------------------- gate query

def writer_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem -> engine-written parquet -> Spark's JVM parquet reader.

    The returned rows decode from bytes this engine serialized
    (thrift footer, page headers, DELTA/RLE_DICTIONARY/PLAIN pages,
    zstd blocks) — the JVM reader is the external referee; the DuckDB
    oracle is a plain SELECT on the source table."""
    import shutil

    out = os.path.join(
        "/tmp", f"pgs_pqwriter_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out, ignore_errors=True)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    write_parquet_dir(li, out, compression="zstd")
    return spark.read.parquet(out)


WRITER_ROUNDTRIP_ORACLE = "SELECT * FROM lineitem"


# -------------------------------------------------------- engine reader

def read_parquet_dir(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """Read real parquet files with the ENGINE's spec decoder
    (pqinterop.decode_table), distributed one (file, row-group) per
    task — the reference reader lifecycle as a Spark source. pyarrow
    never touches the decode path; Spark only ferries the Arrow
    batches. Work units are enumerated from footers driver-side
    (metadata-scale, exactly what a FileSourceScan does)."""
    import glob as globmod

    from .. import pqinterop

    files = sorted(
        globmod.glob(os.path.join(path, "*.parquet"))
        if os.path.isdir(path) else [path])
    if not files:
        raise ValueError(f"no parquet files under {path!r}")
    units = [(f, g) for f in files
             for g in range(pqinterop.num_row_groups(f))]
    schema = pqinterop.arrow_schema(pqinterop.read_file(files[0])[1])
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .. import pqinterop as P

        for b in batches:
            for row in b.to_pylist():
                tbl = P.decode_table(row["f"], columns=columns,
                                     row_groups=[row["g"]])
                yield from tbl.to_batches()

    units_df = spark.createDataFrame(units, "f string, g int").repartition(
        max(len(units), 1))
    from pyspark.sql.pandas.types import from_arrow_schema

    return units_df.mapInArrow(fn, from_arrow_schema(schema))


def reader_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem decoded from its REAL pyarrow-written parquet bytes by
    the engine's own spec reader, distributed. The DuckDB oracle reads
    the same file with an independent C++ decoder — a value-exact match
    proves the engine's page/footer/codec parsing end-to-end."""
    return read_parquet_dir(
        spark, os.path.join(sf_dir, "lineitem.parquet"))


READER_ROUNDTRIP_ORACLE = "SELECT * FROM lineitem"


def _explode_embeddings(df: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return df.select(
        "vec_id", "label",
        F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "label", F.col("pos").cast("int").alias("pos"),
             F.col("v").cast("double").alias("val"))


def reader_embeddings_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIST columns through the engine's spec reader: the real
    embeddings.parquet (3-level list<float>) decoded by the engine's
    Dremel reassembly (pqinterop._assemble_list_array), exploded for
    cross-engine value comparison (float arrays don't canon reliably
    as cells — same rule as rt_embeddings)."""
    df = read_parquet_dir(
        spark, os.path.join(sf_dir, "embeddings.parquet"))
    return _explode_embeddings(df)


def writer_embeddings_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIST columns through the engine's spec writer: embeddings
    re-serialized with rep/def level streams by pqwriter, read back by
    Spark's JVM reader."""
    import shutil

    out = os.path.join(
        "/tmp",
        f"pgs_pqwriter_emb_{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out, ignore_errors=True)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    write_parquet_dir(emb, out, compression="zstd")
    return _explode_embeddings(spark.read.parquet(out))


EMBEDDINGS_EXPLODED_ORACLE = (
    "SELECT vec_id, label, CAST(unnest(range(len(embedding))) AS INT) AS"
    " pos, CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings"
)
