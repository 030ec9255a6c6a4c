"""Row-oriented front ends: CSV / JSON(L) in and out of the canonical
token-sequence schema.

The reference exposes four row-oriented writers/readers over the same
columnar core (ParquetWriter structs, JSONWriter /root/reference/writer/
json.go:26-72, CSVWriter writer/csv.go:27-115, ArrowWriter writer/arrow.go;
readers reader/reader.go). In Spark the DataFrame API *is* that surface —
these helpers pin down the schema mapping so a round trip through a text
format reproduces the table exactly:

  * CSV has no array type: `tokens` travels as a JSON array string and is
    restored with from_json (declared schema, never inferred — matching
    the reference's declared-schema rule, SURVEY §1.3).
  * JSONL keeps arrays natively; ints are declared int32 on read so the
    roundtrip stays bit-identical (JSON would otherwise widen to long).

Arrow front end: `spark.createDataFrame(pa.Table)` / `df.toArrow()` are
the built-in equivalents of ArrowWriter/ArrowReader; `sources/synth.py`
already produces Arrow batches directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_SCHEMA_DDL = (
    "doc_id string, tokens array<int>, n_tok int, source string"
)
_CSV_SCHEMA = "doc_id string, tokens_json string, n_tok int, source string"
_JSON_SCHEMA = TOKEN_SCHEMA_DDL


def write_csv(df: DataFrame, path: str) -> None:
    """Canonical table -> CSV directory (tokens as a JSON array string)."""
    df.select(
        "doc_id",
        F.to_json(F.col("tokens")).alias("tokens_json"),
        "n_tok",
        "source",
    ).write.mode("overwrite").option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV directory -> canonical table (declared schema, no inference)."""
    raw = (
        spark.read.schema(_CSV_SCHEMA)
        .option("header", "true")
        .csv(path)
    )
    return raw.select(
        "doc_id",
        F.from_json(F.col("tokens_json"), "array<int>").alias("tokens"),
        "n_tok",
        "source",
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(_JSON_SCHEMA).json(path)
